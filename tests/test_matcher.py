"""Auction matcher vs scipy linear_sum_assignment oracle."""
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from eprecon_tpu.models.panoptic import matcher


def _oracle_cost(cost, tgt_valid):
    rows, cols = linear_sum_assignment(cost[:, tgt_valid])
    return cost[:, tgt_valid][rows, cols].sum()


def test_auction_matches_scipy_cost(rng):
    for trial in range(10):
        qn, tn = 80, 48
        n_valid = int(rng.integers(1, 40))
        cost = rng.standard_normal((qn, tn)).astype(np.float32) * 3
        tgt_valid = np.zeros(tn, bool)
        tgt_valid[:n_valid] = True
        assign = np.asarray(matcher.auction_assign(
            jnp.asarray(np.where(tgt_valid[None, :], cost, 1e9)),
            jnp.asarray(tgt_valid)))
        # all valid targets matched to distinct queries
        m = assign[tgt_valid]
        assert (m >= 0).all()
        assert len(set(m.tolist())) == n_valid
        got = cost[m, np.arange(tn)[tgt_valid]].sum()
        expect = _oracle_cost(cost, tgt_valid)
        assert got <= expect + 1e-3 * n_valid + 1e-4, (trial, got, expect)


def test_match_cost_matrix(rng):
    q, t, l, nc = 8, 4, 50, 20
    logits = rng.standard_normal((q, nc + 1)).astype(np.float32)
    masks = rng.standard_normal((q, l)).astype(np.float32)
    tgt_labels = rng.integers(1, nc + 1, t).astype(np.int32)
    tgt_masks = (rng.random((t, l)) < 0.4).astype(np.float32)
    tgt_valid = np.array([True, True, True, False])
    vm = np.ones(l, bool)
    c = np.asarray(matcher.match_cost_matrix(
        jnp.asarray(logits), jnp.asarray(masks), jnp.asarray(tgt_labels),
        jnp.asarray(tgt_masks), jnp.asarray(tgt_valid), jnp.asarray(vm)))
    assert c.shape == (q, t)
    assert (c[:, 3] >= 1e8).all()  # invalid target
    # oracle for one entry (reference matcher.py cost terms)
    import torch
    import torch.nn.functional as F
    tl = torch.from_numpy(masks[0:1])
    tt = torch.from_numpy(tgt_masks[0:1])
    pos = F.binary_cross_entropy_with_logits(tl, torch.ones_like(tl), reduction="none")
    neg = F.binary_cross_entropy_with_logits(tl, torch.zeros_like(tl), reduction="none")
    cm = (torch.einsum("nc,mc->nm", pos, tt) + torch.einsum("nc,mc->nm", neg, 1 - tt)) / l
    probs = torch.sigmoid(tl)
    num = 2 * torch.einsum("nc,mc->nm", probs, tt)
    den = probs.sum(-1)[:, None] + tt.sum(-1)[None, :]
    cd = 1 - (num + 1) / (den + 1)
    sm = np.exp(logits[0]) / np.exp(logits[0]).sum()
    cc = -sm[tgt_labels[0]]
    expect = 0.2 * cc + 0.8 * float(cm[0, 0]) + 0.8 * float(cd[0, 0])
    np.testing.assert_allclose(c[0, 0], expect, rtol=1e-4)


def test_auction_no_valid_targets():
    cost = jnp.full((80, 48), 1e9)
    assign = np.asarray(matcher.auction_assign(cost, jnp.zeros(48, bool)))
    assert (assign == -1).all()


def test_vmapped_layers_match_sequential(rng):
    """set_criterion matches all decoder layers in ONE vmapped auction
    (criterion.py); lockstep extra while-loop iterations must be no-ops for
    already-converged layers, so the vmapped assignments must equal running
    each layer's auction sequentially."""
    import jax

    q, t, l, nc, layers = 32, 12, 200, 20, 4
    tgt_labels = jnp.asarray(rng.integers(1, nc + 1, t).astype(np.int32))
    tgt_masks = jnp.asarray((rng.random((t, l)) < 0.3).astype(np.float32))
    tgt_valid = jnp.asarray(np.arange(t) < 7)
    vm = jnp.asarray(np.ones(l, bool))
    logits = jnp.asarray(
        rng.standard_normal((layers, q, nc + 1)).astype(np.float32))
    masks = jnp.asarray(
        rng.standard_normal((layers, q, l)).astype(np.float32))

    batched = jax.vmap(
        lambda lg, mk: matcher.hungarian_match(lg, mk, tgt_labels, tgt_masks,
                                               tgt_valid, vm))(logits, masks)
    for i in range(layers):
        seq = matcher.hungarian_match(logits[i], masks[i], tgt_labels,
                                      tgt_masks, tgt_valid, vm)
        np.testing.assert_array_equal(np.asarray(batched[i]),
                                      np.asarray(seq), err_msg=f"layer {i}")
