"""Golden-activation parity: the full panoptic transformer decoder vs plain
torch (VERDICT round-2 Missing #1b).

All 6 decoder layers run in both frameworks from the SAME reference-layout
random checkpoint: the torch oracle uses torch.nn.MultiheadAttention itself
(loaded from the shared state_dict) plus functional re-writes of the
reference's CrossAttentionLayer/SelfAttentionLayer/FFNLayer (post-norm,
mask3dformer.py:12-173), forward_prediction_heads (:429-445) including the
sigmoid<0.5 attention mask and the all-masked-row reset (:388), fourier
position encodings (voxel_position_encoding.py:123-152), and the exact
cdist-argmin nearest-fine mask resampling (:358-369).

The fine voxel set is a DENSE 8^3 window and the coarser levels are its
stride-2/4 lattices, so the repo's O(1) cell-aligned nearest-fine lookup
(models/eprecon.nearest_fine_in_cell) provably coincides with the
reference's exact NN (the in-cell corner voxel is at distance 0) — both the
exact chunked-NN path and the cell-aligned production path are compared.

Near-threshold attention-mask flips (sigmoid(omask) ~ 0.5 under bf16) are
made statistically negligible by scaling the mask-embedding output so mask
logits sit far from 0; the test additionally asserts >99% attention-mask
agreement so a systematic masking bug cannot hide in the tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from eprecon_tpu.tools import import_reference_weights as irw

C = 48
NQ = 80
HEADS = 8
LAYERS = 6
SHAPE = (8, 8, 8)
SRC = "neucon_net.panoptic"


def _t(sd, k):
    return torch.from_numpy(sd[k])


def fourier(sd, coords, shape):
    p = torch.from_numpy(coords).float() / torch.tensor(shape).float()
    proj = (p * 2 * np.pi) @ _t(sd, f"{SRC}.pos_enc.gauss_B")
    return torch.cat([proj.sin(), proj.cos()], dim=1)


def t_mha(sd, base, q, k, v, attn_mask=None):
    """torch's own MultiheadAttention loaded from the shared checkpoint.
    q/k/v: [L, C] (bs=1)."""
    m = torch.nn.MultiheadAttention(C, HEADS, dropout=0.0)
    state = {"in_proj_weight": _t(sd, f"{base}.in_proj_weight"),
             "in_proj_bias": _t(sd, f"{base}.in_proj_bias"),
             "out_proj.weight": _t(sd, f"{base}.out_proj.weight"),
             "out_proj.bias": _t(sd, f"{base}.out_proj.bias")}
    m.load_state_dict(state)
    with torch.no_grad():
        out, _ = m(q[:, None], k[:, None], v[:, None], attn_mask=attn_mask)
    return out[:, 0]


def t_ln(sd, p, x):
    return F.layer_norm(x, x.shape[-1:], _t(sd, p + ".weight"),
                        _t(sd, p + ".bias"), eps=1e-5)


def t_lin(sd, p, x):
    return F.linear(x, _t(sd, p + ".weight"), _t(sd, p + ".bias"))


def t_mlp(sd, p, x):
    x = F.relu(t_lin(sd, f"{p}.layers.0", x))
    x = F.relu(t_lin(sd, f"{p}.layers.1", x))
    return t_lin(sd, f"{p}.layers.2", x)


def t_heads(sd, output, mask_feats, mask_idx):
    """forward_prediction_heads (reference mask3dformer.py:429-445)."""
    d = t_ln(sd, f"{SRC}.decoder_norm", output)
    ocls = t_lin(sd, f"{SRC}.class_embed", d)
    memb = t_mlp(sd, f"{SRC}.mask_embed", d)
    omask = memb @ mask_feats.T                       # [Q, Nf]
    attn = omask[:, mask_idx].sigmoid() < 0.5
    return ocls, omask, attn


def t_decoder(sd, feats, coords, mask_feats, shape):
    """Full reference decoder forward (mask3dformer.py:337-427), bs=1."""
    src, pos = [], []
    for i in range(3):
        src.append(torch.from_numpy(feats[i]) +
                   _t(sd, f"{SRC}.level_embed.weight")[i][None, :])
        pos.append(fourier(sd, coords[i], shape))

    # exact NN mask resampling (:358-369): nearest FINE voxel per level voxel
    fine = torch.from_numpy(coords[2]).float()
    mask_idx = []
    for i in range(2):
        d = torch.cdist(fine, torch.from_numpy(coords[i]).float())  # [Nf, Ni]
        mask_idx.append(torch.argmin(d, dim=0))                      # [Ni]
    mask_idx.append(torch.arange(fine.shape[0]))

    qe = _t(sd, f"{SRC}.query_embed.weight")
    output = _t(sd, f"{SRC}.query_feat.weight")
    mf = torch.from_numpy(mask_feats)

    all_cls, all_masks = [], []
    ocls, omask, attn = t_heads(sd, output, mf, mask_idx[0])
    all_cls.append(ocls)
    all_masks.append(omask)
    for j in range(LAYERS):
        lvl = j % 3
        attn = attn.clone()
        attn[attn.sum(-1) == attn.shape[-1]] = False   # :388
        att = t_mha(sd, f"{SRC}.transformer_cross_attention_layers.{j}"
                        ".multihead_attn",
                    output + qe, src[lvl] + pos[lvl], src[lvl], attn)
        output = t_ln(sd, f"{SRC}.transformer_cross_attention_layers.{j}.norm",
                      output + att)
        att = t_mha(sd, f"{SRC}.transformer_self_attention_layers.{j}"
                        ".self_attn",
                    output + qe, output + qe, output)
        output = t_ln(sd, f"{SRC}.transformer_self_attention_layers.{j}.norm",
                      output + att)
        ff = t_lin(sd, f"{SRC}.transformer_ffn_layers.{j}.linear2",
                   F.relu(t_lin(sd, f"{SRC}.transformer_ffn_layers.{j}.linear1",
                                output)))
        output = t_ln(sd, f"{SRC}.transformer_ffn_layers.{j}.norm",
                      output + ff)
        ocls, omask, attn = t_heads(sd, output, mf, mask_idx[(j + 1) % 3])
        all_cls.append(ocls)
        all_masks.append(omask)
    return torch.stack(all_cls), torch.stack(all_masks)


@pytest.fixture(scope="module")
def decoder_data():
    rng = np.random.default_rng(5)
    entries = irw.decoder_entries()
    sd = irw.random_state_dict(entries, seed=23)
    # push mask logits away from the sigmoid(x)=0.5 attention threshold so
    # bf16 noise cannot flip attention-mask bits en masse (see docstring)
    sd[f"{SRC}.mask_embed.layers.2.weight"] *= 12.0

    coords = []
    for stride in (4, 2, 1):
        g = np.stack(np.meshgrid(*[np.arange(0, 8, stride)] * 3,
                                 indexing="ij"), -1).reshape(-1, 3)
        coords.append(np.ascontiguousarray(g.astype(np.int32)))
    coords = coords  # level order 0=coarse, 1=mid, 2=fine (dense 8^3)
    feats = [rng.standard_normal((c.shape[0], C)).astype(np.float32) * 0.5
             for c in coords]
    mask_feats = rng.standard_normal(
        (coords[2].shape[0], C)).astype(np.float32) * 0.5
    return sd, entries, coords, feats, mask_feats


def _run_flax(sd, entries, coords, feats, mask_feats, use_cell_idx):
    from eprecon_tpu.models.eprecon import nearest_fine_in_cell
    from eprecon_tpu.models.panoptic.decoder import MaskedTransformerDecoder
    from eprecon_tpu.ops import sparse as sp

    conv = irw.apply_entries(sd, entries)
    conv.pop("_used_keys")
    variables = {"params": conv["params"]["neucon_net"]["panoptic"],
                 "buffers": conv["buffers"]["neucon_net"]["panoptic"]}
    dec = MaskedTransformerDecoder(num_classes=20, hidden_dim=C,
                                   num_queries=NQ, num_heads=HEADS,
                                   dim_feedforward=4 * C, dec_layers=LAYERS)
    lf = [jnp.asarray(f) for f in feats]
    lc = [jnp.asarray(c) for c in coords]
    lv = [jnp.ones(c.shape[0], bool) for c in coords]
    mask_idx = None
    if use_cell_idx:
        # production path: O(1) cell-aligned nearest-fine rows
        # (models/eprecon.py nearest_fine_in_cell over a row table)
        rows = sp.sparse_to_dense(
            lc[2], jnp.arange(lc[2].shape[0], dtype=jnp.float32)[:, None],
            lv[2], SHAPE, default=-1.0)[..., 0].astype(jnp.int32)
        mask_idx = [nearest_fine_in_cell(rows, lc[0], 4),
                    nearest_fine_in_cell(rows, lc[1], 2),
                    jnp.arange(lc[2].shape[0], dtype=jnp.int32)]
    out = dec.apply(variables, lf, lc, lv, jnp.asarray(mask_feats), SHAPE,
                    mask_idx=mask_idx)
    return (np.asarray(out.pred_logits, np.float32),
            np.asarray(out.pred_masks, np.float32))


@pytest.mark.parametrize("use_cell_idx", [False, True],
                         ids=["exact_nn", "cell_aligned"])
def test_decoder_golden_vs_torch(decoder_data, use_cell_idx):
    sd, entries, coords, feats, mask_feats = decoder_data
    logits, masks = _run_flax(sd, entries, coords, feats, mask_feats,
                              use_cell_idx)
    want_cls, want_masks = t_decoder(sd, feats, coords, mask_feats, SHAPE)
    want_cls, want_masks = want_cls.numpy(), want_masks.numpy()

    assert logits.shape == want_cls.shape
    assert masks.shape == want_masks.shape
    for lay in range(LAYERS + 1):
        g, w = logits[lay].ravel(), want_cls[lay].ravel()
        corr = np.corrcoef(g, w)[0, 1]
        assert corr > 0.999, f"class layer {lay}: corr {corr:.5f}"
        gm, wm = masks[lay].ravel(), want_masks[lay].ravel()
        mcorr = np.corrcoef(gm, wm)[0, 1]
        assert mcorr > 0.999, f"mask layer {lay}: corr {mcorr:.5f}"
        # attention-mask bit agreement (systematic masking bugs can't hide
        # inside a correlation tolerance)
        agree = np.mean((gm > 0) == (wm > 0))
        assert agree > 0.99, f"mask sign agreement layer {lay}: {agree:.4f}"
    np.testing.assert_allclose(logits[-1], want_cls[-1], atol=0.15)
