"""Optimizer / LR schedule / staged-freezing tests (reference main.py recipe)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from eprecon_tpu.config import default_config
from eprecon_tpu.train.state import (freeze_mask_for, make_lr_schedule,
                                     make_optimizer, parse_lr_epochs)


def test_parse_lr_epochs():
    miles, gamma = parse_lr_epochs("70,90:10")
    assert miles == [70, 90] and gamma == 0.1


def test_lr_schedule():
    cfg = default_config()
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    np.testing.assert_allclose(float(sched(0)), cfg.train.lr, rtol=1e-6)
    np.testing.assert_allclose(float(sched(700)), cfg.train.lr * 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(900)), cfg.train.lr * 0.01, rtol=1e-6)


def test_freeze_mask_and_optimizer():
    params = {
        "backbone2d": {"Conv_0": {"kernel": jnp.ones((3, 3, 3, 8))}},
        "backbone_occ_pano": {"Conv_0": {"kernel": jnp.ones((3, 3, 3, 8))}},
        "neucon_net": {
            "initialization": {"subm1": {"kernel": jnp.ones((27, 4, 4))}},
            "tsdf_pred_0": {"Dense_0": {"kernel": jnp.ones((4, 4))}},
        },
    }
    mask = freeze_mask_for(params, "init")
    assert mask["backbone2d"]["Conv_0"]["kernel"] == "freeze"
    assert mask["neucon_net"]["initialization"]["subm1"]["kernel"] == "freeze"
    assert mask["backbone_occ_pano"]["Conv_0"]["kernel"] == "train"
    assert mask["neucon_net"]["tsdf_pred_0"]["Dense_0"]["kernel"] == "train"

    import dataclasses

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, finetune_layer="init",
                                       accumulation_steps=2))
    tx = make_optimizer(cfg, steps_per_epoch=10, freeze_mask=mask)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    # two accumulation micro-steps = one real update
    updates, opt_state = tx.update(grads, opt_state, params)
    p1 = optax.apply_updates(params, updates)
    updates, opt_state = tx.update(grads, opt_state, p1)
    p2 = optax.apply_updates(p1, updates)
    # frozen params unchanged; trainable params moved
    np.testing.assert_array_equal(
        np.asarray(p2["backbone2d"]["Conv_0"]["kernel"]),
        np.asarray(params["backbone2d"]["Conv_0"]["kernel"]))
    assert not np.allclose(
        np.asarray(p2["neucon_net"]["tsdf_pred_0"]["Dense_0"]["kernel"]),
        np.asarray(params["neucon_net"]["tsdf_pred_0"]["Dense_0"]["kernel"]))


def test_frozen_flattened_matches_multi_transform():
    """Freezing is grad-zeroing in front of the flattened optimizer; the
    trajectory must equal the per-leaf multi_transform{train, set_to_zero}
    formulation exactly (same moments, same clip norm)."""
    import dataclasses

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, finetune_layer="init",
                                       accumulation_steps=2))
    params = {
        "backbone2d": {"w": jnp.linspace(-1.0, 1.0, 8).reshape(2, 4)},
        "neucon_net": {
            "initialization": {"k": jnp.ones((3,)) * 0.2},
            "tsdf_pred_0": {"k": jnp.linspace(0.1, 0.9, 6).reshape(2, 3)},
        },
    }
    mask = freeze_mask_for(params, "init")
    grads = jax.tree_util.tree_map(lambda x: jnp.sin(x) + 0.2, params)

    tx_new = make_optimizer(cfg, steps_per_epoch=10, freeze_mask=mask)
    inner = optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip),
        optax.adam(make_lr_schedule(cfg, 10), b1=cfg.train.betas[0],
                   b2=cfg.train.betas[1]))
    tx_ref = optax.MultiSteps(
        optax.multi_transform({"train": inner,
                               "freeze": optax.set_to_zero()}, mask),
        cfg.train.accumulation_steps)

    sn, sr = tx_new.init(params), tx_ref.init(params)
    pn = pr = params
    for _ in range(4):
        un, sn = tx_new.update(grads, sn, pn)
        ur, sr = tx_ref.update(grads, sr, pr)
        pn = optax.apply_updates(pn, un)
        pr = optax.apply_updates(pr, ur)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                                atol=1e-7), pn, pr)
    # frozen subtree exactly untouched
    np.testing.assert_array_equal(np.asarray(pn["backbone2d"]["w"]),
                                  np.asarray(params["backbone2d"]["w"]))


def test_flattened_optimizer_matches_per_leaf():
    """The unfrozen optimizer rides optax.flatten (one raveled vector —
    thousands fewer HLO ops per step); updates must equal the per-leaf
    formulation exactly."""
    import dataclasses

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, finetune_layer=None,
                                       accumulation_steps=2))
    params = {
        "a": {"w": jnp.linspace(-1.0, 1.0, 12).reshape(3, 4)},
        "b": {"k": jnp.ones((5,)) * 0.3, "bias": jnp.zeros((2, 2))},
    }
    grads = jax.tree_util.tree_map(
        lambda x: jnp.cos(x) + 0.1 * jnp.sign(x), params)

    tx_flat = make_optimizer(cfg, steps_per_epoch=10, freeze_mask=None)
    # reference: identical chain without the flatten wrapper
    tx_ref = optax.MultiSteps(
        optax.chain(
            optax.clip_by_global_norm(cfg.train.grad_clip),
            optax.adam(make_lr_schedule(cfg, 10), b1=cfg.train.betas[0],
                       b2=cfg.train.betas[1])),
        cfg.train.accumulation_steps)

    sf, sr = tx_flat.init(params), tx_ref.init(params)
    pf = pr = params
    for _ in range(4):  # 2 full updates through the accumulation
        uf, sf = tx_flat.update(grads, sf, pf)
        ur, sr = tx_ref.update(grads, sr, pr)
        pf = optax.apply_updates(pf, uf)
        pr = optax.apply_updates(pr, ur)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                                atol=1e-7), pf, pr)
