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
