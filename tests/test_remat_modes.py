"""remat_mode is an AD-only transform: gradients must be identical.

cfg.model.remat_mode ("full" / "light" / "none") only changes WHICH
activations the backward pass recomputes vs saves (config.py) — never the
math. One optimizer step from identical init must therefore produce
identical losses and parameters across modes (rematerialized ops re-execute
the exact same primitives, so CPU results agree to float tolerance).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from eprecon_tpu.train.state import create_train_state, make_train_step


def _one_step(mode):
    cfg = ge._micro_cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, remat_mode=mode))
    imgs, frag, rec, targets = ge._sample_args(cfg, n_views=3,
                                               image_hw=(48, 64), seed=0)
    tstate, model, tx = create_train_state(
        cfg, jax.random.PRNGKey(0), (imgs, frag, rec, targets))
    step = make_train_step(model, tx, cfg)
    tstate, rec, metrics = step(tstate, imgs, frag, targets, rec)
    return float(metrics["total_loss"]), tstate.params


@pytest.mark.slow
def test_remat_modes_identical_gradients():
    loss_full, p_full = _one_step("full")
    loss_none, p_none = _one_step("none")
    assert np.isclose(loss_full, loss_none, rtol=1e-5), (loss_full, loss_none)
    flat_f = jax.tree_util.tree_leaves_with_path(p_full)
    flat_n = dict(jax.tree_util.tree_leaves_with_path(p_none))
    for path, leaf in flat_f:
        np.testing.assert_allclose(
            np.asarray(leaf, np.float32), np.asarray(flat_n[path], np.float32),
            rtol=1e-4, atol=1e-6, err_msg=jax.tree_util.keystr(path))

    loss_light, _ = _one_step("light")
    assert np.isclose(loss_light, loss_full, rtol=1e-5)
