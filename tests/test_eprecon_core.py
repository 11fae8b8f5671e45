"""End-to-end fragment test of the EPRecon core on a tiny config (CPU)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eprecon_tpu.config import default_config
from eprecon_tpu.data.synthetic import make_fragment
from eprecon_tpu.models.eprecon import (EPRecon, FragmentInputs, FragmentTargets,
                                        RecurrentState, make_recurrent_state)


def tiny_config():
    cfg = default_config()
    m = dataclasses.replace(
        cfg.model,
        n_vox=(32, 32, 32),
        voxel_size=0.12,
        voxel_capacity=(512, 2048, 8192),
        stage_capacity=(512, 4096, 16384),
        global_extent=(64, 64, 32),
        min_init_voxels=100, min_stage_voxels=50,
    )
    return dataclasses.replace(cfg, model=m)


@pytest.fixture(scope="module")
def frag_data():
    return make_fragment(n_views=5, image_hw=(96, 128), n_vox=(32, 32, 32),
                         voxel_size=0.12, seed=0)


def to_inputs(d, cfg):
    n_stage = cfg.model.n_layer
    rel = np.zeros((n_stage, 3), np.int32)  # global origin == fragment origin
    return FragmentInputs(
        proj_matrices=jnp.asarray(d["proj_matrices"]),
        vol_origin_partial=jnp.asarray(d["vol_origin_partial"]),
        world_to_aligned_camera=jnp.asarray(d["world_to_aligned_camera"]),
        rel_origins=jnp.asarray(rel))


def to_targets(d):
    return FragmentTargets(
        tsdf=tuple(jnp.asarray(t) for t in d["tsdf_levels"]),
        occ=tuple(jnp.asarray(o) for o in d["occ_levels"]),
        semantic=jnp.asarray(d["semantic"]),
        instance=jnp.asarray(d["instance"]))


def test_fragment_forward_train(frag_data):
    cfg = tiny_config()
    model = EPRecon(cfg.model)
    frag = to_inputs(frag_data, cfg)
    targets = to_targets(frag_data)
    state = make_recurrent_state(cfg.model)
    imgs = jnp.asarray(frag_data["imgs"])

    variables = model.init(jax.random.PRNGKey(0), imgs, frag, state, targets)
    (outputs, losses, new_state), _ = model.apply(
        variables, imgs, frag, state, targets, mutable=["batch_stats"])

    assert "total_loss" in losses
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    assert "coords" in outputs and "tsdf" in outputs
    assert outputs["pred_logits"].shape == (80, 21)
    # state was updated: global maps hold the fragment
    assert int(new_state.gmaps[0].mask.sum()) > 0
    assert int(new_state.tmaps[0].occ.sum()) > 0


def test_fragment_forward_inference_no_targets(frag_data):
    cfg = tiny_config()
    model = EPRecon(cfg.model, use_running_average=False)
    frag = to_inputs(frag_data, cfg)
    state = make_recurrent_state(cfg.model)
    imgs = jnp.asarray(frag_data["imgs"])
    targets = to_targets(frag_data)
    variables = model.init(jax.random.PRNGKey(0), imgs, frag, state, targets)
    (outputs, losses, new_state), _ = model.apply(
        variables, imgs, frag, state, None, mutable=["batch_stats"])
    assert "total_loss" not in losses or len(losses) == 0
    assert bool(jnp.isfinite(outputs["tsdf"]).all())
    assert outputs["pred_masks"].shape[0] == 80


def test_two_fragment_temporal_fusion(frag_data):
    """Second fragment reuses the global map (union grows or stays)."""
    cfg = tiny_config()
    model = EPRecon(cfg.model)
    frag = to_inputs(frag_data, cfg)
    targets = to_targets(frag_data)
    state = make_recurrent_state(cfg.model)
    imgs = jnp.asarray(frag_data["imgs"])
    variables = model.init(jax.random.PRNGKey(0), imgs, frag, state, targets)

    (_, _, s1), _ = model.apply(variables, imgs, frag, state, targets,
                                mutable=["batch_stats"])
    n1 = int(s1.gmaps[2].mask.sum())
    (_, _, s2), _ = model.apply(variables, imgs, frag, s1, targets,
                                mutable=["batch_stats"])
    n2 = int(s2.gmaps[2].mask.sum())
    assert n1 > 0
    assert n2 >= n1  # same window revisited: union can only grow
