"""Streaming inference pipeline integration test (tiny config, CPU)."""
import dataclasses

import jax
import numpy as np
import pytest

from eprecon_tpu.config import default_config
from eprecon_tpu.data.synthetic import make_fragment, make_scene
from eprecon_tpu.inference.pipeline import StreamingReconstructor
from eprecon_tpu.models.eprecon import EPRecon, make_recurrent_state


def tiny_config():
    cfg = default_config()
    m = dataclasses.replace(
        cfg.model, n_vox=(32, 32, 32), voxel_size=0.12,
        voxel_capacity=(512, 2048, 8192),
        global_extent=(64, 64, 32),
        min_init_voxels=100, min_stage_voxels=50)
    return dataclasses.replace(cfg, model=m)


@pytest.mark.slow
def test_streaming_two_scenes():
    cfg = tiny_config()
    scene_a = make_scene(0)
    frags = [make_fragment(n_views=5, image_hw=(96, 128), n_vox=(32, 32, 32),
                           voxel_size=0.12, seed=0, scene=scene_a,
                           start_angle=a) for a in (0.0, 0.7)]
    frag_b = make_fragment(n_views=5, image_hw=(96, 128), n_vox=(32, 32, 32),
                           voxel_size=0.12, seed=5, start_angle=0.0)

    # init model variables from the first fragment
    from eprecon_tpu.models.eprecon import FragmentInputs
    import jax.numpy as jnp

    model = EPRecon(cfg.model)
    d0 = frags[0]
    fi = FragmentInputs(jnp.asarray(d0["proj_matrices"]),
                        jnp.asarray(d0["vol_origin_partial"]),
                        jnp.asarray(d0["world_to_aligned_camera"]),
                        jnp.zeros((3, 3), jnp.int32))
    state = make_recurrent_state(cfg.model)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.asarray(d0["imgs"]), fi, state, None)

    recon = StreamingReconstructor(cfg, variables)
    vol_origin = d0["vol_origin_partial"] - 0.5  # scene origin below fragments

    for d in frags:
        out = recon.process_fragment("scene_a", d["imgs"], d["proj_matrices"],
                                     vol_origin, d["vol_origin_partial"],
                                     d["world_to_aligned_camera"])
        assert out is None  # same scene: nothing flushed

    # scene change flushes scene_a
    finished = recon.process_fragment("scene_b", frag_b["imgs"],
                                      frag_b["proj_matrices"],
                                      frag_b["vol_origin_partial"] - 0.5,
                                      frag_b["vol_origin_partial"],
                                      frag_b["world_to_aligned_camera"])
    assert finished is not None
    assert finished.name == "scene_a"
    assert (np.abs(finished.tsdf) < 1).any()
    assert finished.tsdf.ndim == 3

    last = recon.flush()
    assert last is not None and last.name == "scene_b"


@pytest.mark.slow
def test_session_save_restore(tmp_path):
    """Mid-scene save → restore in a fresh reconstructor → continuation is
    exact (SURVEY §5: the reference's GRU global volumes die with the
    process; here the streaming session round-trips through one file)."""
    cfg = tiny_config()
    scene_a = make_scene(0)
    frags = [make_fragment(n_views=5, image_hw=(96, 128), n_vox=(32, 32, 32),
                           voxel_size=0.12, seed=0, scene=scene_a,
                           start_angle=a) for a in (0.0, 0.7, 1.4)]

    from eprecon_tpu.models.eprecon import FragmentInputs
    import jax.numpy as jnp

    model = EPRecon(cfg.model)
    d0 = frags[0]
    fi = FragmentInputs(jnp.asarray(d0["proj_matrices"]),
                        jnp.asarray(d0["vol_origin_partial"]),
                        jnp.asarray(d0["world_to_aligned_camera"]),
                        jnp.zeros((3, 3), jnp.int32))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(d0["imgs"]), fi,
        make_recurrent_state(cfg.model), None)
    vol_origin = d0["vol_origin_partial"] - 0.5

    def feed(r, d):
        return r.process_fragment("scene_a", d["imgs"], d["proj_matrices"],
                                  vol_origin, d["vol_origin_partial"],
                                  d["world_to_aligned_camera"])

    # continuous run: all three fragments
    cont = StreamingReconstructor(cfg, variables)
    for d in frags:
        feed(cont, d)
    want = cont.flush()

    # interrupted run: two fragments, save, restore in a NEW reconstructor
    first = StreamingReconstructor(cfg, variables)
    feed(first, frags[0])
    feed(first, frags[1])
    path = str(tmp_path / "session.npz")
    first.save_session(path)

    resumed = StreamingReconstructor(cfg, variables)
    resumed.restore_session(path)
    assert resumed.scene_name == "scene_a"
    feed(resumed, frags[2])
    got = resumed.flush()

    assert want is not None and got is not None
    np.testing.assert_array_equal(got.tsdf, want.tsdf)
    np.testing.assert_array_equal(got.instance, want.instance)
    np.testing.assert_array_equal(got.semantic, want.semantic)
    np.testing.assert_allclose(got.origin, want.origin)
    assert got.overflow == want.overflow
