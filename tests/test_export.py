"""AOT serving artifact (jax.export): serialize → reload → numeric parity
with the live jitted pipeline, plus cross-platform (TPU) lowering on a
CPU-only machine."""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eprecon_tpu.config import default_config
from eprecon_tpu.data.synthetic import make_fragment, make_scene
from eprecon_tpu.inference import export as exp
from eprecon_tpu.models.eprecon import (EPRecon, FragmentInputs,
                                        make_recurrent_state)
from eprecon_tpu.models.gru_fusion import PanopticGlobalDense


def _tiny_setup():
    cfg = default_config()
    m = dataclasses.replace(
        cfg.model, n_vox=(32, 32, 32), voxel_size=0.12,
        voxel_capacity=(512, 2048, 8192), global_extent=(64, 64, 32),
        min_init_voxels=100, min_stage_voxels=50)
    cfg = dataclasses.replace(cfg, model=m)
    d = make_fragment(n_views=4, image_hw=(96, 128), n_vox=m.n_vox,
                      voxel_size=m.voxel_size, seed=0, scene=make_scene(0))
    frag = FragmentInputs(jnp.asarray(d["proj_matrices"]),
                          jnp.asarray(d["vol_origin_partial"]),
                          jnp.asarray(d["world_to_aligned_camera"]),
                          jnp.zeros((3, 3), jnp.int32))
    imgs = jnp.asarray(d["imgs"])
    model = EPRecon(cfg.model)
    rec = make_recurrent_state(cfg.model)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs, frag, rec,
                                    None)
    return cfg, model, variables, imgs, frag, rec


@pytest.mark.slow
def test_export_roundtrip_matches_live(tmp_path):
    cfg, model, variables, imgs, frag, rec = _tiny_setup()
    pmap = PanopticGlobalDense.empty(tuple(cfg.model.global_extent))

    from eprecon_tpu.inference.pipeline import fragment_forward
    live = jax.jit(lambda v, i, f, r, p:
                   fragment_forward(model, cfg, v, i, f, r, p, None))
    out_l, _, rec_l, pmap_l = live(variables, imgs, frag, rec, pmap)

    exported = exp.export_fragment_forward(cfg, variables, imgs, frag,
                                           platforms=("cpu",))
    path = os.path.join(tmp_path, "fragment_forward.stablehlo")
    exp.save_serving_artifact(path, exported)
    assert os.path.getsize(path) > 1000

    loaded = exp.load_serving_artifact(path)
    out_e, _, rec_e, pmap_e = loaded.call(variables, imgs, frag, rec, pmap)

    np.testing.assert_allclose(np.asarray(out_l["tsdf_window"]),
                               np.asarray(out_e["tsdf_window"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_l["pred_logits"]),
                               np.asarray(out_e["pred_logits"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(pmap_l.instance),
                                  np.asarray(pmap_e.instance))
    np.testing.assert_array_equal(np.asarray(pmap_l.semantic),
                                  np.asarray(pmap_e.semantic))
    # recurrent feature volumes (bf16): bit-identical program → tight
    for gl, ge in zip(rec_l.gmaps, rec_e.gmaps):
        np.testing.assert_allclose(
            np.asarray(gl.feats, np.float32), np.asarray(ge.feats, np.float32),
            rtol=2e-2, atol=2e-2)


@pytest.mark.slow
def test_export_tpu_lowering_on_cpu_machine(tmp_path):
    """Cross-platform lowering: a (tpu, cpu) artifact must serialize on this
    CPU-only test machine — the build-machine deployment story."""
    cfg, model, variables, imgs, frag, rec = _tiny_setup()
    try:
        exported = exp.export_fragment_forward(cfg, variables, imgs, frag,
                                               platforms=("tpu", "cpu"))
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cross-platform TPU lowering unavailable here: {e}")
    assert set(p.lower() for p in exported.platforms) == {"tpu", "cpu"}
    blob = exported.serialize()
    assert len(blob) > 1000
    # and the dual-platform artifact still runs on CPU after reload
    exp._register_serialization()
    loaded = jax.export.deserialize(bytearray(blob))
    pmap = PanopticGlobalDense.empty(tuple(cfg.model.global_extent))
    out, _, _, _ = loaded.call(variables, imgs, frag, rec, pmap)
    assert np.isfinite(np.asarray(out["tsdf_window"])).all()
