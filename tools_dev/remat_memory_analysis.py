"""Peak-memory analysis of the full-scale train step per remat_mode.

The remat_mode A/B *timing* needs the real TPU (tools_dev/bench_train_remat),
but the memory side of the tradeoff is measurable anywhere: XLA's
compile-time memory analysis reports the temp-buffer high-water mark of the
compiled program, which is what decides whether a mode fits v5e HBM (16 GB).
AOT-compiles the production-shape (96^3 window, 640x480 x 9 views,
fragment-batch 1) train step on ONE CPU device per mode and prints the
analysis; results go to PERF_NOTES.md.

  python tools_dev/remat_memory_analysis.py [full|light|none] ...

Run modes in separate invocations if RAM is tight (each compile peaks
~15 GB host RSS).
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

cache = os.path.expanduser("~/.cache/jax_compilation_cpu")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

from eprecon_tpu.config import default_config
from eprecon_tpu.data.synthetic import make_fragment
from eprecon_tpu.models.eprecon import (EPRecon, FragmentInputs,
                                        FragmentTargets, make_recurrent_state)
from eprecon_tpu.train.state import (TrainState, freeze_mask_for,
                                     make_optimizer, make_train_step)

GB = 1 << 30


def analyze(mode: str):
    cfg = default_config()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, remat_mode=mode))
    d = make_fragment(n_views=cfg.train.n_views, image_hw=(480, 640),
                      n_vox=cfg.model.n_vox, voxel_size=cfg.model.voxel_size,
                      seed=0)
    frag = FragmentInputs(
        proj_matrices=jnp.asarray(d["proj_matrices"]),
        vol_origin_partial=jnp.asarray(d["vol_origin_partial"]),
        world_to_aligned_camera=jnp.asarray(d["world_to_aligned_camera"]),
        rel_origins=jnp.zeros((cfg.model.n_layer, 3), jnp.int32))
    targets = FragmentTargets(
        tsdf=tuple(jnp.asarray(t) for t in d["tsdf_levels"]),
        occ=tuple(jnp.asarray(o) for o in d["occ_levels"]),
        semantic=jnp.asarray(d["semantic"]),
        instance=jnp.asarray(d["instance"]))
    rec = make_recurrent_state(cfg.model)
    imgs = jnp.asarray(d["imgs"])

    model = EPRecon(cfg.model)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), imgs, frag,
                            rec, targets)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    params = variables["params"]
    mask = freeze_mask_for(params, cfg.train.finetune_layer)
    tx = make_optimizer(cfg, 1000, mask)
    tstate = TrainState(params,
                        {"batch_stats": variables.get("batch_stats", {}),
                         "buffers": variables.get("buffers", {})},
                        tx.init(params), jnp.zeros((), jnp.int32),
                        jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx, cfg)

    if not hasattr(step, "lower"):
        step = jax.jit(step)
    t0 = time.time()
    lowered = step.lower(tstate, imgs, frag, targets, rec)
    print(f"[{mode}] lowered in {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"[{mode}] compiled in {time.time() - t0:.0f}s", flush=True)
    mem = compiled.memory_analysis()
    if mem is None:
        print(f"[{mode}] no memory analysis available")
        return
    tmp = getattr(mem, "temp_size_in_bytes", 0)
    arg = getattr(mem, "argument_size_in_bytes", 0)
    out = getattr(mem, "output_size_in_bytes", 0)
    alias = getattr(mem, "alias_size_in_bytes", 0)
    print(f"[{mode}] temp {tmp / GB:.2f} GiB, args {arg / GB:.2f} GiB, "
          f"out {out / GB:.2f} GiB, aliased {alias / GB:.2f} GiB, "
          f"peak≈temp+args-alias {(tmp + arg - alias) / GB:.2f} GiB",
          flush=True)


if __name__ == "__main__":
    for m in (sys.argv[1:] or ["full", "light", "none"]):
        analyze(m)
