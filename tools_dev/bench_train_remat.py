"""Time the full-scale train step under each remat_mode (VERDICT r2 Next #6).

  python tools_dev/bench_train_remat.py [full|light|none] [iters]

Run each mode in its OWN process (XLA memory state and the donated buffers
make in-process A/B unreliable); the measured numbers go to PERF_NOTES.md.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

cache = os.path.expanduser(f"~/.cache/jax_compilation_{jax.default_backend()}")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from eprecon_tpu.config import default_config
from eprecon_tpu.data.synthetic import make_fragment
from eprecon_tpu.models.eprecon import (FragmentInputs, FragmentTargets,
                                        make_recurrent_state)
from eprecon_tpu.train.state import create_train_state, make_train_step

mode = sys.argv[1] if len(sys.argv) > 1 else "full"
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

cfg = default_config()
cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model,
                                                         remat_mode=mode))
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
    semantic=jnp.asarray(d["semantic"]), instance=jnp.asarray(d["instance"]))
rec = make_recurrent_state(cfg.model)
imgs = jnp.asarray(d["imgs"])

t0 = time.time()
tstate, model, tx = create_train_state(cfg, jax.random.PRNGKey(0),
                                       (imgs, frag, rec, targets))
print(f"# init {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
step = make_train_step(model, tx, cfg)

t0 = time.time()
tstate, rec, metrics = step(tstate, imgs, frag, targets, rec)
print(f"# compile+first: {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
for _ in range(3):
    tstate, rec, metrics = step(tstate, imgs, frag, targets, rec)
float(metrics["total_loss"])

t0 = time.perf_counter()
for _ in range(iters):
    tstate, rec, metrics = step(tstate, imgs, frag, targets, rec)
loss = float(metrics["total_loss"])
ms = (time.perf_counter() - t0) * 1e3 / iters
print(f"remat_mode={mode}: train step {ms:.1f} ms  (loss {loss:.4f})",
      flush=True)
