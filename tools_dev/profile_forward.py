"""Trace-profile the full-scale fragment forward and rank hot XLA ops."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

cache = os.path.expanduser(f"~/.cache/jax_compilation_{jax.default_backend()}")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from eprecon_tpu.config import default_config
from eprecon_tpu.models.eprecon import EPRecon, FragmentInputs, make_recurrent_state
from eprecon_tpu.utils.profiling import device_trace, summarize_trace

cfg = default_config()
frag_cache = os.path.expanduser("~/.cache/eprecon_bench_fragment.npz")
z = np.load(frag_cache)
d = {k: z[k] for k in z.files}
frag = FragmentInputs(
    proj_matrices=jnp.asarray(d["proj_matrices"]),
    vol_origin_partial=jnp.asarray(d["vol_origin_partial"]),
    world_to_aligned_camera=jnp.asarray(d["world_to_aligned_camera"]),
    rel_origins=jnp.zeros((cfg.model.n_layer, 3), jnp.int32))
state = make_recurrent_state(cfg.model)
imgs = jnp.asarray(d["imgs"])

model = EPRecon(cfg.model)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs, frag, state, None)

import functools


@functools.partial(jax.jit, donate_argnums=(3,))
def fwd(variables, imgs, frag, state):
    (outputs, _, new_state), _ = model.apply(
        variables, imgs, frag, state, None, mutable=["batch_stats"])
    return outputs["tsdf"], outputs["pred_masks"], new_state


t0 = time.time()
tsdf, masks, state = fwd(variables, imgs, frag, state)
print(f"# compile+first: {time.time() - t0:.0f}s", file=sys.stderr)
for _ in range(3):
    tsdf, masks, state = fwd(variables, imgs, frag, state)
float(tsdf.reshape(-1)[0])

N = 10
logdir = "/tmp/eprecon_trace"
with device_trace(logdir):
    for _ in range(N):
        tsdf, masks, state = fwd(variables, imgs, frag, state)
    float(tsdf.reshape(-1)[0])

summarize_trace(logdir, top=45, divide_by=N)
