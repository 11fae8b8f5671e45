"""Trace-profile the URA (eval-mode) full-scale forward."""
import functools
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
from eprecon_tpu.models.eprecon import EPRecon, FragmentInputs, make_recurrent_state
from eprecon_tpu.utils.profiling import device_trace, summarize_trace

cfg = default_config()
z = np.load(os.path.expanduser("~/.cache/eprecon_bench_fragment.npz"))
d = {k: z[k] for k in z.files}
frag = FragmentInputs(
    proj_matrices=jnp.asarray(d["proj_matrices"]),
    vol_origin_partial=jnp.asarray(d["vol_origin_partial"]),
    world_to_aligned_camera=jnp.asarray(d["world_to_aligned_camera"]),
    rel_origins=jnp.zeros((cfg.model.n_layer, 3), jnp.int32))
state = make_recurrent_state(cfg.model)
imgs = jnp.asarray(d["imgs"])

model = EPRecon(cfg.model, use_running_average=True)
init_model = EPRecon(cfg.model)
variables = jax.jit(init_model.init)(jax.random.PRNGKey(0), imgs, frag, state, None)


@functools.partial(jax.jit, donate_argnums=(3,))
def fwd(variables, imgs, frag, state):
    outputs, _, new_state = model.apply(variables, imgs, frag, state, None)
    return outputs["tsdf"], outputs["pred_masks"], new_state


t0 = time.time()
tsdf, masks, state = fwd(variables, imgs, frag, state)
print(f"# compile+first: {time.time() - t0:.0f}s", file=sys.stderr)
for _ in range(3):
    tsdf, masks, state = fwd(variables, imgs, frag, state)
float(tsdf.reshape(-1)[0])

N = 10
logdir = "/tmp/eprecon_trace_ura"
with device_trace(logdir):
    for _ in range(N):
        tsdf, masks, state = fwd(variables, imgs, frag, state)
    float(tsdf.reshape(-1)[0])

summarize_trace(logdir, top=40, divide_by=N)
