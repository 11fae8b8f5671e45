"""Two sequential MnasMulti applies vs one vmapped (stacked-params) apply."""
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

from eprecon_tpu.models.backbone import MnasMulti
from eprecon_tpu.utils.benchmark import time_fn

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((9, 480, 640, 3)).astype(np.float32))
m = MnasMulti(1.0)
x_small = jnp.zeros((1, 64, 64, 3))
v1 = jax.jit(m.init)(jax.random.PRNGKey(0), x_small)
v2 = jax.jit(m.init)(jax.random.PRNGKey(1), x_small)
print("init done", flush=True)

def two_seq(v1, v2, x):
    f1, _ = m.apply(v1, x, mutable=["batch_stats"])
    f2, _ = m.apply(v2, x, mutable=["batch_stats"])
    return f1, f2

stacked = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), v1, v2)

def vmapped(vs, x):
    return jax.vmap(lambda v: m.apply(v, x, mutable=["batch_stats"])[0])(vs)

j2 = jax.jit(two_seq)
jv = jax.jit(vmapped)

t0 = time.time()
o = j2(v1, v2, x); jax.block_until_ready(o)
print(f"seq compile {time.time()-t0:.0f}s", flush=True)
print(f"two sequential: {time_fn(j2, v1, v2, x, iters=20):.2f} ms", flush=True)

t0 = time.time()
o = jv(stacked, x); jax.block_until_ready(o)
print(f"vmap compile {time.time()-t0:.0f}s", flush=True)
print(f"vmapped stacked: {time_fn(jv, stacked, x, iters=20):.2f} ms", flush=True)
