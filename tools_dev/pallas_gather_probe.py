"""Probe: can Mosaic lower a data-dependent vectorized gather from a
VMEM-resident table? (VERDICT r3 #6 — Pallas back-projection attempt.)

Round-1 finding (PERF_NOTES "Explored and rejected"): jnp.take /
take_along_axis failed to lower. Re-test on the current jaxlib, plus the
fori_loop-of-dynamic-slices formulation, and if anything lowers, A/B it
against XLA's native gather at the fine-stage shape (884,736 rows from a
[19200, 96] bf16 table — 3.7 MB, VMEM-resident).

  python tools_dev/pallas_gather_probe.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, T, C = 884736, 19200, 96
rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal((T, C)), jnp.bfloat16)
idx = jnp.asarray(rng.integers(0, T, N), jnp.int32)


def try_variant(name, fn):
    try:
        out = jax.jit(fn)(table, idx)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{name}: FAILED TO LOWER — {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
        return None
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        out = jax.jit(fn)(table, idx)
    float(jnp.asarray(out, jnp.float32)[0, 0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name}: {dt:.2f} ms  ({N / (dt * 1e6):.2f} rows/ns)", flush=True)
    return dt


# 0. baseline: XLA native gather
try_variant("xla_native_gather", lambda t, i: t[i])


# 1. pallas: jnp.take inside the kernel, table + idx in VMEM, row-blocked out
def take_kernel(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)


def pallas_take(t, i):
    BLK = 4096
    return pl.pallas_call(
        take_kernel,
        grid=(N // BLK,),
        in_specs=[pl.BlockSpec((T, C), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BLK,), lambda k: (k,),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLK, C), lambda k: (k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.bfloat16),
    )(t, i)


try_variant("pallas_take_blocked", pallas_take)


# 2. pallas: fori_loop of per-row dynamic slices (scalar loop — expected
# slow even if it lowers; included to see whether it lowers at all)
def loop_kernel(t_ref, i_ref, o_ref):
    def body(r, _):
        o_ref[pl.ds(r, 1), :] = t_ref[pl.ds(i_ref[r], 1), :]
        return _

    jax.lax.fori_loop(0, i_ref.shape[0], body, 0)


def pallas_loop(t, i):
    BLK = 1024
    return pl.pallas_call(
        loop_kernel,
        grid=(N // BLK,),
        in_specs=[pl.BlockSpec((T, C), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BLK,), lambda k: (k,),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLK, C), lambda k: (k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.bfloat16),
    )(t, i)


try_variant("pallas_rowloop", pallas_loop)
