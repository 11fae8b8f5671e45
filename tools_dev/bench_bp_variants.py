"""Microbenchmark back_project_window variants at fine scale (96^3, 9 views).

Current production: quad-row gather + slice-combine, unrolled views.
Variants try to kill the {1,0}->{0,1} layout copies seen in traces.
"""
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

from eprecon_tpu.ops.back_project import back_project_window
from eprecon_tpu.ops.grid import dense_coords
from eprecon_tpu.utils.benchmark import time_fn

rng = np.random.default_rng(0)
V, H, W, C = 9, 120, 160, 24
DIM = (96, 96, 96)
feats = jnp.asarray(rng.standard_normal((V, 1, H, W, C)).astype(np.float32))
# plausible projection matrices: look along z with offsets
proj = np.zeros((V, 1, 4, 4), np.float32)
for v in range(V):
    K = np.array([[150, 0, W / 2], [0, 150, H / 2], [0, 0, 1]], np.float32)
    E = np.eye(4, dtype=np.float32)
    E[0, 3] = 0.3 * (v - V // 2)
    E[2, 3] = 3.0
    P = np.eye(4, dtype=np.float32)
    P[:3, :3] = K @ E[:3, :3]
    P[:3, 3] = K @ E[:3, 3]
    proj[v, 0] = P
proj = jnp.asarray(proj)
origin = jnp.asarray([[-2.0, -2.0, -2.0]], jnp.float32)
VS = 0.04


def variant_reshape(dim, interval, origin, voxel_size, feats, proj):
    """Combine via [n,4,c] reshape instead of four slices."""
    vv, _, h, w, c = feats.shape
    coords = dense_coords(dim).reshape(-1, 3).astype(jnp.float32) * interval
    world = coords * voxel_size + origin[0][None, :]
    pts = jnp.concatenate([world, jnp.ones_like(world[:, :1])], axis=1)
    flat_imgs = feats[:, 0].reshape(vv, h * w, c).astype(jnp.bfloat16)
    n = pts.shape[0]

    def view_term(img, pm):
        quad = jnp.concatenate(
            [img, jnp.roll(img, -1, axis=0), jnp.roll(img, -w, axis=0),
             jnp.roll(img, -(w + 1), axis=0)], axis=1)
        cam = pts @ pm.T
        z = cam[:, 2]
        safe_z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
        u = cam[:, 0] / safe_z
        v = cam[:, 1] / safe_z
        m = (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1) & (z > 0)
        u0 = jnp.floor(u)
        v0 = jnp.floor(v)
        du = u - u0
        dv = v - v0
        base = (jnp.clip(v0, 0, h - 1).astype(jnp.int32) * w
                + jnp.clip(u0, 0, w - 1).astype(jnp.int32))
        g = quad[base].reshape(n, 4, c)
        ws = []
        for cy, cx in ((0, 0), (0, 1), (1, 0), (1, 1)):
            px = u0 + cx
            py = v0 + cy
            wgt = ((du if cx else 1 - du) * (dv if cy else 1 - dv))
            inb = (px >= 0) & (px <= w - 1) & (py >= 0) & (py <= h - 1)
            ws.append(jnp.where(inb & m, wgt, 0.0).astype(jnp.bfloat16))
        wmat = jnp.stack(ws, axis=1)  # [n, 4]
        s = jnp.einsum("nqc,nq->nc", g, wmat)
        return s, m

    total = jnp.zeros((n, c), jnp.bfloat16)
    count = jnp.zeros(n, jnp.float32)
    for vi in range(vv):
        s, m = view_term(flat_imgs[vi], proj[vi, 0])
        total = total + s
        count = count + m.astype(jnp.float32)
    mean = total / jnp.maximum(count, 1.0)[:, None].astype(jnp.bfloat16)
    return mean.reshape(*dim, c), count.reshape(dim)


def variant_f32acc(dim, interval, origin, voxel_size, feats, proj):
    """Accumulate in f32 (wider accumulator, maybe friendlier layout)."""
    vv, _, h, w, c = feats.shape
    coords = dense_coords(dim).reshape(-1, 3).astype(jnp.float32) * interval
    world = coords * voxel_size + origin[0][None, :]
    pts = jnp.concatenate([world, jnp.ones_like(world[:, :1])], axis=1)
    flat_imgs = feats[:, 0].reshape(vv, h * w, c).astype(jnp.bfloat16)
    n = pts.shape[0]

    def view_term(img, pm):
        quad = jnp.concatenate(
            [img, jnp.roll(img, -1, axis=0), jnp.roll(img, -w, axis=0),
             jnp.roll(img, -(w + 1), axis=0)], axis=1)
        cam = pts @ pm.T
        z = cam[:, 2]
        safe_z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
        u = cam[:, 0] / safe_z
        v = cam[:, 1] / safe_z
        m = (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1) & (z > 0)
        u0 = jnp.floor(u)
        v0 = jnp.floor(v)
        du = u - u0
        dv = v - v0
        base = (jnp.clip(v0, 0, h - 1).astype(jnp.int32) * w
                + jnp.clip(u0, 0, w - 1).astype(jnp.int32))
        g = quad[base]
        ws = []
        for cy, cx in ((0, 0), (0, 1), (1, 0), (1, 1)):
            px = u0 + cx
            py = v0 + cy
            wgt = ((du if cx else 1 - du) * (dv if cy else 1 - dv))
            inb = (px >= 0) & (px <= w - 1) & (py >= 0) & (py <= h - 1)
            ws.append(jnp.where(inb & m, wgt, 0.0).astype(jnp.bfloat16))
        s = (g[:, :c] * ws[0][:, None] + g[:, c:2 * c] * ws[1][:, None]
             + g[:, 2 * c:3 * c] * ws[2][:, None] + g[:, 3 * c:] * ws[3][:, None])
        return s, m

    total = jnp.zeros((n, c), jnp.float32)
    count = jnp.zeros(n, jnp.float32)
    for vi in range(vv):
        s, m = view_term(flat_imgs[vi], proj[vi, 0])
        total = total + s.astype(jnp.float32)
        count = count + m.astype(jnp.float32)
    mean = (total / jnp.maximum(count, 1.0)[:, None]).astype(jnp.bfloat16)
    return mean.reshape(*dim, c), count.reshape(dim)


f_prod = jax.jit(lambda f, p: back_project_window(DIM, 1, origin, VS, f, p))
f_resh = jax.jit(lambda f, p: variant_reshape(DIM, 1, origin, VS, f, p))
f_f32 = jax.jit(lambda f, p: variant_f32acc(DIM, 1, origin, VS, f, p))

for name, fn in [("prod(slices)", f_prod), ("reshape-einsum", f_resh),
                 ("f32-acc", f_f32)]:
    t0 = time.time()
    out = fn(feats, proj)
    jax.block_until_ready(out)
    ms = time_fn(fn, feats, proj, iters=10)
    print(f"{name:16s}: {ms:6.2f} ms   (compile {time.time() - t0:.0f}s)",
          flush=True)
    # cross-check
    m0, c0 = f_prod(feats, proj)
    m1, c1 = fn(feats, proj)
    err = float(jnp.max(jnp.abs(m0.astype(jnp.float32) - m1.astype(jnp.float32))))
    print(f"{'':16s}  max|diff| vs prod = {err:.4f}", flush=True)
