"""Differentiable back-projection of multi-view image features into voxels.

TPU-native equivalent of the reference's Back_Project / get_img_feats and the
variance feature of the occupancy initialization
(reference: models/occupancy_initialization.py:61-182 [variance path],
 :185-261 [mean path]). Pure jnp: project every voxel into every view,
bilinearly sample (torch grid_sample align_corners=True, zeros padding
semantics), mask out-of-frustum samples, reduce across views.

Shapes are static: voxels are capacity-padded [K] with a valid mask; batch
is carried in coords[:, 0] and resolved through a flattened [V, B*H*W, C]
image gather.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows_segsum(table: jnp.ndarray, idx: jnp.ndarray,
                       num_rows: int) -> jnp.ndarray:
    """table[idx] with a sorted segment-sum adjoint.

    The default gather adjoint scatter-adds one cotangent row per GATHERED
    row (884,736 at the fine stage) into the table; with only
    `num_rows` (= table.shape[0], 19,200 at 1/4-res images) distinct
    destinations that is ~46x redundant. This variant sorts the cotangent
    rows by destination and segment-sums them, so the hardware scatter sees
    each destination once. Mathematically identical (up to float summation
    order — tested in tests/test_back_project.py); whether the on-device
    argsort beats the redundant scatter is TPU-measured by
    tools_dev/bench_bp_backward.py. Gated by cfg.model.bp_backward.
    """
    return table[idx]


def _grs_fwd(table, idx, num_rows):
    return table[idx], idx


def _grs_bwd(num_rows, idx, ct):
    order = jnp.argsort(idx)
    d_table = jax.ops.segment_sum(ct[order], idx[order],
                                  num_segments=num_rows,
                                  indices_are_sorted=True)
    return d_table.astype(ct.dtype), None


gather_rows_segsum.defvjp(_grs_fwd, _grs_bwd)


def _gather_rows(table: jnp.ndarray, idx: jnp.ndarray,
                 mode: str) -> jnp.ndarray:
    if mode == "sorted":
        return gather_rows_segsum(table, idx, table.shape[0])
    return table[idx]


def bilinear_sample_flat(images: jnp.ndarray, batch_idx: jnp.ndarray,
                         uv: jnp.ndarray, h: int, w: int,
                         bp_backward: str = "scatter") -> jnp.ndarray:
    """Bilinear sample with zero padding outside the image.

    images: [B*H*W, C] flattened; batch_idx: int32 [N]; uv: [N, 2] pixel
    coords (align_corners=True convention: uv in [0, size-1] maps exactly
    onto pixel centers). Returns [N, C].

    Uses a quad-row table (all 4 bilinear corners in one gathered row):
    HBM gathers cost ~15 ns/row regardless of width up to the 128-lane tile,
    so 1 gather of 4C lanes beats 4 gathers of C lanes ~4x. Rolling wraps
    across row/image boundaries, but those corners always carry zero weight
    (the in-bounds test masks them).
    """
    c = images.shape[-1]
    quad = jnp.concatenate(
        [images, jnp.roll(images, -1, axis=0), jnp.roll(images, -w, axis=0),
         jnp.roll(images, -(w + 1), axis=0)], axis=1)  # [BHW, 4C]
    u, v = uv[..., 0], uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    base = (batch_idx * (h * w)
            + jnp.clip(v0, 0, h - 1).astype(jnp.int32) * w
            + jnp.clip(u0, 0, w - 1).astype(jnp.int32))
    g = _gather_rows(quad, base, bp_backward)  # [N, 4C]
    ws = []
    for cy, cx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        px = u0 + cx
        py = v0 + cy
        wgt = ((du if cx else 1 - du) * (dv if cy else 1 - dv))
        inb = (px >= 0) & (px <= w - 1) & (py >= 0) & (py <= h - 1)
        ws.append(jnp.where(inb, wgt, 0.0).astype(images.dtype))
    return (g[:, :c] * ws[0][..., None] + g[:, c:2 * c] * ws[1][..., None]
            + g[:, 2 * c:3 * c] * ws[2][..., None] + g[:, 3 * c:] * ws[3][..., None])


def project_to_views(coords: jnp.ndarray, valid: jnp.ndarray, origin: jnp.ndarray,
                     voxel_size: float, proj: jnp.ndarray, h: int, w: int
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project voxels into all views.

    coords: int32 [K, 4] (b,x,y,z) in fine-voxel units; origin: [B, 3] world
    origin of the fragment; proj: [V, B, 4, 4] world→pixel.
    Returns (uv [V, K, 2] pixel coords, mask [V, K] in-frustum & valid).
    Matches reference models/occupancy_initialization.py:87-102 in-bounds test.
    """
    b = coords[:, 0]
    world = coords[:, 1:].astype(jnp.float32) * voxel_size + origin[b]  # [K,3]
    pts = jnp.concatenate([world, jnp.ones_like(world[:, :1])], axis=1)  # [K,4]
    proj_k = proj[:, b]  # [V, K, 4, 4]
    cam = jnp.einsum("vkij,kj->vki", proj_k, pts)  # [V, K, 4]
    z = cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = cam[..., 0] / safe_z
    v = cam[..., 1] / safe_z
    mask = (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1) & (z > 0) & valid[None, :]
    return jnp.stack([u, v], axis=-1), mask


def back_project_mean(coords: jnp.ndarray, valid: jnp.ndarray, origin: jnp.ndarray,
                      voxel_size: float, feats: jnp.ndarray, proj: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Average visible-view features per voxel (reference Back_Project,
    models/occupancy_initialization.py:189-261).

    feats: [V, B, H, W, C]; returns (mean feats [K, C], count [K] float).
    """
    vv, bb, h, w, c = feats.shape
    uv, mask = project_to_views(coords, valid, origin, voxel_size, proj, h, w)
    flat_imgs = feats.reshape(vv, bb * h * w, c)
    b = coords[:, 0]
    total = None
    for view in range(vv):
        s = bilinear_sample_flat(flat_imgs[view], b, uv[view], h, w)
        s = s * mask[view][:, None]
        total = s if total is None else total + s
    count = jnp.sum(mask.astype(jnp.float32), axis=0)  # [K]
    mean = total / jnp.maximum(count, 1.0)[:, None]
    return mean, count


def back_project_window(dim, interval: int, origin: jnp.ndarray,
                        voxel_size: float, feats: jnp.ndarray,
                        proj: jnp.ndarray, bp_backward: str = "scatter"):
    """Dense-window back-projection (batch=1 fast path, no per-voxel proj
    gather): mean of visible-view features for every voxel of the window.

    dim: (X, Y, Z) window shape; interval: window stride in fine voxels;
    feats: [V, 1, H, W, C]; proj: [V, 1, 4, 4].
    Returns (mean feats [X, Y, Z, C] bf16, count [X, Y, Z] f32).

    Views are UNROLLED: with the quad-row bf16 table XLA fuses each view's
    gather+bilinear-combine+accumulate into one kernel (~3.2 ms/view at
    884k voxels), whereas lax.scan peels one iteration whose gather and
    combine stay unfused through a [884736, 4C] HBM intermediate (+28 ms).
    Measured on v5e: unroll 28.8 ms vs scan 40.8 ms for 9 views at 96^3.
    (The OOM the scan originally avoided was with separate f32 4-corner
    gathers; the fused quad-row form keeps no large intermediates alive.)
    """
    from eprecon_tpu.ops.grid import dense_coords

    vv, _, h, w, c = feats.shape
    coords = dense_coords(dim).reshape(-1, 3).astype(jnp.float32) * interval
    world = coords * voxel_size + origin[0][None, :]
    pts = jnp.concatenate([world, jnp.ones_like(world[:, :1])], axis=1)
    flat_imgs = feats[:, 0].reshape(vv, h * w, c).astype(jnp.bfloat16)
    n = pts.shape[0]

    def view_term(img, pm):
        # quad-row table: one gathered row holds all 4 bilinear corners
        # (HBM gathers cost ~15 ns/row regardless of width up to the 128-lane
        # tile, so 1 gather of 4C lanes beats 4 gathers of C lanes ~4x)
        quad = jnp.concatenate(
            [img, jnp.roll(img, -1, axis=0), jnp.roll(img, -w, axis=0),
             jnp.roll(img, -(w + 1), axis=0)], axis=1)  # [HW, 4C]
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
        g = _gather_rows(quad, base, bp_backward)  # [N, 4C]
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

    total = jnp.zeros((n, c), jnp.bfloat16)
    count = jnp.zeros(n, jnp.float32)
    for vi in range(vv):
        s, m = view_term(flat_imgs[vi], proj[vi, 0])
        total = total + s
        count = count + m.astype(jnp.float32)
    mean = total / jnp.maximum(count, 1.0)[:, None].astype(jnp.bfloat16)
    return mean.reshape(*dim, c), count.reshape(dim)


def back_project_variance(coords: jnp.ndarray, valid: jnp.ndarray, origin: jnp.ndarray,
                          voxel_size: float, feats: jnp.ndarray, proj: jnp.ndarray,
                          bp_backward: str = "scatter"
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cross-view feature variance per voxel — the occupancy-init matching
    cost (reference models/occupancy_initialization.py:119-128).

    feats: [V, B, H, W, C]; returns (variance [K, C], count [K] float).
    Variance is over visible views: E[(x - mean)^2] with masked mean.
    Computed streaming (sum & sum-of-squares) so the [V, K, C] tensor is
    never materialized. Views are unrolled so gather+combine fuse per view
    (lax.scan peels an unfused iteration — see back_project_window).
    """
    vv, bb, h, w, c = feats.shape
    uv, mask = project_to_views(coords, valid, origin, voxel_size, proj, h, w)
    flat_imgs = feats.reshape(vv, bb * h * w, c)
    b = coords[:, 0]
    n = coords.shape[0]

    s1 = jnp.zeros((n, c), feats.dtype)
    s2 = jnp.zeros((n, c), feats.dtype)
    count = jnp.zeros(n, jnp.float32)
    for vi in range(vv):
        s = bilinear_sample_flat(flat_imgs[vi], b, uv[vi], h, w, bp_backward)
        s = s * mask[vi][:, None]
        s1 = s1 + s
        s2 = s2 + s * s
        count = count + mask[vi].astype(jnp.float32)
    denom = jnp.maximum(count, 1.0)[:, None].astype(s1.dtype)
    mean = s1 / denom
    # E[x^2] - mean^2 over visible views (masked entries contribute 0 to s2
    # and to s1, matching the reference's mask-weighted sums)
    var = s2 / denom - mean * mean
    var = jnp.maximum(var, 0.0)
    return var, count
