"""Vectorized TSDF fusion in pure JAX.

TPU-native replacement for both the reference's embedded pycuda kernel
(tools/tsdf_fusion/fusion.py:67-142) and the torch CPU variant
(tools/tsdf_fusion/fusion.py:440-485 `integrate`, :488-577 TSDFVolumeTorch).
Exact same math: nearest-pixel depth lookup, truncation to [.,1], running
weighted average. jit-compiled; the multi-frame variant scans over frames.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from eprecon_tpu.ops.grid import dense_coords


class TSDFVolume(NamedTuple):
    """Functional TSDF volume state."""
    tsdf: jnp.ndarray    # [X, Y, Z] float32, init 1
    weight: jnp.ndarray  # [X, Y, Z] float32, init 0
    origin: jnp.ndarray  # [3] world position of voxel (0,0,0)
    voxel_size: float
    sdf_trunc: float


def make_volume(vol_dim: Sequence[int], origin, voxel_size: float,
                margin: int = 3) -> TSDFVolume:
    vol_dim = tuple(int(d) for d in vol_dim)
    return TSDFVolume(
        tsdf=jnp.ones(vol_dim, jnp.float32),
        weight=jnp.zeros(vol_dim, jnp.float32),
        origin=jnp.asarray(origin, jnp.float32),
        voxel_size=float(voxel_size),
        sdf_trunc=float(margin * voxel_size),
    )


def integrate(vol: TSDFVolume, depth_im: jnp.ndarray, cam_intr: jnp.ndarray,
              cam_pose: jnp.ndarray, obs_weight: float = 1.0) -> TSDFVolume:
    """Integrate one depth frame (reference fusion.py:440-485 semantics).

    depth_im: [H, W] meters (0 = invalid). cam_intr: [3,3]. cam_pose: [4,4]
    camera-to-world.
    """
    im_h, im_w = depth_im.shape
    shape = vol.tsdf.shape
    coords = dense_coords(shape).reshape(-1, 3).astype(jnp.float32)  # [N,3]
    world = vol.origin[None, :] + vol.voxel_size * coords

    world2cam = jnp.linalg.inv(cam_pose)
    cam = world @ world2cam[:3, :3].T + world2cam[:3, 3]
    fx, fy = cam_intr[0, 0], cam_intr[1, 1]
    cx, cy = cam_intr[0, 2], cam_intr[1, 2]
    pix_z = cam[:, 2]
    safe_z = jnp.where(jnp.abs(pix_z) < 1e-12, 1e-12, pix_z)
    pix_x = jnp.round(cam[:, 0] * fx / safe_z + cx).astype(jnp.int32)
    pix_y = jnp.round(cam[:, 1] * fy / safe_z + cy).astype(jnp.int32)

    valid_pix = (pix_x >= 0) & (pix_x < im_w) & (pix_y >= 0) & (pix_y < im_h) & (pix_z > 0)
    px = jnp.clip(pix_x, 0, im_w - 1)
    py = jnp.clip(pix_y, 0, im_h - 1)
    depth_val = depth_im[py, px]

    depth_diff = depth_val - pix_z
    dist = jnp.minimum(depth_diff / vol.sdf_trunc, 1.0)
    valid = valid_pix & (depth_val > 0) & (depth_diff >= -vol.sdf_trunc)

    tsdf_flat = vol.tsdf.reshape(-1)
    w_flat = vol.weight.reshape(-1)
    w_new = w_flat + obs_weight
    tsdf_upd = (w_flat * tsdf_flat + obs_weight * dist) / w_new
    tsdf_flat = jnp.where(valid, tsdf_upd, tsdf_flat)
    w_flat = jnp.where(valid, w_new, w_flat)
    return vol._replace(tsdf=tsdf_flat.reshape(shape), weight=w_flat.reshape(shape))


@functools.partial(jax.jit, static_argnames=("vol_dim", "voxel_size", "margin"))
def fuse_frames(depths: jnp.ndarray, intrinsics: jnp.ndarray, poses: jnp.ndarray,
                origin: jnp.ndarray, vol_dim: Tuple[int, int, int],
                voxel_size: float, margin: int = 3) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fuse a stack of frames into a fresh volume with lax.scan.

    depths: [V, H, W]; intrinsics: [V, 3, 3]; poses: [V, 4, 4].
    Returns (tsdf, weight) dense volumes.
    """
    vol = make_volume(vol_dim, origin, voxel_size, margin)

    def body(v, frame):
        d, k, p = frame
        return integrate(v, d, k, p), None

    vol, _ = jax.lax.scan(body, vol, (depths, intrinsics, poses))
    return vol.tsdf, vol.weight


def occupancy_from_tsdf(tsdf: jnp.ndarray, weight: jnp.ndarray,
                        min_weight: float = 1.0) -> jnp.ndarray:
    """Occupancy GT: |tsdf| < 0.999 observed by > min_weight views
    (reference: datasets/transforms.py:295-297)."""
    return (tsdf < 0.999) & (tsdf > -0.999) & (weight > min_weight)
