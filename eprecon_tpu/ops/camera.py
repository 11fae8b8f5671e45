"""Camera / projection math.

TPU-native equivalents of the reference's pose handling:
  - projection matrices per view per pyramid scale
    (reference: datasets/transforms.py:41-80 IntrinsicsPoseToProjection)
  - gravity-ish world_to_aligned_camera alignment from the middle view
    (reference: datasets/transforms.py:48-63)
  - view-frustum corner computation used for fragment bounds
    (reference: datasets/transforms.py:443-459)
All functions are pure jnp and jit-safe.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def scale_intrinsics(intrinsics: jnp.ndarray, factor: float) -> jnp.ndarray:
    """Divide the first two rows of K by `factor` (reference transforms.py:71-72)."""
    k = intrinsics / factor
    k = k.at[..., 2, :].set(intrinsics[..., 2, :])
    return k


def projection_matrices(intrinsics: jnp.ndarray, extrinsics: jnp.ndarray,
                        stride: int = 4, n_scales: int = 3) -> jnp.ndarray:
    """Per-view per-scale 4x4 world→pixel matrices.

    Args:
      intrinsics: [V, 3, 3] camera intrinsics for the (resized) images.
      extrinsics: [V, 4, 4] camera-to-world poses.
    Returns:
      [V, n_scales, 4, 4]; scale s uses K / (stride * 2**s)
      (reference: datasets/transforms.py:66-77; stride 4 matches feature maps
      at 1/4, 1/8, 1/16 of the 640x480 input).
    """
    world2cam = jnp.linalg.inv(extrinsics)  # [V, 4, 4]
    mats = []
    for s in range(n_scales):
        k = scale_intrinsics(intrinsics, stride * (2 ** s))  # [V,3,3]
        proj = world2cam
        top = jnp.einsum("vij,vjk->vik", k, world2cam[:, :3, :4])
        proj = proj.at[:, :3, :4].set(top)
        mats.append(proj)
    return jnp.stack(mats, axis=1)


def rotate_view_to_align_xyplane(cam_to_world: jnp.ndarray) -> jnp.ndarray:
    """Rotation that aligns the camera's view with the world xy-plane.

    Matches reference datasets/transforms.py:48-56: rotates the world-space
    up vector [0,0,1] (expressed in camera space) onto the camera-space
    [0,-1,0], via an axis-angle rotation.
    Returns a 3x3 rotation matrix.
    """
    world2cam = jnp.linalg.inv(cam_to_world)
    z_c = (world2cam @ jnp.array([0.0, 0.0, 1.0, 0.0]))[:3]
    target = jnp.array([0.0, -1.0, 0.0])
    axis = jnp.cross(z_c, target)
    axis = axis / (jnp.linalg.norm(axis) + 1e-12)
    theta = jnp.arccos(jnp.clip(-z_c[1] / (jnp.linalg.norm(z_c) + 1e-12), -1.0, 1.0))
    return _axangle_to_mat(axis, theta)


def _axangle_to_mat(axis: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation (equivalent to transforms3d axangle2quat→quat2mat)."""
    x, y, z = axis[0], axis[1], axis[2]
    c, s = jnp.cos(theta), jnp.sin(theta)
    C = 1.0 - c
    return jnp.array([
        [x * x * C + c, x * y * C - z * s, x * z * C + y * s],
        [y * x * C + z * s, y * y * C + c, y * z * C - x * s],
        [z * x * C - y * s, z * y * C + x * s, z * z * C + c],
    ])


def world_to_aligned_camera(middle_pose: jnp.ndarray) -> jnp.ndarray:
    """4x4 transform from world to the gravity-aligned middle-camera frame
    (reference: datasets/transforms.py:59-63)."""
    rot = rotate_view_to_align_xyplane(middle_pose)
    rot4 = jnp.eye(4).at[:3, :3].set(rot)
    return rot4 @ jnp.linalg.inv(middle_pose)


def view_frustum_points(max_depth: float, im_hw: Tuple[int, int],
                        cam_intr: jnp.ndarray, cam_pose: jnp.ndarray) -> jnp.ndarray:
    """Corners of the camera view frustum in world space, [3, 5]
    (reference: datasets/transforms.py:443-459)."""
    im_h, im_w = im_hw
    d = jnp.array([0.0, max_depth, max_depth, max_depth, max_depth])
    xs = (jnp.array([0.0, 0.0, 0.0, im_w, im_w]) - cam_intr[0, 2]) * d / cam_intr[0, 0]
    ys = (jnp.array([0.0, 0.0, im_h, 0.0, im_h]) - cam_intr[1, 2]) * d / cam_intr[1, 1]
    pts = jnp.stack([xs, ys, d])  # [3, 5] camera space
    pts_h = jnp.concatenate([pts, jnp.ones((1, 5))], axis=0)
    world = cam_pose @ pts_h
    return world[:3]


def project_voxels(world_xyz: jnp.ndarray, proj: jnp.ndarray,
                   im_hw: Tuple[int, int]) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Project world points into V views.

    Args:
      world_xyz: [N, 3] world coordinates (meters).
      proj: [V, 4, 4] world→pixel matrices (as from projection_matrices, one scale).
      im_hw: feature map (height, width) at this scale.
    Returns:
      (uv [V, N, 2] pixel coords, z [V, N] depths,
       mask [V, N] bool — in-bounds AND in front of camera).
    Matches reference models/occupancy_initialization.py:87-102: the in-bounds
    test uses normalized coords |2*u/(w-1) - 1| <= 1 i.e. 0 <= u <= w-1.
    """
    h, w = im_hw
    n = world_xyz.shape[0]
    pts = jnp.concatenate([world_xyz, jnp.ones((n, 1), world_xyz.dtype)], axis=1)  # [N,4]
    cam = jnp.einsum("vij,nj->vni", proj, pts)  # [V, N, 4]
    z = cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = cam[..., 0] / safe_z
    v = cam[..., 1] / safe_z
    inb = (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1) & (z > 0)
    return jnp.stack([u, v], axis=-1), z, inb
