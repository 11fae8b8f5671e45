"""Voxel grid coordinate helpers (reference: ops/generate_grids.py:3-10,
utils.py coordinates())."""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def generate_grid(n_vox: Sequence[int], interval: int) -> Tuple[jnp.ndarray, Tuple[int, int, int]]:
    """All voxel coordinates of an n_vox grid at the given interval.

    Returns (coords[3, N] float32 in x-major meshgrid 'ij' order, shape tuple),
    matching reference ops/generate_grids.py:3-10.
    """
    ranges = [np.arange(0, n_vox[a], interval) for a in range(3)]
    grid = np.stack(np.meshgrid(*ranges, indexing="ij"))  # [3, dx, dy, dz]
    shape = (len(ranges[0]), len(ranges[1]), len(ranges[2]))
    return jnp.asarray(grid.reshape(3, -1), dtype=jnp.float32), shape


def coordinates(voxel_dim: Sequence[int]) -> jnp.ndarray:
    """Dense integer coordinates [3, nx*ny*nz] (reference: utils.py:138-153)."""
    nx, ny, nz = voxel_dim
    x, y, z = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij")
    return jnp.asarray(np.stack([x.ravel(), y.ravel(), z.ravel()]), dtype=jnp.int32)


def dense_coords(shape: Sequence[int]) -> jnp.ndarray:
    """Dense integer coordinates [nx, ny, nz, 3]."""
    nx, ny, nz = shape
    x, y, z = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij")
    return jnp.asarray(np.stack([x, y, z], axis=-1), dtype=jnp.int32)


def scene_global_origin(global_extent: Sequence[int], n_vox: Sequence[int],
                        n_scales: int, voxel_size: float,
                        vol_origin: np.ndarray,
                        desired_margin: int = 32) -> np.ndarray:
    """World origin of a scene's dense global volume.

    Sits a margin below the scene origin so early fragments snapped slightly
    outside the frustum bounds still index non-negatively — but the margin is
    capped per axis by the slack the global volume actually has
    (extent - window): a larger margin would push `rel_origin` past the
    dynamic-slice clamp, silently relocating fragment content (reconstruction
    shifted by exactly the margin — the bug the cap fixes). Snapped to the
    coarsest-level grid so every pyramid level's rel_origin is integral.
    """
    snap_units = 2 ** n_scales
    desired = desired_margin
    slack = np.maximum(np.asarray(global_extent) - np.asarray(n_vox), 0)
    # never spend more than half the slack below the origin — fragments sit
    # mostly ABOVE vol_origin, and a margin that eats the full slack forces
    # the clamp to shift their windows (content skew) on small volumes
    margin_units = np.minimum(desired, slack // 2)
    margin_units = margin_units // snap_units * snap_units
    origin = np.asarray(vol_origin, np.float32) - margin_units * voxel_size
    snap = voxel_size * snap_units
    # floor, not round: when slack caps the margin to 0, rounding could snap
    # the origin up to snap/2 ABOVE vol_origin, making early fragments'
    # rel_origin negative (the clamp-shift bug class this helper fixes)
    return (np.floor(origin / snap + 1e-4) * snap).astype(np.float32)


def anchored_global_origin(anchor: np.ndarray, n_scales: int,
                           voxel_size: float, margin: int) -> np.ndarray:
    """World origin of a scene's dense global volume from a window-union
    anchor (the per-(scene, epoch) minimum fragment-window origin the dataset
    predicts — data/scannet.py scene_anchor).

    Unlike scene_global_origin (vol_origin anchoring, absolute-grid snap),
    the anchor is already snapped to the coarsest window grid IN ITS OWN
    FRAME, and every fragment window origin differs from it by a multiple of
    2**n_scales voxels — so subtracting a snapped margin keeps every level's
    rel_origin exactly integral without flooring to an absolute grid (which
    would introduce a sub-voxel phase between the global volume and the
    windows)."""
    snap_units = 2 ** n_scales
    margin_units = int(margin) // snap_units * snap_units
    return (np.asarray(anchor, np.float32)
            - np.float32(margin_units * voxel_size))
