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
