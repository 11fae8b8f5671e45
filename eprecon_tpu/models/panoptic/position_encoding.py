"""Fourier positional encoding for voxel coordinates.

Reference: models/voxel_position_encoding.py:42-175 (fourier branch with
normalize=True, gauss_scale=1.0). The gaussian projection matrix is a fixed
non-trainable buffer (stored in the 'buffers' collection).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def shift_scale_points(xyz: jnp.ndarray, src_min: jnp.ndarray,
                       src_max: jnp.ndarray) -> jnp.ndarray:
    """Normalize points to [0, 1] within the src range
    (reference models/voxel_position_encoding.py:9-39)."""
    return (xyz - src_min) / (src_max - src_min)


class FourierPositionEncoding(nn.Module):
    """xyz [N, 3] → [N, d_pos] fourier features."""
    d_pos: int
    gauss_scale: float = 1.0

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, src_min: jnp.ndarray,
                 src_max: jnp.ndarray) -> jnp.ndarray:
        d_out = self.d_pos // 2
        gauss_b = self.variable(
            "buffers", "gauss_B",
            lambda: jax.random.normal(jax.random.PRNGKey(8712),
                                      (3, d_out)) * self.gauss_scale)
        p = shift_scale_points(xyz, src_min, src_max)
        p = p * (2.0 * np.pi)
        proj = p @ gauss_b.value  # [N, d_out]
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
