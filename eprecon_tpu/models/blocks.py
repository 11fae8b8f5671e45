"""Shared neural building blocks (flax.linen, NHWC).

TPU-native counterparts of the reference's 2D conv blocks and MLP heads
(reference: models/modules.py:273-482). Sparse-set norms are masked so that
capacity padding never leaks into statistics.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class Conv2dBlock(nn.Module):
    """Conv + BN + ReLU (reference models/modules.py:372-382). bf16 compute."""
    features: int
    kernel: int
    use_running_average: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel), padding="SAME",
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=self.use_running_average,
                         dtype=self.dtype)(x)
        return nn.relu(x)


class Conv2dResidualBlock(nn.Module):
    """Conv + ReLU + residual + BN (reference models/modules.py:385-399)."""
    kernel: int
    use_running_average: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(x.shape[-1], (self.kernel, self.kernel), padding="SAME",
                      dtype=self.dtype)(x)
        out = nn.relu(out)
        out = out + x
        return nn.BatchNorm(use_running_average=self.use_running_average,
                            dtype=self.dtype)(out)


class ELAN2D(nn.Module):
    """ELAN aggregation (reference models/modules.py:340-370)."""
    dim: int
    use_running_average: bool = False

    @nn.compact
    def __call__(self, x):
        ura = self.use_running_average
        f = Conv2dBlock(self.dim, 1, ura)(x)
        f2 = Conv2dBlock(self.dim, 1, ura)(x)
        f = jnp.concatenate([f, f2], axis=-1)
        f2 = Conv2dBlock(self.dim // 2, 3, ura)(f2)
        f = jnp.concatenate([f, f2], axis=-1)
        f2 = Conv2dBlock(self.dim // 2, 3, ura)(f2)
        f = jnp.concatenate([f, f2], axis=-1)
        f2 = Conv2dBlock(self.dim // 2, 3, ura)(f2)
        f = jnp.concatenate([f, f2], axis=-1)
        f2 = Conv2dBlock(self.dim // 2, 3, ura)(f2)
        f = jnp.concatenate([f, f2], axis=-1)
        return Conv2dBlock(self.dim, 1, ura)(f)


class FusionBlock(nn.Module):
    """conv3+BN+ReLU → conv1+BN+ReLU → ELAN (reference models/modules.py:313-338)."""
    use_running_average: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        out = nn.Conv(c, (3, 3), padding="SAME", dtype=jnp.bfloat16)(x)
        out = nn.BatchNorm(use_running_average=self.use_running_average,
                           dtype=jnp.bfloat16)(out)
        out = nn.relu(out)
        out = nn.Conv(c, (1, 1), dtype=jnp.bfloat16)(out)
        out = nn.BatchNorm(use_running_average=self.use_running_average,
                           dtype=jnp.bfloat16)(out)
        out = nn.relu(out)
        return ELAN2D(c, self.use_running_average)(out)


class Linear4xTrans(nn.Module):
    """4x bottleneck MLP head with LN + optional residual
    (reference models/modules.py:273-311). Used for tsdf/occ/panoptic heads.

    dtype=bfloat16 at the hot call sites (96^3-window heads) halves HBM
    traffic of the 4x-wide intermediates; LN statistics still accumulate in
    f32 (flax promotes). Default None keeps exact f32 for oracle tests.
    """
    features_out: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        out = nn.Dense(c_in * 4, dtype=self.dtype,
                       kernel_init=nn.initializers.xavier_uniform())(x)
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(out)
        out = nn.relu(out)
        out = nn.Dense(c_in, dtype=self.dtype,
                       kernel_init=nn.initializers.xavier_uniform())(out)
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(out)
        out = nn.relu(out)
        out2 = nn.Dense(self.features_out, dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform())(out)
        if c_in == self.features_out:
            out2 = out2 + out
        return out2


class LinearResidual(nn.Module):
    """Dense + ReLU + residual + LN (reference models/modules.py:454-467)."""
    @nn.compact
    def __call__(self, x):
        out = nn.Dense(x.shape[-1])(x)
        out = nn.relu(out)
        return nn.LayerNorm(epsilon=1e-5)(x + out)


class MLP(nn.Module):
    """Plain relu MLP (reference models/mask3dformer.py:187-199)."""
    hidden_dim: int
    output_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim)(x))
        return nn.Dense(self.output_dim)(x)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the valid rows of a [K, C] sparse feature set.

    Equivalent of nn.BatchNorm1d applied to active voxels only (the reference
    applies torch BatchNorm1d to dynamically-sized sparse tensors, e.g.
    models/occupancy_initialization.py:29,37). Running stats are kept in the
    'batch_stats' collection.
    """
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(c))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(c))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            w = valid.astype(x.dtype)[:, None]
            n = jnp.maximum(jnp.sum(w), 1.0)
            mean = jnp.sum(x * w, axis=0) / n
            var = jnp.sum(w * (x - mean) ** 2, axis=0) / n
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        y = (x - mean) / jnp.sqrt(var + self.epsilon) * scale + bias
        return jnp.where(valid[:, None], y, 0.0)
