"""Dense-window equivalents of submanifold sparse 3D convolutions.

A submanifold sparse conv (spconv SubMConv3d, reference models/modules.py:
249-271) computes, at each *active* site p, sum_k W_k · x[p+k] where x is
zero at inactive sites. That is mathematically identical to a dense 3D conv
over a volume whose inactive voxels are zeroed, with outputs read at active
sites only. On TPU the dense form is the fast path: regular, static, and
tiled onto the MXU by XLA — no gather/scatter at all. These modules keep an
explicit active mask and re-zero after every conv so the equivalence is
exact layer after layer.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _mask3(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return x * mask[..., None].astype(x.dtype)


class ShiftedConv3d(nn.Module):
    """3D conv decomposed into 3 shifted 2D convs (batch = the x axis).

    Same math and parameter layout as nn.Conv with a [3,3,3,Cin,Cout] kernel,
    but ~2.1x faster on v5e at 96^3 with small channel counts (measured
    2.21 ms vs 4.58 ms at 24→24ch): XLA's 2D conv path with a 96-deep batch
    tiles the MXU far better than its 3D path at these shapes.
    Input [B, X, Y, Z, Cin] → output [B, X, Y, Z, Cout].
    """
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                            (3, 3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        b, gx, gy, gz, _ = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        xd = xp.astype(self.dtype)
        kd = kernel.astype(self.dtype)
        total = None
        for dx in range(3):
            tap = xd[:, dx:dx + gx].reshape(b * gx, gy, gz, cin)
            y = jax.lax.conv_general_dilated(
                tap, kd[dx], (1, 1), "SAME",
                dimension_numbers=("NXYC", "XYIO", "NXYC"))
            total = y if total is None else total + y
        total = total + bias.astype(self.dtype)
        return total.reshape(b, gx, gy, gz, self.features)


class SubMConv3dDense(nn.Module):
    """Masked dense 3D conv == spconv SubMConv3d on the active set.

    x: [X, Y, Z, Cin] (or batched [..., X, Y, Z, Cin]); mask: [X, Y, Z] bool.
    Xavier-uniform weights + zero bias (reference models/modules.py:256-258).
    Computes in bf16 (params stay f32) — the MXU fast path. ks=3 runs the
    shifted-2D decomposition (see ShiftedConv3d); the parameter tree is
    identical to nn.Conv ('Conv_0/{kernel, bias}').
    """
    features: int
    kernel: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask):
        x = _mask3(x, mask)
        batched = x.ndim == 5
        if not batched:
            x = x[None]
        if self.kernel == 3:
            y = ShiftedConv3d(self.features, self.dtype, name="Conv_0")(x)
        else:
            y = nn.Conv(self.features, (self.kernel,) * 3, padding="SAME",
                        dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name="Conv_0")(x)
        if not batched:
            y = y[0]
        return _mask3(y, mask)


class MaskedLayerNorm3d(nn.Module):
    """Per-voxel LayerNorm applied at active sites (LN is pointwise over
    channels, so masking is only needed to keep inactive sites at zero)."""
    @nn.compact
    def __call__(self, x, mask):
        return _mask3(nn.LayerNorm(epsilon=1e-5)(x), mask)


class MaskedBatchNorm3d(nn.Module):
    """BatchNorm over active voxels of a dense volume (== torch BatchNorm1d
    over the sparse active set)."""
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(c))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(c))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            x32 = x.astype(jnp.float32)
            w = mask.astype(jnp.float32)[..., None]
            n = jnp.maximum(jnp.sum(w), 1.0)
            mean = jnp.sum(x32 * w, axis=tuple(range(x.ndim - 1))) / n
            var = jnp.sum(w * (x32 - mean) ** 2, axis=tuple(range(x.ndim - 1))) / n
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        y = (x - mean.astype(x.dtype)) * (
            jax.lax.rsqrt(var + self.epsilon).astype(x.dtype)) * scale.astype(x.dtype) \
            + bias.astype(x.dtype)
        return _mask3(y, mask)


class SubMConv3dBlockDense(nn.Module):
    """SubM conv + LayerNorm + ReLU (reference models/modules.py:440-452)."""
    features: int
    kernel: int

    @nn.compact
    def __call__(self, x, mask):
        x = SubMConv3dDense(self.features, self.kernel)(x, mask)
        x = nn.LayerNorm(epsilon=1e-5)(x)
        return _mask3(nn.relu(x), mask)


class Sparse3dELANDense(nn.Module):
    """Sparse ELAN aggregation on the dense window
    (reference models/modules.py:401-438 Spares3dELAN)."""
    dim: int

    @nn.compact
    def __call__(self, x, mask):
        f1 = SubMConv3dBlockDense(self.dim, 1)(x, mask)
        f2 = SubMConv3dBlockDense(self.dim, 1)(x, mask)
        agg = jnp.concatenate([f1, f2], axis=-1)
        f2 = SubMConv3dBlockDense(self.dim // 2, 3)(f2, mask)
        agg = jnp.concatenate([agg, f2], axis=-1)
        f2 = SubMConv3dBlockDense(self.dim // 2, 3)(f2, mask)
        agg = jnp.concatenate([agg, f2], axis=-1)
        f2 = SubMConv3dBlockDense(self.dim // 2, 3)(f2, mask)
        agg = jnp.concatenate([agg, f2], axis=-1)
        f2 = SubMConv3dBlockDense(self.dim // 2, 3)(f2, mask)
        agg = jnp.concatenate([agg, f2], axis=-1)
        return SubMConv3dBlockDense(self.dim, 1)(agg, mask)


def _box_count(mask: jnp.ndarray, k: int) -> jnp.ndarray:
    """Count of True cells in each kxkxk window (SAME padding)."""
    import jax.lax as lax

    x = mask.astype(jnp.float32)[None, None]  # NCXYZ
    w = jnp.ones((1, 1, k, k, k), jnp.float32)
    y = lax.conv_general_dilated(x, w, window_strides=(1, 1, 1),
                                 padding="SAME")
    return y[0, 0]


def erode(mask: jnp.ndarray, kernel_size: int = 3) -> jnp.ndarray:
    """Binary erosion via conv (reference models/neucon_network.py:216-221)."""
    return _box_count(mask, kernel_size) == float(kernel_size ** 3)


def dilate(mask: jnp.ndarray, kernel_size: int = 3) -> jnp.ndarray:
    """Binary dilation via conv (reference models/neucon_network.py:223-228)."""
    return _box_count(mask, kernel_size) >= 1.0


def maxpool3d(mask_or_vol: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Max-pool a [X,Y,Z] volume by integer factor (occupancy downsampling,
    reference models/neucon_network.py:306,334)."""
    x, y, z = mask_or_vol.shape
    v = mask_or_vol.reshape(x // factor, factor, y // factor, factor,
                            z // factor, factor)
    return v.max(axis=(1, 3, 5))


def upsample_nearest2(vol: jnp.ndarray) -> jnp.ndarray:
    """[X,Y,Z,C] → [2X,2Y,2Z,C] nearest (sparse x8 upsample equivalent,
    reference neucon_network.py:193-214)."""
    x, y, z, c = vol.shape
    v = jnp.broadcast_to(vol[:, None, :, None, :, None, :],
                         (x, 2, y, 2, z, 2, c))
    return v.reshape(2 * x, 2 * y, 2 * z, c)


def upsample_trilinear(vol: jnp.ndarray, factor: int) -> jnp.ndarray:
    """[X,Y,Z,C] corner-aligned trilinear upsample == torchsparse
    devoxelize (calc_ti_weights, reference ops/torchsparse_utils.py:68-106).

    Fine voxel c interpolates the coarse corners floor(c/f) and floor(c/f)+1
    with weights (1-frac, frac), frac = (c mod f)/f; corners past the top
    edge contribute ZERO (torchsparse missing-voxel semantics — weights are
    not renormalized). NB jax.image.resize('trilinear') is half-pixel-center
    aligned and does NOT match (it samples at c/f - (f-1)/(2f), a systematic
    sub-voxel shift that breaks reference-checkpoint parity).
    """
    def up_axis(v: jnp.ndarray, axis: int) -> jnp.ndarray:
        n = v.shape[axis]
        # v[l+1] with a zero slab past the top edge
        pad = [(0, 0)] * v.ndim
        pad[axis] = (0, 1)
        nxt = jax.lax.slice_in_dim(jnp.pad(v, pad), 1, n + 1, axis=axis)
        a = jnp.repeat(v, factor, axis=axis)
        b = jnp.repeat(nxt, factor, axis=axis)
        frac = (jnp.arange(n * factor) % factor) / factor
        shape = [1] * v.ndim
        shape[axis] = n * factor
        frac = frac.reshape(shape).astype(v.dtype)
        return a * (1 - frac) + b * frac

    for ax in range(3):
        vol = up_axis(vol, ax)
    return vol


class ConvDown3dDense(nn.Module):
    """ks=2 stride-2 conv on a masked dense volume (torchsparse stride-2
    Conv3d equivalent: output mask = any-active in each 2^3 cell)."""
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask):
        x = _mask3(x, mask)
        y = nn.Conv(self.features, (2, 2, 2), strides=2, padding="VALID",
                    dtype=self.dtype, use_bias=False)(x[None])[0]
        out_mask = maxpool3d(mask, 2)
        return _mask3(y, out_mask), out_mask


class ConvUp3dDense(nn.Module):
    """ks=2 stride-2 transposed conv (torchsparse transposed Conv3d:
    outputs restricted to the cached finer coordinate set = fine mask)."""
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, coarse_mask, fine_mask):
        x = _mask3(x, coarse_mask)
        y = nn.ConvTranspose(self.features, (2, 2, 2), strides=(2, 2, 2),
                             dtype=self.dtype, use_bias=False)(x[None])[0]
        return _mask3(y, fine_mask)


class MaskedBNReLU(nn.Module):
    use_running_average: bool = False

    @nn.compact
    def __call__(self, x, mask):
        x = MaskedBatchNorm3d(self.use_running_average)(x, mask)
        return _mask3(nn.relu(x), mask)


class DenseResidualBlock(nn.Module):
    """conv-BN-ReLU-conv-BN + (1x1-BN skip) + ReLU on a masked dense volume
    (reference models/modules.py:46-72 ResidualBlock)."""
    features: int
    use_running_average: bool = False

    @nn.compact
    def __call__(self, x, mask):
        h = SubMConv3dDense(self.features, 3)(x, mask)
        h = MaskedBatchNorm3d(self.use_running_average)(h, mask)
        h = nn.relu(h)
        h = SubMConv3dDense(self.features, 3)(h, mask)
        h = MaskedBatchNorm3d(self.use_running_average)(h, mask)
        if x.shape[-1] == self.features:
            skip = x
        else:
            skip = nn.Dense(self.features, use_bias=False)(x)
            skip = MaskedBatchNorm3d(self.use_running_average)(skip, mask)
        return _mask3(nn.relu(h + skip), mask)
