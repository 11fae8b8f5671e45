"""Dense-window sparse-equivalent 3D U-Net + ConvGRU.

TPU-native replacement of the SPVCNN / SConv3d / ConvGRU stack
(reference models/modules.py:75-222) for the per-stage hot path.

Why dense: masked dense conv is mathematically identical to submanifold
sparse conv (zeros at inactive sites, outputs masked), and on TPU the active
sets are 10-60% of the fragment window — while HBM-table gathers cost
~65 ns/row, making gather-based sparse convs 100-1000x slower than XLA's
MXU-tiled dense convolutions at these densities (measured: 8.3 s vs ~3 ms
for the finest-stage U-Net).

Deviation from the reference (documented): the reference voxelizes the
active voxels as a point cloud in the gravity-aligned camera frame
(r_coords, neucon_network.py:386-398) before convolving. On the fragment
grid that frame rotation cannot be expressed as a dense stencil, so instead
the aligned-camera coordinates are injected as 3 extra input features —
the network keeps the gravity/viewpoint signal while the convs run on the
regular grid. The U-Net's point branch (voxel_to_point trilinear links,
modules.py:148-175) maps to identity at L0 and trilinear upsampling from
coarser levels.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from eprecon_tpu.models.dense3d import (ConvDown3dDense, ConvUp3dDense,
                                        DenseResidualBlock, MaskedBatchNorm3d,
                                        SubMConv3dDense, _mask3, maxpool3d,
                                        upsample_trilinear)


class DenseUNet(nn.Module):
    """3-level U-Net with SPVCNN's channel plan cs = [32,64,128,96,96] * cr."""
    cr: float = 1.0
    dropout: bool = False
    use_running_average: bool = False

    @nn.compact
    def __call__(self, feats: jnp.ndarray, mask: jnp.ndarray, *,
                 train: bool = True) -> jnp.ndarray:
        """feats: [X,Y,Z,C]; mask: [X,Y,Z]. Returns [X,Y,Z, cs4]."""
        cs = [int(self.cr * v) for v in (32, 64, 128, 96, 96)]
        ura = self.use_running_average
        bn = lambda name: MaskedBatchNorm3d(ura, name=name)

        # stem (modules.py:89-92)
        x0 = SubMConv3dDense(cs[0], 3, name="stem_conv")(feats, mask)
        x0 = bn("stem_bn")(x0, mask)
        x0 = _mask3(nn.relu(x0), mask)
        z0 = x0  # voxel_to_point at L0 == identity on the grid

        # down path (modules.py:94-104)
        x1, m1 = ConvDown3dDense(cs[0], name="down1")(z0, mask)
        x1 = bn("down1_bn")(x1, m1)
        x1 = _mask3(nn.relu(x1), m1)
        x1 = DenseResidualBlock(cs[1], ura, name="res1a")(x1, m1)
        x1 = DenseResidualBlock(cs[1], ura, name="res1b")(x1, m1)

        x2, m2 = ConvDown3dDense(cs[1], name="down2")(x1, m1)
        x2 = bn("down2_bn")(x2, m2)
        x2 = _mask3(nn.relu(x2), m2)
        x2 = DenseResidualBlock(cs[2], ura, name="res2a")(x2, m2)
        x2 = DenseResidualBlock(cs[2], ura, name="res2b")(x2, m2)

        # point branch 0 (modules.py:124-129,159-160): z1 = devox(x2) + lin(z0)
        z1 = upsample_trilinear(x2, 4)
        pt0 = nn.Dense(cs[2], name="point_transform0")(z0)
        pt0 = bn("pt0_bn")(pt0, mask)
        z1 = _mask3(z1 + nn.relu(pt0), mask)

        # up path (modules.py:106-122); y3 input re-voxelized from z1 at L2
        y3 = maxpool_mean(z1, 4, mask)
        if self.dropout and train:
            y3 = nn.Dropout(0.3, deterministic=False)(y3)
        y3 = ConvUp3dDense(cs[3], name="up1")(y3, m2, m1)
        y3 = bn("up1_bn")(y3, m1)
        y3 = _mask3(nn.relu(y3), m1)
        y3 = jnp.concatenate([y3, x1], axis=-1)
        y3 = DenseResidualBlock(cs[3], ura, name="res3a")(y3, m1)
        y3 = DenseResidualBlock(cs[3], ura, name="res3b")(y3, m1)

        y4 = ConvUp3dDense(cs[4], name="up2")(y3, m1, mask)
        y4 = bn("up2_bn")(y4, mask)
        y4 = _mask3(nn.relu(y4), mask)
        y4 = jnp.concatenate([y4, x0], axis=-1)
        y4 = DenseResidualBlock(cs[4], ura, name="res4a")(y4, mask)
        y4 = DenseResidualBlock(cs[4], ura, name="res4b")(y4, mask)

        # point branch 1: z3 = y4 + lin(z1)
        pt1 = nn.Dense(cs[4], name="point_transform1")(z1)
        pt1 = bn("pt1_bn")(pt1, mask)
        return _mask3(y4 + nn.relu(pt1), mask)


def maxpool_mean(vol: jnp.ndarray, factor: int, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean-pool by integer factor (point_to_voxel averaging on the
    grid, ops/torchsparse_utils.py:40-63 equivalent)."""
    x, y, z, c = vol.shape
    v = vol * mask[..., None]
    v = v.reshape(x // factor, factor, y // factor, factor, z // factor,
                  factor, c).sum(axis=(1, 3, 5))
    m = mask.reshape(x // factor, factor, y // factor, factor, z // factor,
                     factor).sum(axis=(1, 3, 5))
    return v / jnp.maximum(m[..., None], 1.0)


class DenseSConv3d(nn.Module):
    """Conv(ks3) + pointwise linear residual on a masked dense window
    (reference SConv3d, modules.py:178-197)."""
    features: int

    @nn.compact
    def __call__(self, x, mask):
        h = SubMConv3dDense(self.features, 3, name="conv")(x, mask)
        h = h + nn.Dense(self.features, name="point_transform")(x)
        return _mask3(h, mask)


class DenseConvGRU(nn.Module):
    """ConvGRU cell on dense windows (reference ConvGRU, modules.py:200-222).

    The z and r gates read the same input (hx), so their convs + pointwise
    residuals are fused into ONE conv of 2x output channels — mathematically
    identical to the reference's separate convz/convr (the converter
    concatenates their kernels along the output axis), and measured 18% (3.2
    ms at 96^3 ch24) faster on v5e: fewer kernel launches and one pass over
    the 128-lane-padded hx buffer instead of two.
    """
    hidden_dim: int

    @nn.compact
    def __call__(self, h, x, mask):
        hx = jnp.concatenate([h, x], axis=-1)
        zr = DenseSConv3d(2 * self.hidden_dim, name="convzr")(hx, mask)
        z = jax.nn.sigmoid(zr[..., :self.hidden_dim])
        r = jax.nn.sigmoid(zr[..., self.hidden_dim:])
        rx = jnp.concatenate([r * h, x], axis=-1)
        q = jnp.tanh(DenseSConv3d(self.hidden_dim, name="convq")(rx, mask))
        return _mask3((1 - z) * h + z * q, mask)
