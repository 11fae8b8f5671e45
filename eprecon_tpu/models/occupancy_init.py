"""Occupancy initialization — EPRecon's cheap depth prior.

TPU-native re-design of reference models/occupancy_initialization.py:11-182.
The reference filters the 48^3 grid to >=2-view voxels and runs spconv
submanifold convs on the dynamic sparse set. Here the whole stage runs
*dense* over the 48^3 window — submanifold conv == masked dense conv (see
models/dense3d.py) — which is exact, static-shaped and MXU-friendly
(48^3 x 32ch is ~7 GFLOP of conv work).

Per view: fuse the 3 FPN scales into a 32ch matching feature map; project
every voxel into every view; cross-view feature variance is the matching
cost; a sparse-ELAN + 4 residual subM conv stack predicts per-voxel
occupancy logits.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from eprecon_tpu.models.blocks import Conv2dBlock, Conv2dResidualBlock, FusionBlock
from eprecon_tpu.models.dense3d import (MaskedBatchNorm3d, MaskedLayerNorm3d,
                                        Sparse3dELANDense, SubMConv3dDense, _mask3)
from eprecon_tpu.ops.back_project import back_project_variance
from eprecon_tpu.ops.grid import dense_coords


class InitFeatureFusion(nn.Module):
    """Per-view multi-scale fusion to the matching feature map at 1/8 res
    (reference models/occupancy_initialization.py:41-58 feat_fusion_pre)."""
    ch_down: int = 32
    use_running_average: bool = False

    @nn.compact
    def __call__(self, feats_1x, feats_2x, feats_4x):
        """feats_kx: [V, H/k', W/k', C] — 1x = coarsest (1/16), 4x = finest
        (1/4), mirroring the reference's naming where feat[2] is coarsest."""
        ura = self.use_running_average
        f1 = FusionBlock(ura)(feats_1x)
        f2 = FusionBlock(ura)(feats_2x)
        f4 = FusionBlock(ura)(feats_4x)
        # coarsest upsampled x2 (bilinear), finest avg-pooled x2 → all at 1/8
        v, h, w, c = f1.shape
        f1 = jax.image.resize(f1, (v, h * 2, w * 2, c), "bilinear")
        f4 = nn.avg_pool(f4, (2, 2), strides=(2, 2))
        fused = jnp.concatenate([f1, f2, f4], axis=-1)
        fused = Conv2dBlock(self.ch_down, 1, ura)(fused)
        for _ in range(4):
            fused = Conv2dResidualBlock(3, ura)(fused)
        return fused


class OccupancyInitialization(nn.Module):
    """Predict per-voxel occupancy logits over the dense init grid.

    Forward over a 48^3 grid at init_stage=1 (interval 2 of the 96^3 fragment),
    reference models/neucon_network.py:239-262 call site.
    """
    ch_down: int = 32
    use_running_average: bool = False
    bp_backward: str = "scatter"  # see config.ModelConfig.bp_backward

    @nn.compact
    def __call__(self, features_pyramid, origin, voxel_size: float, proj,
                 grid_shape: Tuple[int, int, int], interval: int,
                 min_view_number: int = 2):
        """
        Args:
          features_pyramid: list of 3 [V, B, H, W, C] arrays, fine→coarse
            (1/4: 24ch, 1/8: 40ch, 1/16: 80ch).
          origin: [B, 3] fragment world origin.
          proj: [V, B, 4, 4] world→pixel at the init scale (1/8 feature res).
          grid_shape: init grid dims, e.g. (48, 48, 48).
          interval: voxel stride of the init grid in fine-voxel units (2).
        Returns:
          occ_logits [B, X, Y, Z] float, valid mask [B, X, Y, Z]
          (count >= min_view_number), count [B, X, Y, Z].
        """
        f_fine, f_mid, f_coarse = features_pyramid
        v, bs = f_mid.shape[:2]
        gx, gy, gz = grid_shape

        # per-view fused matching features (params shared across batch)
        fused = []
        fusion = InitFeatureFusion(self.ch_down, self.use_running_average)
        for b in range(bs):
            fused.append(fusion(f_coarse[:, b], f_mid[:, b], f_fine[:, b]))
        fused = jnp.stack(fused, axis=1)  # [V, B, h, w, ch_down]

        # dense grid coords per batch: [B*N, 4]
        coords3 = dense_coords(grid_shape).reshape(-1, 3) * interval
        n = coords3.shape[0]
        coords = jnp.concatenate([
            jnp.repeat(jnp.arange(bs, dtype=jnp.int32), n)[:, None],
            jnp.tile(coords3, (bs, 1)),
        ], axis=1)  # [B*N, 4]
        valid_all = jnp.ones(bs * n, bool)

        var, count = back_project_variance(coords, valid_all, origin, voxel_size,
                                           fused, proj,
                                           self.bp_backward)  # [B*N,C],[B*N]
        count_vol = count.reshape(bs, gx, gy, gz)
        mask = count_vol >= min_view_number
        var_vol = var.reshape(bs, gx, gy, gz, self.ch_down)

        # reference: norm0 BatchNorm1d → ELAN → 4 residual subM conv blocks
        h = MaskedBatchNorm3d(self.use_running_average, name="norm0")(var_vol, mask)
        h = Sparse3dELANDense(self.ch_down)(h, mask)
        for i in range(3):
            r = SubMConv3dDense(self.ch_down, 3, name=f"subm{i+1}")(h, mask)
            r = nn.relu(r)
            r = r + h
            h = MaskedLayerNorm3d(name=f"norm{i+1}")(r, mask)
        out = SubMConv3dDense(1, 3, name="subm4")(h, mask)
        out = MaskedBatchNorm3d(self.use_running_average, name="norm4")(out, mask)
        return out[..., 0], mask, count_vol
