"""SPVCNN sparse 3D U-Net + SConv3d + ConvGRU on the static-shape engine.

TPU-native re-design of the reference's torchsparse modules
(reference: models/modules.py:75-175 SPVCNN, :178-197 SConv3d, :200-222
ConvGRU; torchsparse glue ops/torchsparse_utils.py:15-106).

Points live in the gravity-aligned camera frame (float coords, meters).
All index computation (voxelize, neighbor maps, parent maps, trilinear
links) is hoisted into a `SparsePlan` built once per point set and reused
by every conv layer — the JAX analogue of torchsparse's cached kmaps/cmaps.
Convs themselves are per-offset gather + MXU matmuls.

STATUS — research engine, NOT on the production path. The production model
(models/eprecon.py) uses the masked dense-window U-Net
(models/unet_dense.py): at fragment densities (10-60% of a 96^3 window)
HBM-table gathers (~65 ns/row) make this gather-based engine 100-1000x
slower on TPU (measured 8.3 s vs ~3 ms for the finest-stage U-Net —
PERF_NOTES.md). It is kept (a) as the oracle documenting torchsparse-exact
semantics (tests/test_spvcnn.py proves it equals the dense path on dense-
filled sets), and (b) as the starting point should scenes ever exceed the
dense global_extent HBM budget, where a sparse global map becomes the only
option. Do not wire it into the hot path without re-reading PERF_NOTES.
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from eprecon_tpu.models.blocks import MaskedBatchNorm
from eprecon_tpu.ops import sparse as sp

OFFSETS27 = sp.kernel_offsets(3)
OFFSETS8 = sp.kernel_offsets(2)


class LevelPlan(NamedTuple):
    grid: sp.HashedGrid          # voxel set at this level (coords in level units)
    nmap27: jnp.ndarray          # [K, 27] same-level neighbor rows
    down_nmap8: Optional[jnp.ndarray]   # [K, 8] rows in the *finer* level feeding
                                        # this level's stride-2 conv (None at L0)
    parent_of_fine: Optional[jnp.ndarray]  # [K] row in this level for each finer-level
                                           # voxel (for transposed conv), None at L0
    fine_mod2: Optional[jnp.ndarray]    # [K] kernel-offset index (0..7) of each
                                        # finer voxel w.r.t. its parent


class SparsePlan(NamedTuple):
    levels: Tuple[LevelPlan, ...]   # L0 (fine) → L2 (coarse)
    # trilinear devoxelize links per level: corner rows [K, 8] + weights [K, 8]
    devox_idx: Tuple[jnp.ndarray, ...]
    devox_w: Tuple[jnp.ndarray, ...]
    point_to_l0: jnp.ndarray        # [K] row of each point in L0 grid
    valid_points: jnp.ndarray       # [K] bool


def _devox_links(grid: sp.HashedGrid, points: sp.PointSet, res: float):
    p = points.xyz / res
    base = jnp.floor(p).astype(jnp.int32)
    frac = p - base.astype(p.dtype)
    corners = jnp.asarray(OFFSETS8, jnp.int32)
    cc = base[:, None, :] + corners[None, :, :]
    b = jnp.broadcast_to(points.batch[:, None, None], (*cc.shape[:2], 1))
    coords = jnp.concatenate([b, cc], axis=-1)
    idx = sp.lookup(grid, coords, points.valid)
    w = jnp.ones(idx.shape, p.dtype)
    for d in range(3):
        cd = corners[:, d].astype(p.dtype)
        w = w * (cd[None, :] * frac[:, d:d + 1] + (1 - cd[None, :]) * (1 - frac[:, d:d + 1]))
    w = jnp.where(idx >= 0, w, 0.0)
    return idx, w


DEFAULT_WINDOW = 192  # static L0 index-table span (aligned-camera voxel units)


def _level_window(w0: int, level: int) -> tuple:
    w = (w0 >> level) + 2
    return (w, w, w)


def build_plan(points: sp.PointSet, vres: float, num_levels: int = 3,
               window: int = DEFAULT_WINDOW) -> SparsePlan:
    """Construct all index structures for a 3-level U-Net over `points`.

    `window` is the static span of the L0 index table; it must cover the
    extent of the quantized point cloud (min-corner offset is dynamic).
    """
    grids: List[sp.HashedGrid] = []
    level_plans: List[LevelPlan] = []
    devox_idx, devox_w = [], []

    grid0, idx_q = sp.voxelize(points, vres, _level_window(window, 0))
    grids.append(grid0)
    prev = grid0
    down_maps, parents, mods = [None], [None], [None]
    for l in range(1, num_levels):
        coarse, parent = sp.downsample_coords(prev.voxels, _level_window(window, l))
        # stride-2 conv inputs: for coarse coord p, fine rows at 2p + r
        q = coarse.voxels.coords
        fine_base = jnp.concatenate([q[:, :1], q[:, 1:] * 2], axis=1)
        nb = fine_base[:, None, 1:] + jnp.asarray(OFFSETS8, jnp.int32)[None]
        bcol = jnp.broadcast_to(fine_base[:, None, :1], (*nb.shape[:2], 1))
        down8 = sp.lookup(prev, jnp.concatenate([bcol, nb], axis=-1),
                          coarse.voxels.valid)
        # transposed-conv links: fine voxel c → parent row + offset index c mod 2
        fc = prev.voxels.coords
        mod = jnp.where(prev.voxels.valid,
                        ((fc[:, 1] & 1) * 4 + (fc[:, 2] & 1) * 2 + (fc[:, 3] & 1)),
                        0).astype(jnp.int32)
        grids.append(coarse)
        down_maps.append(down8)
        parents.append(parent)
        mods.append(mod)
        prev = coarse

    for l, g in enumerate(grids):
        nmap27 = sp.neighbor_map(g, g.voxels.coords, g.voxels.valid, OFFSETS27)
        level_plans.append(LevelPlan(g, nmap27, down_maps[l], parents[l], mods[l]))
        di, dw = _devox_links(g, points, vres * (2 ** l))
        devox_idx.append(di)
        devox_w.append(dw)

    return SparsePlan(tuple(level_plans), tuple(devox_idx), tuple(devox_w),
                      idx_q, points.valid)


def devoxelize(plan: SparsePlan, level: int, voxel_feats: jnp.ndarray) -> jnp.ndarray:
    """Trilinear voxel→point (torchsparse voxel_to_point, nearest=False)."""
    idx, w = plan.devox_idx[level], plan.devox_w[level]
    gathered = sp.gather_rows(voxel_feats, idx)
    return jnp.einsum("ko,koc->kc", w, gathered)


def avg_to_voxels(plan: SparsePlan, level: int, point_feats: jnp.ndarray) -> jnp.ndarray:
    """Average point features into voxels (torchsparse point_to_voxel).

    torchsparse assigns each point to ONE voxel (its containing cell) at any
    stride; for level>0 the cell row comes from the parent chain.
    """
    idx = plan.point_to_l0
    for l in range(1, level + 1):
        idx = jnp.where(idx >= 0, plan.levels[l].parent_of_fine[jnp.maximum(idx, 0)], -1)
    k = plan.levels[level].grid.voxels.capacity
    seg = jnp.where((idx >= 0) & plan.valid_points, idx, k)
    sums = jax.ops.segment_sum(point_feats, seg, num_segments=k + 1)[:k]
    cnts = jax.ops.segment_sum(((idx >= 0) & plan.valid_points).astype(jnp.float32),
                               seg, num_segments=k + 1)[:k]
    out = sums / jnp.maximum(cnts[:, None], 1.0)
    return jnp.where(plan.levels[level].grid.voxels.valid[:, None], out, 0.0)


# ---------------------------------------------------------------------------
# Conv layers (flax) operating on plan levels
# ---------------------------------------------------------------------------

def _conv_init(key, shape, dtype=jnp.float32):
    """He-uniform over fan_in = O*Cin (matches torchsparse Conv3d init)."""
    fan_in = shape[0] * shape[1]
    bound = float(np.sqrt(1.0 / fan_in))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class SpConv(nn.Module):
    """Same-level sparse conv (ks=3, stride 1; coordinate-preserving)."""
    features: int

    @nn.compact
    def __call__(self, feats, plan: SparsePlan, level: int):
        w = self.param("kernel", _conv_init, (27, feats.shape[-1], self.features))
        lp = plan.levels[level]
        return sp.sparse_conv_apply(feats, lp.nmap27, w,
                                    out_valid=lp.grid.voxels.valid)


class SpConvDown(nn.Module):
    """Stride-2 downsampling conv (ks=2): fine level l → coarse level l+1."""
    features: int

    @nn.compact
    def __call__(self, fine_feats, plan: SparsePlan, coarse_level: int):
        w = self.param("kernel", _conv_init, (8, fine_feats.shape[-1], self.features))
        lp = plan.levels[coarse_level]
        return sp.sparse_conv_apply(fine_feats, lp.down_nmap8, w,
                                    out_valid=lp.grid.voxels.valid)


class SpConvUp(nn.Module):
    """Transposed stride-2 conv (ks=2): coarse level l → fine level l-1.

    Each fine voxel c has exactly one source: parent floor(c/2), with kernel
    slot r = c mod 2 (torchsparse transposed-conv kernel map inverted).
    """
    features: int

    @nn.compact
    def __call__(self, coarse_feats, plan: SparsePlan, coarse_level: int):
        w = self.param("kernel", _conv_init, (8, coarse_feats.shape[-1], self.features))
        lp = plan.levels[coarse_level]
        fine = plan.levels[coarse_level - 1]
        src = sp.gather_rows(coarse_feats, lp.parent_of_fine)  # [Kf, Cin]
        # one matmul per kernel slot, select by (c mod 2) index
        outs = jnp.stack([src @ w[r] for r in range(8)], axis=1)  # [Kf, 8, Cout]
        sel = jax.nn.one_hot(lp.fine_mod2, 8, dtype=outs.dtype)
        out = jnp.einsum("ko,koc->kc", sel, outs)
        return jnp.where(fine.grid.voxels.valid[:, None], out, 0.0)


class ConvBNReLU(nn.Module):
    features: int
    use_running_average: bool = False

    @nn.compact
    def __call__(self, feats, plan, level):
        h = SpConv(self.features)(feats, plan, level)
        h = MaskedBatchNorm(self.use_running_average)(
            h, plan.levels[level].grid.voxels.valid)
        return nn.relu(h)


class DownBNReLU(nn.Module):
    features: int
    use_running_average: bool = False

    @nn.compact
    def __call__(self, feats, plan, coarse_level):
        h = SpConvDown(self.features)(feats, plan, coarse_level)
        h = MaskedBatchNorm(self.use_running_average)(
            h, plan.levels[coarse_level].grid.voxels.valid)
        return nn.relu(h)


class UpBNReLU(nn.Module):
    features: int
    use_running_average: bool = False

    @nn.compact
    def __call__(self, feats, plan, coarse_level):
        h = SpConvUp(self.features)(feats, plan, coarse_level)
        h = MaskedBatchNorm(self.use_running_average)(
            h, plan.levels[coarse_level - 1].grid.voxels.valid)
        return nn.relu(h)


class SparseResidualBlock(nn.Module):
    """conv-BN-ReLU-conv-BN + (1x1-BN downsample if needed) + ReLU
    (reference models/modules.py:46-72)."""
    features: int
    use_running_average: bool = False

    @nn.compact
    def __call__(self, feats, plan, level):
        valid = plan.levels[level].grid.voxels.valid
        h = SpConv(self.features)(feats, plan, level)
        h = MaskedBatchNorm(self.use_running_average)(h, valid)
        h = nn.relu(h)
        h = SpConv(self.features)(h, plan, level)
        h = MaskedBatchNorm(self.use_running_average)(h, valid)
        if feats.shape[-1] == self.features:
            skip = feats
        else:
            skip = nn.Dense(self.features, use_bias=False)(feats)  # 1x1 conv
            skip = MaskedBatchNorm(self.use_running_average)(skip, valid)
        return nn.relu(h + skip)


class SPVCNN(nn.Module):
    """Sparse Point-Voxel U-Net (reference models/modules.py:75-175).

    Channel plan cs = [32, 64, 128, 96, 96] * cr. Input is a point set with
    a prebuilt SparsePlan; output is per-point features [K, cs[4]].
    """
    cr: float = 1.0
    dropout: bool = False
    use_running_average: bool = False

    @nn.compact
    def __call__(self, point_feats, plan: SparsePlan, *, train: bool = True):
        cs = [int(self.cr * x) for x in (32, 64, 128, 96, 96)]
        ura = self.use_running_average

        # stem at L0
        x0 = avg_to_voxels(plan, 0, point_feats)
        x0 = ConvBNReLU(cs[0], ura, name="stem")(x0, plan, 0)
        z0 = devoxelize(plan, 0, x0)

        # down path
        x1 = avg_to_voxels(plan, 0, z0)
        x1 = DownBNReLU(cs[0], ura)(x1, plan, 1)
        x1 = SparseResidualBlock(cs[1], ura)(x1, plan, 1)
        x1 = SparseResidualBlock(cs[1], ura)(x1, plan, 1)

        x2 = DownBNReLU(cs[1], ura)(x1, plan, 2)
        x2 = SparseResidualBlock(cs[2], ura)(x2, plan, 2)
        x2 = SparseResidualBlock(cs[2], ura)(x2, plan, 2)

        z1 = devoxelize(plan, 2, x2)
        pt0 = nn.Dense(cs[2])(z0)
        pt0 = MaskedBatchNorm(ura)(pt0, plan.valid_points)
        z1 = z1 + nn.relu(pt0)

        # up path
        y3 = avg_to_voxels(plan, 2, z1)
        if self.dropout and train:
            y3 = nn.Dropout(0.3, deterministic=False)(y3)
        y3 = UpBNReLU(cs[3], ura)(y3, plan, 2)
        y3 = jnp.concatenate([y3, x1], axis=-1)
        y3 = SparseResidualBlock(cs[3], ura)(y3, plan, 1)
        y3 = SparseResidualBlock(cs[3], ura)(y3, plan, 1)

        y4 = UpBNReLU(cs[4], ura)(y3, plan, 1)
        y4 = jnp.concatenate([y4, x0], axis=-1)
        y4 = SparseResidualBlock(cs[4], ura)(y4, plan, 0)
        y4 = SparseResidualBlock(cs[4], ura)(y4, plan, 0)

        z3 = devoxelize(plan, 0, y4)
        pt1 = nn.Dense(cs[4])(z1)
        pt1 = MaskedBatchNorm(ura)(pt1, plan.valid_points)
        z3 = z3 + nn.relu(pt1)
        return jnp.where(plan.valid_points[:, None], z3, 0.0)


class SConv3dPlan(NamedTuple):
    """Prebuilt index plan for SConv3d/ConvGRU over one point set."""
    grid: sp.HashedGrid
    nmap27: jnp.ndarray
    idx_query: jnp.ndarray
    devox_idx: jnp.ndarray
    devox_w: jnp.ndarray
    valid_points: jnp.ndarray


def build_sconv_plan(points: sp.PointSet, vres: float,
                     window: int = DEFAULT_WINDOW) -> SConv3dPlan:
    grid, idx_q = sp.voxelize(points, vres, (window, window, window))
    nmap = sp.neighbor_map(grid, grid.voxels.coords, grid.voxels.valid, OFFSETS27)
    di, dw = _devox_links(grid, points, vres)
    return SConv3dPlan(grid, nmap, idx_q, di, dw, points.valid)


class SConv3d(nn.Module):
    """voxelize → ks3 conv → trilinear devoxelize + linear point residual
    (reference models/modules.py:178-197)."""
    features: int

    @nn.compact
    def __call__(self, point_feats, plan: SConv3dPlan):
        k = plan.grid.voxels.capacity
        seg = jnp.where((plan.idx_query >= 0) & plan.valid_points, plan.idx_query, k)
        sums = jax.ops.segment_sum(point_feats, seg, num_segments=k + 1)[:k]
        cnts = jax.ops.segment_sum(
            ((plan.idx_query >= 0) & plan.valid_points).astype(jnp.float32),
            seg, num_segments=k + 1)[:k]
        vox = sums / jnp.maximum(cnts[:, None], 1.0)
        vox = jnp.where(plan.grid.voxels.valid[:, None], vox, 0.0)

        w = self.param("kernel", _conv_init, (27, point_feats.shape[-1], self.features))
        vox = sp.sparse_conv_apply(vox, plan.nmap27, w,
                                   out_valid=plan.grid.voxels.valid)
        gathered = sp.gather_rows(vox, plan.devox_idx)
        out = jnp.einsum("ko,koc->kc", plan.devox_w, gathered)
        out = out + nn.Dense(self.features)(point_feats)
        return jnp.where(plan.valid_points[:, None], out, 0.0)


class ConvGRU(nn.Module):
    """Sparse ConvGRU cell (reference models/modules.py:200-222)."""
    hidden_dim: int

    @nn.compact
    def __call__(self, h, x, plan: SConv3dPlan):
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(SConv3d(self.hidden_dim, name="convz")(hx, plan))
        r = jax.nn.sigmoid(SConv3d(self.hidden_dim, name="convr")(hx, plan))
        rx = jnp.concatenate([r * h, x], axis=-1)
        q = jnp.tanh(SConv3d(self.hidden_dim, name="convq")(rx, plan))
        return (1 - z) * h + z * q
