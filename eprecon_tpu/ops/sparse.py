"""Static-shape sparse voxel engine for TPU.

TPU-native replacement for the reference's CUDA sparse libraries
(torchsparse hashing/voxelize/devoxelize: ops/torchsparse_utils.py:15-106;
spconv submanifold convs: models/modules.py:249-271). Everything here is
jit-safe with capacity-padded static shapes:

  * a voxel set is `SparseVoxels(coords int32[K,4], feats f32[K,C], valid bool[K])`
  * coordinate lookup is O(1): row indices are scattered into a dense int32
    *index volume* over a static window (dynamic min-corner offset); a query
    is a single gather. (jnp.searchsorted lowers to a serial binary-search
    while-loop on TPU — ~450 ms for 131k x 27 queries — so sort-based
    lookup is a non-starter; windows are small: fragment grids <= 96^3,
    aligned-camera point grids <= 192^3 = 28 MB of int32.)
  * sparse 3D conv = per-offset neighbor gather → matmul → accumulate
    (27 small GEMMs that XLA tiles onto the MXU)
  * point↔voxel (de)voxelization = sort-based unique + table lookups +
    trilinear weights

Filtering never changes shapes: it flips `valid` flags; `compact` re-packs a
mask into the leading slots when a fresh capacity is needed.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np



class SparseVoxels(NamedTuple):
    coords: jnp.ndarray  # int32 [K, 4] — (b, x, y, z)
    feats: jnp.ndarray   # float [K, C]
    valid: jnp.ndarray   # bool [K]

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]

    @property
    def channels(self) -> int:
        return self.feats.shape[-1]

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))


class HashedGrid(NamedTuple):
    """SparseVoxels + dense O(1)-lookup index volume.

    table: int32 [B, Wx, Wy, Wz] holding the row index of the voxel at
    (b, offset + (x,y,z)), or -1. The window shape is static (table shape);
    the min-corner `offset` is dynamic.
    """
    voxels: SparseVoxels
    table: jnp.ndarray
    offset: jnp.ndarray  # int32 [3]


def build_hash(sv: SparseVoxels, window: Tuple[int, int, int],
               offset: Optional[jnp.ndarray] = None,
               n_batch: int = 1) -> HashedGrid:
    """Build the dense index table for a voxel set.

    window: static (Wx, Wy, Wz); offset: [3] min corner (default: per-axis
    min over valid coords). Rows outside the window are simply not indexed
    (lookups for them miss) — choose the window to cover the live set.
    """
    if offset is None:
        big = jnp.int32(2**30)
        offset = jnp.min(jnp.where(sv.valid[:, None], sv.coords[:, 1:], big),
                         axis=0)
        offset = jnp.where(offset == big, 0, offset)
    w = sv.coords[:, 1:] - offset[None, :]
    wdim = jnp.asarray(window, jnp.int32)
    inb = sv.valid & ((w >= 0) & (w < wdim[None, :])).all(axis=1)
    b = jnp.clip(sv.coords[:, 0], 0, n_batch - 1)
    lin = ((b * window[0] + w[:, 0]) * window[1] + w[:, 1]) * window[2] + w[:, 2]
    size = n_batch * window[0] * window[1] * window[2]
    lin = jnp.where(inb, lin, size)
    rows = jnp.arange(sv.capacity, dtype=jnp.int32)
    table = jnp.full(size + 1, -1, jnp.int32)
    table = table.at[lin].set(jnp.where(inb, rows, -1))
    table = table[:-1].reshape(n_batch, *window)
    return HashedGrid(sv, table, offset)


def lookup(grid: HashedGrid, query_coords: jnp.ndarray,
           query_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Row index of each query coord in the grid; -1 if absent.

    query_coords: int32 [..., 4]. O(1) per query (one gather).
    Equivalent of torchsparse sphashquery (ops/torchsparse_utils.py:21).
    """
    nb, wx, wy, wz = grid.table.shape
    flat = query_coords.reshape(-1, 4)
    w = flat[:, 1:] - grid.offset[None, :]
    b = flat[:, 0]
    inb = ((w[:, 0] >= 0) & (w[:, 0] < wx) & (w[:, 1] >= 0) & (w[:, 1] < wy)
           & (w[:, 2] >= 0) & (w[:, 2] < wz) & (b >= 0) & (b < nb))
    if query_valid is not None:
        qv = jnp.broadcast_to(
            query_valid.reshape(query_valid.shape + (1,) * (query_coords.ndim - 1 - query_valid.ndim)),
            query_coords.shape[:-1]).reshape(-1)
        inb = inb & qv
    bi = jnp.clip(b, 0, nb - 1)
    wxi = jnp.clip(w[:, 0], 0, wx - 1)
    wyi = jnp.clip(w[:, 1], 0, wy - 1)
    wzi = jnp.clip(w[:, 2], 0, wz - 1)
    rows = grid.table[bi, wxi, wyi, wzi]
    idx = jnp.where(inb, rows, -1)
    return idx.reshape(query_coords.shape[:-1])


def gather_rows(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feats[idx] with idx==-1 → zeros. idx: [...], feats: [K, C] → [..., C]."""
    safe = jnp.maximum(idx, 0)
    out = feats[safe]
    return jnp.where((idx >= 0)[..., None], out, 0.0)


def kernel_offsets(ks: int, dims: int = 3) -> np.ndarray:
    """Integer kernel offsets in torchsparse order.

    ks=3 → 27 offsets in {-1,0,1}^3; ks=2 → 8 offsets in {0,1}^3
    (matching torchsparse get_kernel_offsets conventions for odd/even kernels).
    """
    if ks % 2 == 1:
        r = np.arange(-(ks // 2), ks // 2 + 1)
    else:
        r = np.arange(0, ks)
    grids = np.meshgrid(*([r] * dims), indexing="ij")
    return np.stack([g.ravel() for g in grids], axis=1).astype(np.int32)  # [ks^3, 3]


def neighbor_map(grid: HashedGrid, query_coords: jnp.ndarray,
                 query_valid: jnp.ndarray, offsets: np.ndarray) -> jnp.ndarray:
    """For each query coord and kernel offset, row index in grid (-1 absent).

    Returns int32 [K, n_offsets]. Built once per (coords, kernel) pair and
    reused across conv layers (equivalent of torchsparse kmap caching).
    """
    off = jnp.asarray(offsets, jnp.int32)  # [O, 3]
    nb = query_coords[:, None, 1:] + off[None, :, :]  # [K, O, 3]
    b = jnp.broadcast_to(query_coords[:, None, :1], (*nb.shape[:2], 1))
    nb_coords = jnp.concatenate([b, nb], axis=-1)  # [K, O, 4]
    return lookup(grid, nb_coords, query_valid)


def sparse_conv_apply(feats: jnp.ndarray, nmap: jnp.ndarray,
                      weights: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
                      out_valid: Optional[jnp.ndarray] = None,
                      group: int = 9) -> jnp.ndarray:
    """Gather-GEMM-accumulate sparse convolution.

    feats: [K, Cin] source features; nmap: int32 [K_out, O] neighbor rows;
    weights: [O, Cin, Cout]. Returns [K_out, Cout].
    Kernel offsets are processed in groups: one gather [K, G, Cin] + one
    [K, G*Cin] x [G*Cin, Cout] MXU matmul per group. Grouping keeps the HLO
    count low (compile time) and the matmuls large, while bounding the
    gathered transient to K * G * Cin.
    """
    n_off = nmap.shape[1]
    cin = feats.shape[-1]
    cout = weights.shape[-1]
    k = nmap.shape[0]
    out = None
    for o0 in range(0, n_off, group):
        o1 = min(o0 + group, n_off)
        g = gather_rows(feats, nmap[:, o0:o1])          # [K, G, Cin]
        w = weights[o0:o1].reshape((o1 - o0) * cin, cout)
        term = jnp.dot(g.reshape(k, (o1 - o0) * cin), w,
                       preferred_element_type=jnp.float32)
        out = term if out is None else out + term
    if bias is not None:
        out = out + bias
    if out_valid is not None:
        out = jnp.where(out_valid[:, None], out, 0.0)
    return out


# ---------------------------------------------------------------------------
# Point ↔ voxel (torchsparse ops/torchsparse_utils.py equivalents)
# ---------------------------------------------------------------------------

class PointSet(NamedTuple):
    """Point cloud with float coords (x, y, z) + integer batch index."""
    xyz: jnp.ndarray    # float32 [K, 3]
    batch: jnp.ndarray  # int32 [K]
    feats: jnp.ndarray  # float [K, C]
    valid: jnp.ndarray  # bool [K]


def _unique_coords(coords: jnp.ndarray, valid: jnp.ndarray, window,
                   n_batch: int = 1):
    """Deduplicate [K, 4] coords into leading slots using the index table.

    Each distinct coord gets exactly one representative row (the one the
    scatter kept); slots are compacted in representative-row order.
    Returns (unique SparseVoxels (zero-channel feats), rep_row_of_slot [K],
    slot_of_row [K] mapping every input row to its unique slot, -1 invalid).
    """
    k = coords.shape[0]
    tmp = build_hash(SparseVoxels(coords, jnp.zeros((k, 0)), valid),
                     window, n_batch=n_batch)
    rep = lookup(tmp, coords, valid)          # [K] representative row per row
    is_rep = valid & (rep == jnp.arange(k, dtype=jnp.int32))
    usv, (rep_rows,), _ = compact(is_rep, coords, k,
                                  jnp.arange(k, dtype=jnp.int32)[:, None])
    ugrid = build_hash(usv, window, offset=tmp.offset, n_batch=n_batch)
    slot_of_row = lookup(ugrid, coords, valid)
    return ugrid, rep_rows[:, 0], slot_of_row


def voxelize(points: PointSet, res: float, window: Tuple[int, int, int],
             n_batch: int = 1) -> Tuple[HashedGrid, jnp.ndarray]:
    """Quantize points at resolution `res`, average features per voxel.

    Equivalent of initial_voxelize (ops/torchsparse_utils.py:15-35).
    Returns (hashed voxel grid with K rows — padded past the unique count —
    and idx_query int32 [K]: per-point voxel row, -1 for invalid points).
    """
    k = points.xyz.shape[0]
    vox = jnp.floor(points.xyz / res).astype(jnp.int32)  # [K, 3]
    coords = jnp.concatenate([points.batch[:, None], vox], axis=1)  # [K, 4]
    ugrid, _, idx_query = _unique_coords(coords, points.valid, window, n_batch)

    sums = jax.ops.segment_sum(
        jnp.where(points.valid[:, None], points.feats, 0.0),
        jnp.where(idx_query >= 0, idx_query, k), num_segments=k + 1)[:k]
    cnts = jax.ops.segment_sum(
        (points.valid & (idx_query >= 0)).astype(jnp.float32),
        jnp.where(idx_query >= 0, idx_query, k), num_segments=k + 1)[:k]
    mean = sums / jnp.maximum(cnts[:, None], 1.0)
    uv = ugrid.voxels
    mean = jnp.where(uv.valid[:, None], mean, 0.0)
    grid = HashedGrid(SparseVoxels(uv.coords, mean, uv.valid),
                      ugrid.table, ugrid.offset)
    return grid, idx_query


def point_to_voxel(grid: HashedGrid, points: PointSet, idx_query: jnp.ndarray) -> SparseVoxels:
    """Average point features into existing voxel slots
    (ops/torchsparse_utils.py:40-63)."""
    k = grid.voxels.capacity
    seg = jnp.where((idx_query >= 0) & points.valid, idx_query, k)
    feats_ext = jax.ops.segment_sum(points.feats, seg, num_segments=k + 1)[:k]
    counts = jax.ops.segment_sum(
        ((idx_query >= 0) & points.valid).astype(jnp.float32), seg, num_segments=k + 1)[:k]
    mean = feats_ext / jnp.maximum(counts[:, None], 1.0)
    mean = jnp.where(grid.voxels.valid[:, None], mean, 0.0)
    return SparseVoxels(grid.voxels.coords, mean, grid.voxels.valid)


def devoxelize_trilinear(grid: HashedGrid, points: PointSet, res: float) -> jnp.ndarray:
    """Trilinear interpolation of voxel features at point locations.

    Equivalent of voxel_to_point / spdevoxelize + calc_ti_weights
    (ops/torchsparse_utils.py:68-106). Missing corners contribute zero
    (weights not renormalized — matches torchsparse).
    Returns [K, C] point features.
    """
    p = points.xyz / res  # voxel units
    base = jnp.floor(p).astype(jnp.int32)  # [K,3]
    frac = p - base.astype(p.dtype)  # in [0,1)
    corners = jnp.asarray(kernel_offsets(2), jnp.int32)  # [8,3] in {0,1}^3
    cc = base[:, None, :] + corners[None, :, :]  # [K,8,3]
    b = jnp.broadcast_to(points.batch[:, None, None], (*cc.shape[:2], 1))
    coords = jnp.concatenate([b, cc], axis=-1)  # [K,8,4]
    idx = lookup(grid, coords, points.valid)  # [K,8]
    # trilinear weights: prod over dims of (1-frac) or frac
    w = jnp.ones(idx.shape, p.dtype)
    for d in range(3):
        cd = corners[:, d].astype(p.dtype)  # [8]
        w = w * (cd[None, :] * frac[:, d:d + 1] + (1 - cd[None, :]) * (1 - frac[:, d:d + 1]))
    w = jnp.where(idx >= 0, w, 0.0)
    gathered = gather_rows(grid.voxels.feats, idx)  # [K,8,C]
    return jnp.einsum("ko,koc->kc", w, gathered)


# ---------------------------------------------------------------------------
# Downsample / upsample coordinate transforms (strided sparse conv support)
# ---------------------------------------------------------------------------

def downsample_coords(sv: SparseVoxels, window: Tuple[int, int, int],
                      n_batch: int = 1) -> Tuple[HashedGrid, jnp.ndarray]:
    """Output coordinate set of a stride-2 sparse conv: unique(floor(c/2)).

    window: static window of the COARSE grid.
    Returns (coarse grid with zero feats, child→parent row map int32 [K]).
    """
    coarse = jnp.concatenate(
        [sv.coords[:, :1], jnp.floor_divide(sv.coords[:, 1:], 2)], axis=1)
    ugrid, _, parent = _unique_coords(coarse, sv.valid, window, n_batch)
    return ugrid, parent


def compact(mask: jnp.ndarray, coords: jnp.ndarray, capacity: int,
            *feat_arrays: jnp.ndarray,
            score: Optional[jnp.ndarray] = None
            ) -> Tuple[SparseVoxels, Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """Pack rows where mask is True into the first `capacity` slots.

    coords: [N, 4]; feat_arrays: [N, ...] each. Deterministic (original order
    preserved). With `score` [N] f32, overflow keeps the HIGHEST-scoring rows
    (still emitted in original order) instead of the first `capacity` in grid
    order — grid-order truncation drops whole spatial regions, which during
    early training silently deletes ~90k voxels/step from the same corner of
    the window (the reference instead ABORTS overflowing fragments,
    neucon_network.py:462-484; score-ordered truncation degrades gracefully
    where abort would stall epoch 0 entirely). Returns (SparseVoxels with
    first feat array — or zero-channel feats if none given, the packed extra
    arrays, overflow count).
    """
    n = mask.shape[0]
    k_eff = min(capacity, n)
    if score is None:
        key = jnp.where(mask, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
        # top_k over negated keys → smallest keys first (original order)
        _, order = jax.lax.top_k(-key, k_eff)
        sel_valid = key[order] < n
    else:
        s = jnp.where(mask, score.astype(jnp.float32), -jnp.inf)
        _, cand = jax.lax.top_k(s, k_eff)  # best-scoring masked rows
        # re-sort the selected row indices ascending → original grid order
        sorted_key = jnp.sort(jnp.where(mask[cand], cand, jnp.int32(n)))
        order = jnp.minimum(sorted_key, n - 1)
        sel_valid = sorted_key < n
    if k_eff < capacity:  # capacity exceeds the candidate count: pad
        order = jnp.concatenate(
            [order, jnp.zeros(capacity - k_eff, order.dtype)])
        sel_valid = jnp.concatenate(
            [sel_valid, jnp.zeros(capacity - k_eff, bool)])
    out_coords = jnp.where(sel_valid[:, None], coords[order], 0)
    packed = tuple(
        jnp.where(sel_valid.reshape(sel_valid.shape + (1,) * (a.ndim - 1)),
                  a[order], 0) for a in feat_arrays)
    n_active = jnp.sum(mask.astype(jnp.int32))
    overflow = jnp.maximum(n_active - capacity, 0)
    feats = packed[0] if packed else jnp.zeros((capacity, 0), jnp.float32)
    return SparseVoxels(out_coords.astype(jnp.int32), feats, sel_valid), packed, overflow


# ---------------------------------------------------------------------------
# Dense window ↔ sparse conversions (reference utils.py:163-187 equivalents)
# ---------------------------------------------------------------------------

def sparse_to_dense(coords: jnp.ndarray, values: jnp.ndarray, valid: jnp.ndarray,
                    shape: Sequence[int], default: float = 0.0) -> jnp.ndarray:
    """Scatter [K, C] values at [K, 3] xyz coords into [X, Y, Z, C] dense.

    Out-of-range or invalid rows are dropped. Equivalent of
    sparse_to_dense_channel (reference utils.py:170-177).
    """
    shape = tuple(int(s) for s in shape)
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
    inb = valid & (x >= 0) & (x < shape[0]) & (y >= 0) & (y < shape[1]) & (z >= 0) & (z < shape[2])
    flat = (x * shape[1] + y) * shape[2] + z
    flat = jnp.where(inb, flat, shape[0] * shape[1] * shape[2])
    c = values.shape[-1] if values.ndim > 1 else 1
    vals = values.reshape(-1, c)
    dense = jnp.full((shape[0] * shape[1] * shape[2] + 1, c), default, vals.dtype)
    dense = dense.at[flat].set(jnp.where(inb[:, None], vals, default))
    return dense[:-1].reshape(*shape, c)


def dense_to_sparse(dense: jnp.ndarray, mask: jnp.ndarray, capacity: int,
                    batch_index: int = 0,
                    score: Optional[jnp.ndarray] = None
                    ) -> Tuple[SparseVoxels, jnp.ndarray]:
    """Compact a dense [X, Y, Z, C] volume's masked voxels into K slots.

    score: optional dense [X, Y, Z] confidence — on overflow the
    highest-scoring voxels are kept (see compact).
    Returns (SparseVoxels with (b,x,y,z) coords, overflow count).
    """
    from eprecon_tpu.ops.grid import dense_coords

    shape = dense.shape[:3]
    n = shape[0] * shape[1] * shape[2]
    coords3 = dense_coords(shape).reshape(-1, 3)
    b = jnp.full((coords3.shape[0], 1), batch_index, jnp.int32)
    coords = jnp.concatenate([b, coords3], axis=1)
    sv, (feats,), overflow = compact(
        mask.reshape(-1), coords, capacity, dense.reshape(n, dense.shape[-1]),
        score=None if score is None else score.reshape(-1))
    return SparseVoxels(sv.coords, feats, sv.valid), overflow
