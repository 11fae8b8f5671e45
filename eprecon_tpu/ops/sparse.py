"""Static-shape sparse voxel engine for TPU.

TPU-native replacement for the reference's CUDA sparse libraries
(torchsparse hashing/voxelize/devoxelize: ops/torchsparse_utils.py:15-106;
spconv submanifold convs: models/modules.py:249-271). Everything here is
jit-safe with capacity-padded static shapes:

  * a voxel set is `SparseVoxels(coords int32[K,4], feats f32[K,C], valid bool[K])`
  * coordinate lookup = int32 key packing + sort + binary search
    (no dynamic hash tables; XLA-friendly)
  * sparse 3D conv = per-offset neighbor gather → matmul → accumulate
    (27 small GEMMs that XLA tiles onto the MXU)
  * point↔voxel (de)voxelization = the same key machinery + trilinear weights

Filtering never changes shapes: it flips `valid` flags; `compact` re-packs a
mask into the leading slots when a fresh capacity is needed.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Coordinates are packed into a positive int32 key:
#   key = ((b * W + x') * W + y') * W + z'   with x' = x + W/2 in [0, W)
# W = 512 → 27 bits for xyz + 3 bits batch = 30 bits < 31. Invalid = INT32_MAX.
KEY_WINDOW = 512
KEY_OFFSET = KEY_WINDOW // 2
INVALID_KEY = np.int32(2**31 - 1)
MAX_BATCH = 7


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
    """A SparseVoxels whose rows are sorted by packed key (lookup-ready)."""
    voxels: SparseVoxels
    keys: jnp.ndarray  # int32 [K], ascending, INVALID_KEY for padding


def pack_keys(coords: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """coords int32 [K,4] (b,x,y,z) → int32 keys; invalid/out-of-window → INVALID_KEY."""
    b, x, y, z = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    xo, yo, zo = x + KEY_OFFSET, y + KEY_OFFSET, z + KEY_OFFSET
    in_win = ((xo >= 0) & (xo < KEY_WINDOW) & (yo >= 0) & (yo < KEY_WINDOW)
              & (zo >= 0) & (zo < KEY_WINDOW) & (b >= 0) & (b <= MAX_BATCH))
    key = ((b * KEY_WINDOW + xo) * KEY_WINDOW + yo) * KEY_WINDOW + zo
    return jnp.where(valid & in_win, key, INVALID_KEY)


def build_hash(sv: SparseVoxels) -> HashedGrid:
    """Sort rows by key so that lookups can binary-search."""
    keys = pack_keys(sv.coords, sv.valid)
    order = jnp.argsort(keys)
    keys = keys[order]
    sv = SparseVoxels(sv.coords[order], sv.feats[order], sv.valid[order] & (keys != INVALID_KEY))
    return HashedGrid(sv, keys)


def lookup(grid: HashedGrid, query_coords: jnp.ndarray,
           query_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Find row index of each query coord in the grid; -1 if absent.

    query_coords: int32 [..., 4]. Returns int32 [...] indices into grid rows.
    Equivalent of torchsparse sphashquery (ops/torchsparse_utils.py:21).
    """
    flat = query_coords.reshape(-1, 4)
    if query_valid is None:
        qvalid = jnp.ones(flat.shape[0], bool)
    else:
        qvalid = jnp.broadcast_to(
            query_valid.reshape(query_valid.shape + (1,) * (query_coords.ndim - 1 - query_valid.ndim)),
            query_coords.shape[:-1]).reshape(-1)
    qkeys = pack_keys(flat, qvalid)
    pos = jnp.searchsorted(grid.keys, qkeys)
    pos = jnp.clip(pos, 0, grid.keys.shape[0] - 1)
    hit = (grid.keys[pos] == qkeys) & (qkeys != INVALID_KEY)
    idx = jnp.where(hit, pos, -1).astype(jnp.int32)
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
    qvalid = jnp.broadcast_to(query_valid[:, None], nb.shape[:2])
    return lookup(grid, nb_coords, qvalid)


def sparse_conv_apply(feats: jnp.ndarray, nmap: jnp.ndarray,
                      weights: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
                      out_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Gather-GEMM-accumulate sparse convolution.

    feats: [K, Cin] source features; nmap: int32 [K_out, O] neighbor rows;
    weights: [O, Cin, Cout]. Returns [K_out, Cout].
    Unrolled over the O kernel offsets so XLA pipelines O MXU matmuls.
    """
    n_off = nmap.shape[1]
    out = None
    for o in range(n_off):
        g = gather_rows(feats, nmap[:, o])  # [K_out, Cin]
        term = jnp.dot(g, weights[o], preferred_element_type=jnp.float32)
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


def voxelize(points: PointSet, res: float) -> Tuple[HashedGrid, jnp.ndarray]:
    """Quantize points at resolution `res`, average features per voxel.

    Equivalent of initial_voxelize (ops/torchsparse_utils.py:15-35).
    Returns (hashed voxel grid with K rows — padded past the unique count —
    and idx_query int32 [K]: per-point voxel row, -1 for invalid points).
    """
    k = points.xyz.shape[0]
    vox = jnp.floor(points.xyz / res).astype(jnp.int32)  # [K, 3]
    coords = jnp.concatenate([points.batch[:, None], vox], axis=1)  # [K, 4]
    keys = pack_keys(coords, points.valid)
    order = jnp.argsort(keys)
    skeys = keys[order]
    svalid = skeys != INVALID_KEY
    head = jnp.concatenate([svalid[:1],
                            svalid[1:] & (skeys[1:] != skeys[:-1])])
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1  # voxel slot per sorted point
    seg = jnp.where(svalid, seg, k - 1)  # dump invalid into last slot

    sfeats = points.feats[order]
    sum_feats = jax.ops.segment_sum(
        jnp.where(svalid[:, None], sfeats, 0.0), seg, num_segments=k)
    counts = jax.ops.segment_sum(svalid.astype(jnp.float32), seg, num_segments=k)
    mean_feats = sum_feats / jnp.maximum(counts[:, None], 1.0)

    # voxel coords: first sorted point of each segment
    scoords = coords[order]
    vox_coords = jax.ops.segment_max(
        jnp.where(svalid[:, None], scoords, jnp.iinfo(jnp.int32).min),
        seg, num_segments=k)
    n_vox = jnp.sum(head.astype(jnp.int32))
    slot_valid = jnp.arange(k) < n_vox

    vox_coords = jnp.where(slot_valid[:, None], vox_coords, 0)
    voxels = SparseVoxels(vox_coords.astype(jnp.int32),
                          jnp.where(slot_valid[:, None], mean_feats, 0.0),
                          slot_valid)
    grid = build_hash(voxels)  # segment slots are already key-ordered, but re-hash for safety

    # per-point voxel row in the *hashed* grid
    idx_query = lookup(grid, coords, points.valid)
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

def downsample_coords(sv: SparseVoxels) -> Tuple[HashedGrid, jnp.ndarray]:
    """Output coordinate set of a stride-2 sparse conv: unique(floor(c/2)).

    Returns (coarse grid with zero feats, child→parent row map int32 [K]).
    """
    k = sv.capacity
    coarse = jnp.concatenate(
        [sv.coords[:, :1], jnp.floor_divide(sv.coords[:, 1:], 2)], axis=1)
    keys = pack_keys(coarse, sv.valid)
    order = jnp.argsort(keys)
    skeys = keys[order]
    svalid = skeys != INVALID_KEY
    head = jnp.concatenate([svalid[:1], svalid[1:] & (skeys[1:] != skeys[:-1])])
    n_vox = jnp.sum(head.astype(jnp.int32))
    slot_valid = jnp.arange(k) < n_vox
    scoords = coarse[order]
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1
    seg = jnp.where(svalid, seg, k - 1)
    vox_coords = jax.ops.segment_max(
        jnp.where(svalid[:, None], scoords, jnp.iinfo(jnp.int32).min),
        seg, num_segments=k)
    vox_coords = jnp.where(slot_valid[:, None], vox_coords, 0)
    voxels = SparseVoxels(vox_coords.astype(jnp.int32),
                          jnp.zeros((k, 0), sv.feats.dtype), slot_valid)
    grid = build_hash(voxels)
    parent = lookup(grid, coarse, sv.valid)
    return grid, parent


def compact(mask: jnp.ndarray, coords: jnp.ndarray, capacity: int,
            *feat_arrays: jnp.ndarray) -> Tuple[SparseVoxels, Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """Pack rows where mask is True into the first `capacity` slots.

    coords: [N, 4]; feat_arrays: [N, ...] each. Deterministic (original order
    preserved). Returns (SparseVoxels with first feat array — or zero-channel
    feats if none given, the packed extra arrays, overflow count).
    """
    n = mask.shape[0]
    key = jnp.where(mask, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    # top_k over negated keys → smallest keys first (original order)
    _, order = jax.lax.top_k(-key, capacity)
    sel_valid = key[order] < n
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
                    batch_index: int = 0) -> Tuple[SparseVoxels, jnp.ndarray]:
    """Compact a dense [X, Y, Z, C] volume's masked voxels into K slots.

    Returns (SparseVoxels with (b,x,y,z) coords, overflow count).
    """
    from eprecon_tpu.ops.grid import dense_coords

    shape = dense.shape[:3]
    coords3 = dense_coords(shape).reshape(-1, 3)
    b = jnp.full((coords3.shape[0], 1), batch_index, jnp.int32)
    coords = jnp.concatenate([b, coords3], axis=1)
    sv, (feats,), overflow = compact(mask.reshape(-1), coords, capacity,
                                     dense.reshape(-1, dense.shape[-1]))
    return SparseVoxels(sv.coords, feats, sv.valid), overflow
