"""GRU temporal fusion with dense global volumes.

TPU-native re-design of reference models/gru_fusion.py:8-394. The reference
keeps python-side sparse global volumes per scale and splices fragments by
coordinate union; here the per-scene-stream global state is a *dense*
capacity-bounded volume per pyramid level, so the fragment window
extract/writeback are `dynamic_slice` / `dynamic_update_slice` — contiguous
copies instead of scatters (measured: HBM scatters cost ~65 ns/row on TPU;
a 524k x 48ch scatter is ~90 ms, while the equivalent dense slice is <1 ms).

Semantics preserved exactly (FUSION.FULL): within the fragment bounding
volume the coordinate union of current+global is fused by two ConvGRUs
(voxel/img branches, reference :339-350) and written back; outside the
window the global volume is untouched (reference update_map :195-215).
GT TSDF is fused into a parallel dense target volume (reference :101-110).

Scene-stream state (`DenseGlobalState`) is an explicit pytree: reset at
scene changes host-side, checkpointable, shardable across the data mesh.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from eprecon_tpu.models.unet_dense import DenseConvGRU
from eprecon_tpu.ops import sparse as sp


class DenseGlobalLevel(NamedTuple):
    """Dense global feature volume at one pyramid level.

    feats is stored FLATTENED as [Gx, Gy, Gz*C]: TPU pads the last (lane)
    dim to 128, so a [.., Gz, C<128] layout would waste up to 128/C x HBM at
    rest; with z and channels merged the lane dim is large and unpadded, and
    a z-window slice is still one contiguous dynamic_slice (start oz*C,
    size Z*C).
    """
    feats: jnp.ndarray  # [Gx, Gy, Gz*C]
    mask: jnp.ndarray   # [Gx, Gy, Gz] bool

    @staticmethod
    def empty(extent: Tuple[int, int, int], channels: int,
              dtype=jnp.float32) -> "DenseGlobalLevel":
        gx, gy, gz = extent
        return DenseGlobalLevel(jnp.zeros((gx, gy, gz * channels), dtype),
                                jnp.zeros(extent, bool))


class DenseTargetLevel(NamedTuple):
    """Dense global GT-TSDF volume (reference target_tsdf_volume)."""
    tsdf: jnp.ndarray  # [Gx, Gy, Gz]
    occ: jnp.ndarray   # [Gx, Gy, Gz] bool

    @staticmethod
    def empty(extent: Tuple[int, int, int]) -> "DenseTargetLevel":
        return DenseTargetLevel(jnp.ones(extent, jnp.float32),
                                jnp.zeros(extent, bool))


def _clamp_origin(rel_origin: jnp.ndarray, extent, window) -> jnp.ndarray:
    hi = jnp.asarray([extent[i] - window[i] for i in range(3)], jnp.int32)
    return jnp.clip(rel_origin, 0, hi)


def slice_window(vol: jnp.ndarray, rel_origin: jnp.ndarray,
                 window: Tuple[int, int, int]) -> jnp.ndarray:
    o = _clamp_origin(rel_origin, vol.shape[:3], window)
    idx = (o[0], o[1], o[2]) + (0,) * (vol.ndim - 3)
    sizes = tuple(window) + vol.shape[3:]
    return jax.lax.dynamic_slice(vol, idx, sizes)


def update_window(vol: jnp.ndarray, win: jnp.ndarray,
                  rel_origin: jnp.ndarray) -> jnp.ndarray:
    o = _clamp_origin(rel_origin, vol.shape[:3], win.shape[:3])
    idx = (o[0], o[1], o[2]) + (0,) * (vol.ndim - 3)
    return jax.lax.dynamic_update_slice(vol, win, idx)


def slice_window_flat(vol_flat: jnp.ndarray, rel_origin: jnp.ndarray,
                      window: Tuple[int, int, int], channels: int) -> jnp.ndarray:
    """Slice [X, Y, Z, C] out of a z*C-flattened [Gx, Gy, Gz*C] volume."""
    gx, gy, gzc = vol_flat.shape
    extent = (gx, gy, gzc // channels)
    o = _clamp_origin(rel_origin, extent, window)
    win = jax.lax.dynamic_slice(
        vol_flat, (o[0], o[1], o[2] * channels),
        (window[0], window[1], window[2] * channels))
    return win.reshape(window[0], window[1], window[2], channels)


def update_window_flat(vol_flat: jnp.ndarray, win: jnp.ndarray,
                       rel_origin: jnp.ndarray) -> jnp.ndarray:
    """Write [X, Y, Z, C] back into the flattened global volume."""
    x, y, z, c = win.shape
    gx, gy, gzc = vol_flat.shape
    o = _clamp_origin(rel_origin, (gx, gy, gzc // c), (x, y, z))
    return jax.lax.dynamic_update_slice(
        vol_flat, win.reshape(x, y, z * c), (o[0], o[1], o[2] * c))


class DenseGRUFusion(nn.Module):
    """Feature-mode fusion at one level on dense windows
    (reference gru_fusion.py:259-394, FUSION.FULL, batch=1)."""
    ch_voxel: int
    ch_img: int
    remat: bool = True  # recompute the GRU convs in the backward pass

    @nn.compact
    def __call__(self, cur_feats: jnp.ndarray, cur_mask: jnp.ndarray,
                 gmap: DenseGlobalLevel, rel_origin: jnp.ndarray):
        """cur_feats: [X,Y,Z,C] (voxel ⊕ img channels); returns
        (fused [X,Y,Z,C], union mask [X,Y,Z], new gmap)."""
        window = cur_mask.shape
        c = self.ch_voxel + self.ch_img
        g_feats = slice_window_flat(gmap.feats, rel_origin, window,
                                    c).astype(cur_feats.dtype)
        g_mask = slice_window(gmap.mask, rel_origin, window)
        union = g_mask | cur_mask  # reference :91-98 coordinate union

        h = jnp.where(g_mask[..., None], g_feats, 0)
        x = jnp.where(cur_mask[..., None], cur_feats, 0)
        cv = self.ch_voxel
        # remat ONLY the GRU conv compute: the global-map slice/writeback must
        # stay outside the remat boundary, otherwise the backward pass
        # recomputes full-volume dynamic_update_slices (~2.5 ms copies of the
        # [256,256,6144] map per level per direction, measured on v5e)
        gru = nn.remat(DenseConvGRU) if self.remat else DenseConvGRU
        fv = gru(cv, name="gru_voxel")(h[..., :cv], x[..., :cv], union)
        fi = gru(self.ch_img, name="gru_img")(h[..., cv:], x[..., cv:], union)
        fused = jnp.concatenate([fv, fi], axis=-1)
        fused = jnp.where(union[..., None], fused, 0)

        # state carry is truncated-BPTT (the reference detaches global volumes
        # between fragments): no gradient flows through the writeback
        new_gmap = DenseGlobalLevel(
            update_window_flat(gmap.feats,
                               jax.lax.stop_gradient(fused).astype(
                                   gmap.feats.dtype), rel_origin),
            update_window(gmap.mask, union, rel_origin))
        return fused, union, new_gmap


def fuse_target_window(tmap: DenseTargetLevel, tsdf_window: jnp.ndarray,
                       occ_window: jnp.ndarray, rel_origin: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, DenseTargetLevel]:
    """Fuse fragment GT into the global target volume and return the fused
    window (reference gru_fusion.py:101-110; current overwrites global)."""
    window = tsdf_window.shape
    g_tsdf = slice_window(tmap.tsdf, rel_origin, window)
    g_occ = slice_window(tmap.occ, rel_origin, window)
    fused = jnp.where(occ_window, tsdf_window, jnp.where(g_occ, g_tsdf, 1.0))
    fused_occ = occ_window | g_occ
    new = DenseTargetLevel(update_window(tmap.tsdf, fused, rel_origin),
                           update_window(tmap.occ, fused_occ, rel_origin))
    return fused, fused_occ, new


# ---------------------------------------------------------------------------
# Direct-substitute mode (inference): dense global TSDF + panoptic ids
# (reference gru_fusion.py:17-20,94,352-370 + panoptic_fusion :133-193)
# ---------------------------------------------------------------------------

MAX_GLOBAL_INSTANCES = 1024  # id table bound for IoU matching


class PanopticGlobalDense(NamedTuple):
    tsdf: jnp.ndarray      # [Gx, Gy, Gz] f32 (init 1)
    instance: jnp.ndarray  # [Gx, Gy, Gz] int32
    semantic: jnp.ndarray  # [Gx, Gy, Gz] int32
    mask: jnp.ndarray      # [Gx, Gy, Gz] bool (observed near-surface)
    next_instance_id: jnp.ndarray  # int32 scalar

    @staticmethod
    def empty(extent: Tuple[int, int, int], max_stuff: int = 2
              ) -> "PanopticGlobalDense":
        return PanopticGlobalDense(
            jnp.ones(extent, jnp.float32), jnp.zeros(extent, jnp.int32),
            jnp.zeros(extent, jnp.int32), jnp.zeros(extent, bool),
            jnp.asarray(max_stuff, jnp.int32))


def panoptic_instance_match(g_instance: jnp.ndarray, g_semantic: jnp.ndarray,
                            g_count: jnp.ndarray, g_class: jnp.ndarray,
                            next_id: jnp.ndarray,
                            seg_ids: jnp.ndarray, seg_class: jnp.ndarray,
                            seg_isthing: jnp.ndarray, seg_valid: jnp.ndarray,
                            vox_valid: jnp.ndarray,
                            overlap_threshold: float = 0.05):
    """Cross-fragment instance id assignment on dense windows
    (reference gru_fusion.py:133-193).

    g_instance/g_semantic: [N] flattened window ids from the global map
    (0 where unobserved); g_count/g_class: [MAX_GLOBAL_INSTANCES] global
    per-id voxel counts and class table; seg_ids: [N] per-voxel predicted
    segment (0 none); seg_*: [S+1] segment tables.

    For each predicted thing segment: IoU (exact coordinate match) against
    same-class global instances; IoU > threshold inherits the id (argmax
    rather than the reference's scan-order first-match), else a fresh id.
    Stuff keeps its class id. Returns (vox_instance [N], vox_semantic [N],
    next_id').
    """
    s_max = seg_class.shape[0]
    gid = jnp.where(vox_valid, jnp.clip(g_instance, 0, MAX_GLOBAL_INSTANCES - 1), 0)
    pair = seg_ids * MAX_GLOBAL_INSTANCES + gid
    pair = jnp.where(vox_valid & (seg_ids > 0), pair, 0)
    inter = jax.ops.segment_sum(
        (vox_valid & (seg_ids > 0) & (gid > 0)).astype(jnp.int32),
        pair, num_segments=s_max * MAX_GLOBAL_INSTANCES
    ).reshape(s_max, MAX_GLOBAL_INSTANCES)

    seg_size = jax.ops.segment_sum((vox_valid & (seg_ids > 0)).astype(jnp.int32),
                                   jnp.where(vox_valid, seg_ids, 0),
                                   num_segments=s_max)
    union = seg_size[:, None] + g_count[None, :] - inter
    iou = inter / jnp.maximum(union, 1)
    same_class = seg_class[:, None] == g_class[None, :]
    iou = jnp.where(same_class & (g_count[None, :] > 0), iou, 0.0)
    iou = iou.at[:, 0].set(0.0)

    best_iou = jnp.max(iou, axis=1)
    best_gid = jnp.argmax(iou, axis=1).astype(jnp.int32)
    matched = best_iou > overlap_threshold

    need_new = seg_valid & seg_isthing & ~matched
    new_offsets = jnp.cumsum(need_new.astype(jnp.int32))
    fresh_id = next_id + new_offsets
    seg_new_instance = jnp.where(seg_isthing,
                                 jnp.where(matched, best_gid, fresh_id),
                                 seg_class)
    vox_seg = jnp.where(vox_valid, seg_ids, 0)
    vox_instance = jnp.where(vox_seg > 0, seg_new_instance[vox_seg], 0)
    vox_semantic = jnp.where(vox_seg > 0, seg_class[vox_seg], 0)
    return vox_instance, vox_semantic, next_id + new_offsets[-1]


def fuse_tsdf_direct(gmap: PanopticGlobalDense,
                     tsdf_window: jnp.ndarray, cur_mask: jnp.ndarray,
                     seg_window: jnp.ndarray,
                     seg_class: jnp.ndarray, seg_isthing: jnp.ndarray,
                     seg_valid: jnp.ndarray, rel_origin: jnp.ndarray
                     ) -> PanopticGlobalDense:
    """Direct-substitute fusion of a fragment's final dense TSDF + panoptic
    segment window into the global map (reference gru_fusion.py direct mode).

    tsdf_window: [X,Y,Z]; cur_mask: [X,Y,Z] voxels predicted this fragment;
    seg_window: [X,Y,Z] int32 per-voxel segment id (0 none).
    """
    window = tsdf_window.shape
    g_tsdf = slice_window(gmap.tsdf, rel_origin, window)
    g_mask = slice_window(gmap.mask, rel_origin, window)
    g_inst = slice_window(gmap.instance, rel_origin, window)
    g_sem = slice_window(gmap.semantic, rel_origin, window)

    # union of near-surface voxels (reference :94); current substitutes
    fused_tsdf = jnp.where(cur_mask, tsdf_window, jnp.where(g_mask, g_tsdf, 1.0))
    union = (jnp.abs(fused_tsdf) < 1.0) & (cur_mask | g_mask)

    # global per-instance stats over the WHOLE map (cheap: 1ch segment sums)
    gid_all = jnp.where(gmap.mask, jnp.clip(gmap.instance, 0,
                                            MAX_GLOBAL_INSTANCES - 1), 0)
    g_count = jax.ops.segment_sum(gmap.mask.reshape(-1).astype(jnp.int32),
                                  gid_all.reshape(-1),
                                  num_segments=MAX_GLOBAL_INSTANCES)
    g_count = g_count.at[0].set(0)
    g_class = jax.ops.segment_max(
        jnp.where(gmap.mask, gmap.semantic, 0).reshape(-1),
        gid_all.reshape(-1), num_segments=MAX_GLOBAL_INSTANCES)

    vox_inst, vox_sem, next_id = panoptic_instance_match(
        g_inst.reshape(-1), g_sem.reshape(-1), g_count, g_class,
        gmap.next_instance_id,
        jnp.where(cur_mask, seg_window, 0).reshape(-1),
        seg_class, seg_isthing, seg_valid, union.reshape(-1))
    vox_inst = vox_inst.reshape(window)
    vox_sem = vox_sem.reshape(window)
    # keep previous ids where the fragment predicts nothing
    new_inst = jnp.where(cur_mask & (seg_window > 0), vox_inst,
                         jnp.where(g_mask, g_inst, 0))
    new_sem = jnp.where(cur_mask & (seg_window > 0), vox_sem,
                        jnp.where(g_mask, g_sem, 0))

    return PanopticGlobalDense(
        update_window(gmap.tsdf, fused_tsdf, rel_origin),
        update_window(gmap.instance, new_inst, rel_origin),
        update_window(gmap.semantic, new_sem, rel_origin),
        update_window(gmap.mask, union, rel_origin),
        next_id)
