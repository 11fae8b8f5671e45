"""GRU temporal fusion with a functional global map.

TPU-native re-design of reference models/gru_fusion.py:8-394. The reference
keeps python-side mutable global volumes per scale; here the global map is an
explicit capacity-padded pytree (`GlobalMapLevel`) threaded through jitted
steps — checkpointable and shardable. Scene change detection / reset stays
outside jit (see inference pipeline / train loop).

Feature mode (training): per fragment and scale, the global map is windowed
into the fragment bounding volume (dense scatter — the fragment window is a
fixed 24/48/96^3 box, which is TPU-friendly), united with the current sparse
set (FUSION.FULL semantics, reference gru_fusion.py:91-98), fused by two
ConvGRUs (voxel-branch + img-branch channels, reference :339-350), and
written back (out-of-window rows kept, in-window rows replaced,
reference update_map :195-215). GT TSDF is fused into a parallel target map
(reference :101-110) so the loss sees the union coords.

The core operates on batch=1 fragments; training loops over the microbatch
sequentially, matching the reference's incremental per-batch fusion
(reference :275).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from eprecon_tpu.models.spvcnn import ConvGRU, build_sconv_plan
from eprecon_tpu.ops import sparse as sp


class GlobalMapLevel(NamedTuple):
    """Capacity-padded sparse global volume at one pyramid level."""
    coords: jnp.ndarray  # int32 [G, 3] voxel coords in level units (global frame)
    feats: jnp.ndarray   # f32 [G, C]
    valid: jnp.ndarray   # bool [G]

    @staticmethod
    def empty(capacity: int, channels: int) -> "GlobalMapLevel":
        return GlobalMapLevel(jnp.zeros((capacity, 3), jnp.int32),
                              jnp.zeros((capacity, channels), jnp.float32),
                              jnp.zeros(capacity, bool))


def window_global(gmap: GlobalMapLevel, rel_origin: jnp.ndarray,
                  dim: Tuple[int, int, int]):
    """Dense-scatter the in-window part of the global map.

    Returns (dense feats [X,Y,Z,C], dense mask [X,Y,Z], in_window row mask [G]).
    """
    w = gmap.coords - rel_origin[None, :]
    in_win = gmap.valid & ((w >= 0) & (w < jnp.asarray(dim)[None, :])).all(axis=1)
    feats = sp.sparse_to_dense(w, gmap.feats, in_win, dim)
    mask = sp.sparse_to_dense(w, jnp.ones((gmap.coords.shape[0], 1), jnp.float32),
                              in_win, dim)[..., 0] > 0
    return feats, mask, in_win


def replace_window(gmap: GlobalMapLevel, in_win: jnp.ndarray,
                   new_coords_w: jnp.ndarray, new_feats: jnp.ndarray,
                   new_valid: jnp.ndarray, rel_origin: jnp.ndarray
                   ) -> Tuple[GlobalMapLevel, jnp.ndarray]:
    """Drop in-window global rows, append the fused window rows
    (reference gru_fusion.py:195-215 update_map). Returns (map, overflow)."""
    g = gmap.coords.shape[0]
    keep = gmap.valid & ~in_win
    all_coords = jnp.concatenate([gmap.coords, new_coords_w + rel_origin[None, :]])
    all_feats = jnp.concatenate([gmap.feats, new_feats])
    all_mask = jnp.concatenate([keep, new_valid])
    coords4 = jnp.concatenate([jnp.zeros((all_coords.shape[0], 1), jnp.int32),
                               all_coords], axis=1)
    svx, (feats,), overflow = sp.compact(all_mask, coords4, g, all_feats)
    return GlobalMapLevel(svx.coords[:, 1:], feats, svx.valid), overflow


def fuse_target_window(target_map: GlobalMapLevel, tsdf_window: jnp.ndarray,
                       occ_window: jnp.ndarray, rel_origin: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, GlobalMapLevel, jnp.ndarray]:
    """Fuse the fragment's GT TSDF into the global target volume
    (reference gru_fusion.py:101-110) and return the fused window.

    tsdf_window/occ_window: dense [X,Y,Z] GT for the current fragment.
    Returns (fused dense tsdf window [X,Y,Z], new target map, overflow).
    """
    dim = tsdf_window.shape
    gfeats, gmask, in_win = window_global(target_map, rel_origin, dim)
    fused = jnp.where(gmask, gfeats[..., 0], 1.0)
    # current fragment GT overwrites global where observed (scatter order:
    # global first, current last — reference concat order :106-107)
    fused = jnp.where(occ_window, tsdf_window, fused)
    fused_occ = jnp.abs(fused) < 1.0

    from eprecon_tpu.ops.grid import dense_coords

    coords3 = dense_coords(dim).reshape(-1, 3)
    coords4 = jnp.concatenate([jnp.zeros((coords3.shape[0], 1), jnp.int32), coords3], 1)
    svx, (vals,), _ = sp.compact(fused_occ.reshape(-1), coords4,
                                 target_map.coords.shape[0],
                                 fused.reshape(-1, 1))
    new_map, overflow = replace_window(
        GlobalMapLevel(target_map.coords, target_map.feats, target_map.valid),
        in_win, svx.coords[:, 1:], vals, svx.valid, rel_origin)
    return fused, new_map, overflow


class FusionInputs(NamedTuple):
    """Per-fragment per-level geometry for the fusion step."""
    rel_origin: jnp.ndarray       # int32 [3] window origin in level units
    origin_partial: jnp.ndarray   # f32 [3] fragment world origin
    world_to_aligned: jnp.ndarray  # f32 [4, 4]


class GRUFusionStep(nn.Module):
    """One feature-mode fusion step at one pyramid level
    (reference gru_fusion.py:259-394, batch=1, FUSION.FULL).

    Call with the current fragment's sparse set (coords in FINE voxel units)
    plus the global/target maps; returns the coordinate-union sparse set with
    GRU-fused features, per-voxel fused GT targets, and the new maps.
    """
    ch_voxel: int
    ch_img: int
    interval: int
    voxel_size: float
    dim: Tuple[int, int, int]
    capacity: int
    point_window: int = 192  # static index-table span for the ConvGRU grid

    @nn.compact
    def __call__(self, coords, feats, valid, gmap: GlobalMapLevel,
                 target_map: Optional[GlobalMapLevel],
                 tsdf_window: Optional[jnp.ndarray],
                 occ_window: Optional[jnp.ndarray], fin: FusionInputs):
        c = feats.shape[-1]
        cur_w = jnp.floor_divide(coords[:, 1:], self.interval)
        # dense windows
        g_dense, g_mask, in_win = window_global(gmap, fin.rel_origin, self.dim)
        cur_dense = sp.sparse_to_dense(cur_w, feats, valid, self.dim)
        cur_mask = sp.sparse_to_dense(cur_w,
                                      jnp.ones((coords.shape[0], 1), jnp.float32),
                                      valid, self.dim)[..., 0] > 0
        union = g_mask | cur_mask  # FUSION.FULL (reference :91-98)

        union_sv, overflow = sp.dense_to_sparse(
            jnp.concatenate([cur_dense, g_dense], axis=-1), union, self.capacity)
        u_coords_w = union_sv.coords[:, 1:]
        u_valid = union_sv.valid
        x_vals = union_sv.feats[:, :c]
        h_vals = union_sv.feats[:, c:]

        # aligned-camera points for the ConvGRUs (reference :332-337); coords
        # pre-scaled by 1/vres so the sconv plan voxelizes at res=1
        vsz = self.voxel_size * self.interval
        world = u_coords_w.astype(jnp.float32) * vsz + fin.origin_partial[None, :]
        wh = jnp.concatenate([world, jnp.ones_like(world[:, :1])], axis=1)
        aligned = (fin.world_to_aligned[:3] @ wh.T).T  # [K, 3]
        points = sp.PointSet(aligned / vsz, jnp.zeros(self.capacity, jnp.int32),
                             x_vals, u_valid)
        plan = build_sconv_plan(points, vres=1.0, window=self.point_window)

        hv, hi = h_vals[:, :self.ch_voxel], h_vals[:, self.ch_voxel:]
        xv, xi = x_vals[:, :self.ch_voxel], x_vals[:, self.ch_voxel:]
        fv = ConvGRU(self.ch_voxel, name="gru_voxel")(hv, xv, plan)
        fi = ConvGRU(self.ch_img, name="gru_img")(hi, xi, plan)
        fused = jnp.concatenate([fv, fi], axis=-1)
        fused = jnp.where(u_valid[:, None], fused, 0.0)

        new_gmap, g_overflow = replace_window(gmap, in_win, u_coords_w, fused,
                                              u_valid, fin.rel_origin)

        # GT fusion + per-voxel targets at union coords (reference :101-110)
        if tsdf_window is not None:
            fused_tsdf, new_tmap, _ = fuse_target_window(
                target_map, tsdf_window, occ_window, fin.rel_origin)
            tsdf_t = fused_tsdf[u_coords_w[:, 0], u_coords_w[:, 1], u_coords_w[:, 2]]
            occ_t = (jnp.abs(tsdf_t) < 1.0) & u_valid
        else:
            tsdf_t = occ_t = None
            new_tmap = target_map

        out_coords = jnp.concatenate([union_sv.coords[:, :1],
                                      u_coords_w * self.interval], axis=1)
        return dict(coords=out_coords, feats=fused, valid=u_valid,
                    tsdf_target=tsdf_t, occ_target=occ_t,
                    gmap=new_gmap, target_map=new_tmap,
                    overflow=overflow + g_overflow)


# ---------------------------------------------------------------------------
# Direct-substitute mode (inference): global TSDF + panoptic id volumes
# (reference gru_fusion.py:17-20,94,352-370 + panoptic_fusion :133-193)
# ---------------------------------------------------------------------------

class PanopticGlobalMap(NamedTuple):
    """Inference-time global volume: tsdf + instance/semantic ids."""
    coords: jnp.ndarray    # int32 [G, 3] (finest-level units, global frame)
    tsdf: jnp.ndarray      # f32 [G]
    instance: jnp.ndarray  # int32 [G]
    semantic: jnp.ndarray  # int32 [G]
    valid: jnp.ndarray     # bool [G]
    next_instance_id: jnp.ndarray  # int32 scalar (> stuff ids)

    @staticmethod
    def empty(capacity: int, max_stuff: int = 2) -> "PanopticGlobalMap":
        return PanopticGlobalMap(
            jnp.zeros((capacity, 3), jnp.int32), jnp.zeros(capacity, jnp.float32),
            jnp.zeros(capacity, jnp.int32), jnp.zeros(capacity, jnp.int32),
            jnp.zeros(capacity, bool), jnp.asarray(max_stuff, jnp.int32))


MAX_GLOBAL_INSTANCES = 1024  # id table bound for IoU matching


def panoptic_instance_match(gmap: PanopticGlobalMap,
                            seg_ids: jnp.ndarray,         # [K] 1..S per-voxel segment id (0 = none)
                            seg_class: jnp.ndarray,       # [S+1] class per segment (0 unused)
                            seg_isthing: jnp.ndarray,     # [S+1] bool
                            seg_valid: jnp.ndarray,       # [S+1] bool
                            global_rows: jnp.ndarray,     # [K] row in gmap per voxel (-1 absent)
                            voxel_valid: jnp.ndarray,     # [K]
                            overlap_threshold: float = 0.05):
    """Cross-fragment instance id assignment (reference gru_fusion.py:133-193).

    For each predicted thing segment, IoU (exact coordinate match) against
    existing global instances of the same class; IoU > threshold inherits the
    id (argmax-IoU rather than the reference's first-match, which is
    scan-order dependent), otherwise a fresh id. Stuff keeps its class id.

    Returns (per-voxel new instance ids [K], per-voxel semantic ids [K],
    next_instance_id').
    """
    s_max = seg_class.shape[0]
    # global instance stats: per-id voxel counts and (majority) class
    gid = jnp.where(gmap.valid, jnp.clip(gmap.instance, 0, MAX_GLOBAL_INSTANCES - 1), 0)
    g_count = jax.ops.segment_sum(gmap.valid.astype(jnp.int32), gid,
                                  num_segments=MAX_GLOBAL_INSTANCES)
    g_class = jax.ops.segment_max(
        jnp.where(gmap.valid, gmap.semantic, 0), gid,
        num_segments=MAX_GLOBAL_INSTANCES)
    g_count = g_count.at[0].set(0)  # id 0 = empty

    # intersection counts: voxels of segment s whose global row has instance g
    g_inst_at_voxel = jnp.where(
        (global_rows >= 0) & voxel_valid,
        jnp.clip(gmap.instance[jnp.maximum(global_rows, 0)], 0, MAX_GLOBAL_INSTANCES - 1),
        0)
    pair = seg_ids * MAX_GLOBAL_INSTANCES + g_inst_at_voxel
    pair = jnp.where(voxel_valid & (seg_ids > 0), pair, 0)
    inter = jax.ops.segment_sum(
        (voxel_valid & (seg_ids > 0) & (g_inst_at_voxel > 0)).astype(jnp.int32),
        pair, num_segments=s_max * MAX_GLOBAL_INSTANCES
    ).reshape(s_max, MAX_GLOBAL_INSTANCES)

    seg_size = jax.ops.segment_sum((voxel_valid & (seg_ids > 0)).astype(jnp.int32),
                                   jnp.where(voxel_valid, seg_ids, 0),
                                   num_segments=s_max)

    union = seg_size[:, None] + g_count[None, :] - inter
    iou = inter / jnp.maximum(union, 1)
    same_class = seg_class[:, None] == g_class[None, :]
    iou = jnp.where(same_class & (g_count[None, :] > 0), iou, 0.0)

    best_iou = jnp.max(iou, axis=1)           # [S+1]
    best_gid = jnp.argmax(iou, axis=1).astype(jnp.int32)
    matched = best_iou > overlap_threshold

    # fresh ids for unmatched things, allocated in segment order
    need_new = seg_valid & seg_isthing & ~matched
    new_offsets = jnp.cumsum(need_new.astype(jnp.int32))  # [S+1], 1-based among new
    fresh_id = gmap.next_instance_id + new_offsets
    seg_new_instance = jnp.where(seg_isthing,
                                 jnp.where(matched, best_gid, fresh_id),
                                 seg_class)  # stuff: instance id = class id
    seg_new_semantic = seg_class
    next_id = gmap.next_instance_id + new_offsets[-1]

    vox_seg = jnp.where(voxel_valid, seg_ids, 0)
    vox_instance = jnp.where(vox_seg > 0, seg_new_instance[vox_seg], 0)
    vox_semantic = jnp.where(vox_seg > 0, seg_new_semantic[vox_seg], 0)
    return vox_instance, vox_semantic, next_id


def fuse_tsdf_direct(gmap: PanopticGlobalMap, coords: jnp.ndarray,
                     tsdf: jnp.ndarray, valid: jnp.ndarray,
                     seg_ids: jnp.ndarray, seg_class: jnp.ndarray,
                     seg_isthing: jnp.ndarray, seg_valid: jnp.ndarray,
                     rel_origin: jnp.ndarray, dim: Tuple[int, int, int],
                     capacity: int) -> Tuple[PanopticGlobalMap, jnp.ndarray]:
    """Direct-substitute fusion of a fragment's final TSDF + panoptic labels
    into the global map (reference gru_fusion.py:259-394 direct mode, batch=1).

    coords: [K, 4] finest-level coords (fine units, interval 1); tsdf [K];
    seg_ids [K] per-voxel panoptic segment id (0 = none).
    Returns (new map, overflow).
    """
    cur_w = coords[:, 1:]
    g_dense, g_mask, in_win = window_global(
        GlobalMapLevel(gmap.coords, gmap.tsdf[:, None], gmap.valid),
        rel_origin, dim)
    cur_dense = sp.sparse_to_dense(cur_w, tsdf[:, None], valid, dim, default=1.0)
    cur_mask = sp.sparse_to_dense(cur_w, jnp.ones_like(tsdf[:, None]), valid,
                                  dim)[..., 0] > 0
    g_tsdf = jnp.where(g_mask, g_dense[..., 0], 1.0)
    c_tsdf = jnp.where(cur_mask, cur_dense[..., 0], 1.0)
    # union of near-surface voxels (reference :94: |tsdf| < 1 in either)
    union = (jnp.abs(g_tsdf) < 1.0) | (jnp.abs(c_tsdf) < 1.0)
    # current substitutes where present, else keep global
    fused_tsdf = jnp.where(cur_mask, c_tsdf, g_tsdf)

    seg_dense = sp.sparse_to_dense(cur_w, seg_ids[:, None].astype(jnp.float32),
                                   valid, dim)[..., 0].astype(jnp.int32)

    union_sv, overflow = sp.dense_to_sparse(
        jnp.stack([fused_tsdf, seg_dense.astype(jnp.float32)], axis=-1),
        union, capacity)
    u_coords = union_sv.coords[:, 1:]
    u_valid = union_sv.valid
    u_tsdf = union_sv.feats[:, 0]
    u_seg = union_sv.feats[:, 1].astype(jnp.int32)

    # per-voxel global row (for instance IoU) — pre-update map; the index
    # table only needs to cover the fragment window
    ggrid = sp.build_hash(sp.SparseVoxels(
        jnp.concatenate([jnp.zeros((gmap.coords.shape[0], 1), jnp.int32),
                         gmap.coords], axis=1),
        gmap.tsdf[:, None], gmap.valid), dim, offset=rel_origin)
    grows = sp.lookup(ggrid,
                      jnp.concatenate([jnp.zeros((capacity, 1), jnp.int32),
                                       u_coords + rel_origin[None, :]], axis=1),
                      u_valid)

    vox_inst, vox_sem, next_id = panoptic_instance_match(
        gmap, u_seg, seg_class, seg_isthing, seg_valid, grows, u_valid)

    # splice: keep out-of-window rows, append union rows
    g = gmap.coords.shape[0]
    keep = gmap.valid & ~in_win
    all_coords = jnp.concatenate([gmap.coords, u_coords + rel_origin[None, :]])
    all_tsdf = jnp.concatenate([gmap.tsdf, u_tsdf])
    all_inst = jnp.concatenate([gmap.instance, vox_inst])
    all_sem = jnp.concatenate([gmap.semantic, vox_sem])
    all_mask = jnp.concatenate([keep, u_valid])
    coords4 = jnp.concatenate([jnp.zeros((all_coords.shape[0], 1), jnp.int32),
                               all_coords], axis=1)
    svx, (t, i, s), ovf2 = sp.compact(all_mask, coords4, g,
                                      all_tsdf[:, None], all_inst[:, None],
                                      all_sem[:, None])
    new_map = PanopticGlobalMap(svx.coords[:, 1:], t[:, 0], i[:, 0].astype(jnp.int32),
                                s[:, 0].astype(jnp.int32), svx.valid, next_id)
    return new_map, overflow + ovf2
