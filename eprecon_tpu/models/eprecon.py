"""EPRecon-TPU core network: occupancy init → coarse-to-fine TSDF → panoptic.

TPU-native re-design of reference models/neucon_network.py:25-624 (NeuConNet)
and models/neuralrecon.py:19-86 (NeuralRecon). The core operates on ONE
fragment (batch=1); training loops fragments sequentially (matching the
reference's per-batch incremental GRU fusion) and shards scene streams over
the device mesh for data parallelism.

Architecture stance — dense windows: every per-stage computation runs on the
fragment's dense window (24^3 / 48^3 / 96^3) with an active-voxel mask.
Masked dense conv == submanifold sparse conv exactly, and on TPU the dense
path is 100-1000x faster than gather-based sparse convs at fragment
densities (HBM gathers cost ~65 ns/row). Sparse capacity-padded sets appear
only at the panoptic stage (attention over compacted voxels) and in exports.

Channel plan (alpha=1, reference neucon_network.py:32-39):
  ch_init     = [80, 40, 24]     back-projected image feats per stage
  ch_in       = [80, 138, 74]    U-Net input (volume ⊕ upsampled prev)
  channels    = [96, 48, 24]     U-Net output (voxel branch)
  gru_channels= [176, 88, 48]    voxel ⊕ img branches fused by the GRU
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from eprecon_tpu.config import ModelConfig
from eprecon_tpu.models import dense3d
from eprecon_tpu.models.backbone import MnasMulti, get_depths
from eprecon_tpu.models.blocks import Linear4xTrans
from eprecon_tpu.models.gru_fusion import (DenseGlobalLevel, DenseGRUFusion,
                                           DenseTargetLevel,
                                           fuse_target_window)
from eprecon_tpu.models.occupancy_init import OccupancyInitialization
from eprecon_tpu.models.panoptic.criterion import build_targets, set_criterion
from eprecon_tpu.models.panoptic.decoder import MaskedTransformerDecoder
from eprecon_tpu.ops import sparse as sp
from eprecon_tpu.ops.back_project import back_project_window
from eprecon_tpu.ops.grid import dense_coords
from eprecon_tpu.train.losses import occupancy_init_loss, tsdf_occ_loss


class FragmentInputs(NamedTuple):
    """One fragment's geometry (batch=1). Images are handled by the caller."""
    proj_matrices: jnp.ndarray          # [V, n_scales, 4, 4] world→pixel
    vol_origin_partial: jnp.ndarray     # [3] fragment world origin
    world_to_aligned_camera: jnp.ndarray  # [4, 4]
    rel_origins: jnp.ndarray            # [n_stages, 3] int32 — window origin in
                                        # level units rel. to the global volume


class FragmentTargets(NamedTuple):
    """Dense GT windows per pyramid level l (0 = finest), as produced by the
    data pipeline (reference datasets/transforms.py:262-365)."""
    tsdf: Tuple[jnp.ndarray, ...]       # ([96^3], [48^3], [24^3])
    occ: Tuple[jnp.ndarray, ...]
    semantic: Optional[jnp.ndarray]     # [96^3] nyu40 ids (finest)
    instance: Optional[jnp.ndarray]     # [96^3] instance ids (finest)


class RecurrentState(NamedTuple):
    """Cross-fragment state (one scene stream). Reset at scene change."""
    gmaps: Tuple[DenseGlobalLevel, ...]   # per stage (0 = coarse)
    tmaps: Tuple[DenseTargetLevel, ...]   # GT tsdf target volumes per stage


def make_recurrent_state(cfg: ModelConfig) -> RecurrentState:
    gru_ch = gru_channel_plan(cfg)
    dtype = jnp.bfloat16 if cfg.global_dtype == "bfloat16" else jnp.float32
    gmaps, tmaps = [], []
    for i in range(cfg.n_layer):
        interval = 2 ** (cfg.n_scales - i)
        extent = tuple(v // interval for v in cfg.global_extent)
        gmaps.append(DenseGlobalLevel.empty(extent, gru_ch[i], dtype))
        tmaps.append(DenseTargetLevel.empty(extent))
    return RecurrentState(tuple(gmaps), tuple(tmaps))


def channel_plan(cfg: ModelConfig):
    alpha = cfg.backbone2d.alpha
    d = get_depths(alpha)
    ch_init = [d[4], d[3], d[2]]                  # [80, 40, 24]
    channels = [96, 48, 24]
    ch_in = [ch_init[0],
             channels[0] + ch_init[1] + 2,
             channels[1] + ch_init[2] + 2]        # [80, 138, 74]
    return ch_init, channels, ch_in


def gru_channel_plan(cfg: ModelConfig):
    ch_init, channels, _ = channel_plan(cfg)
    return [c + i for c, i in zip(channels, ch_init)]  # [176, 88, 48]


class SparseConvResidual(nn.Module):
    """SubM conv + ReLU + residual + LN on a masked dense window
    (reference models/modules.py:469-482 SparseConv3d_Residual)."""
    features: int

    @nn.compact
    def __call__(self, vol, mask):
        out = dense3d.SubMConv3dDense(self.features, 3)(vol, mask)
        out = nn.relu(out)
        out = vol + out
        # bf16 IO (f32 statistics): these run on full 96^3 windows
        out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)(out)
        return dense3d._mask3(out, mask)


def nearest_fine_in_cell(row_table: jnp.ndarray, coarse_coords: jnp.ndarray,
                         stride: int) -> jnp.ndarray:
    """Nearest active fine voxel per coarse voxel, exploiting cell alignment.

    The panoptic cross-scale gating keeps a coarse voxel only if a fine
    active voxel exists inside its stride^3 cell, so the reference's exact
    NN over all fine voxels (mask3dformer.py:358-369 cdist+argmin — ~400 ms
    at full scale) reduces to ONE gather over a cell-grouped index table:
    candidates are ordered by in-cell distance to the coarse voxel's corner
    and the first present one wins.

    row_table: [X, Y, Z] int32 fine-voxel row per cell (-1 empty);
    coarse_coords: [K, 3] fine-unit coords (multiples of stride).
    Returns [K] int32 rows into the fine set (0 where none — callers mask).
    """
    x, y, z = row_table.shape
    s = stride
    # group sub-cells into lanes: [X/s, Y/s, Z/s, s^3]
    t = row_table.reshape(x // s, s, y // s, s, z // s, s)
    t = t.transpose(0, 2, 4, 1, 3, 5).reshape((x // s) * (y // s) * (z // s),
                                              s ** 3)
    # order sub-cells by distance to the cell corner (the coarse position)
    deltas = np.stack(np.meshgrid(*([np.arange(s)] * 3), indexing="ij"),
                      -1).reshape(-1, 3)
    order = np.argsort((deltas ** 2).sum(1), kind="stable")
    t = t[:, jnp.asarray(order)]
    p = coarse_coords // s
    flat = (p[:, 0] * (y // s) + p[:, 1]) * (z // s) + p[:, 2]
    flat = jnp.clip(flat, 0, t.shape[0] - 1)
    cand = t[flat]  # [K, s^3]
    first = jnp.argmax((cand >= 0).astype(jnp.int32), axis=1)
    row = jnp.take_along_axis(cand, first[:, None], axis=1)[:, 0]
    return jnp.maximum(row, 0)


def aligned_coord_features(dim: Tuple[int, int, int], interval: int,
                           voxel_size: float, origin_partial: jnp.ndarray,
                           world_to_aligned: jnp.ndarray) -> jnp.ndarray:
    """Aligned-camera coordinates of every window voxel, [X,Y,Z,3] (meters,
    scaled by 1/window-extent). Injected as input features in place of the
    reference's aligned-frame point voxelization (see models/unet_dense.py)."""
    coords = dense_coords(dim).astype(jnp.float32) * interval  # fine units
    world = coords * voxel_size + origin_partial
    wh = jnp.concatenate([world, jnp.ones_like(world[..., :1])], axis=-1)
    aligned = jnp.einsum("ij,xyzj->xyzi", world_to_aligned[:3], wh)
    scale = max(dim) * interval * voxel_size
    return aligned / scale


class EPReconCore(nn.Module):
    """The per-fragment pipeline (reference NeuConNet.forward,
    neucon_network.py:230-624), batch=1, FUSION_ON + FULL, dense windows."""
    cfg: ModelConfig
    use_running_average: bool = False
    debug_outputs: bool = False  # per-stage windows for golden-parity tests
                                 # (DCE'd by XLA when unused in production)

    @nn.compact
    def __call__(self, features2d: Sequence[jnp.ndarray],
                 features_occ_pano: Sequence[jnp.ndarray],
                 frag: FragmentInputs, state: RecurrentState,
                 targets: Optional[FragmentTargets] = None,
                 only_train_init: bool = False):
        """
        Args:
          features2d: 3 arrays [V, H_s, W_s, C_s] fine→coarse — recon backbone.
          features_occ_pano: same shapes — occupancy/panoptic backbone.
        Returns (outputs dict, loss dict, new RecurrentState).
        """
        cfg = self.cfg
        n_scales = cfg.n_scales
        ch_init, channels, ch_in = channel_plan(cfg)
        losses: Dict[str, jnp.ndarray] = {}
        outputs: Dict[str, Any] = {}

        f2d = [f[:, None] for f in features2d]   # [V, 1, H, W, C]
        fop = [f[:, None] for f in features_occ_pano]
        origin_b = frag.vol_origin_partial[None, :]

        # ------------------------------------------------------------------
        # Occupancy initialization (reference neucon_network.py:239-342)
        # ------------------------------------------------------------------
        init_stage = cfg.init_stage
        init_interval = 2 ** (n_scales - init_stage)
        init_scale = n_scales - init_stage
        init_shape = tuple(v // init_interval for v in cfg.n_vox)  # 48^3

        proj_init = frag.proj_matrices[:, None, init_scale]
        # remat granularity (cfg.remat_mode): "full" recomputes every 3D
        # module in the backward; "light"/"none" save the window activations
        # (A/B harness: tools_dev/bench_train_remat.py — run each mode in
        # its own process on the TPU before changing the default)
        remat3d = cfg.remat_mode == "full"
        occ_init_cls = (nn.remat(OccupancyInitialization,
                                 static_argnums=(5, 6, 7))
                        if remat3d else OccupancyInitialization)
        # "auto" resolves per BP site from the round-4 v5e A/B: sorted wins
        # only at the coarse stage's small-table/low-row-count shape
        bp_occ_init = "scatter" if cfg.bp_backward == "auto" else cfg.bp_backward
        occ_logits, init_mask, init_count = occ_init_cls(
            use_running_average=self.use_running_average,
            bp_backward=bp_occ_init, name="initialization")(
                f2d, origin_b, cfg.voxel_size, proj_init, init_shape,
                init_interval, cfg.min_view_number)
        occ_logits, init_mask = occ_logits[0], init_mask[0]  # batch=1
        init_ok = jnp.sum(init_mask.astype(jnp.int32)) >= cfg.min_init_voxels
        if self.debug_outputs:
            outputs["occ_init_logits"] = occ_logits
            outputs["occ_init_mask"] = init_mask

        if targets is not None:
            tsdf_w = targets.tsdf[init_scale]
            t_init = jnp.clip(1.0 - jnp.abs(tsdf_w), 0.0, 1.0)
            o_init = targets.occ[init_scale]
            l_init = occupancy_init_loss(occ_logits.reshape(-1),
                                         t_init.reshape(-1),
                                         o_init.reshape(-1),
                                         init_mask.reshape(-1))
            losses["occupancy_initialization_loss"] = jnp.where(
                init_ok, l_init, 0.0 * occ_logits.sum())
        if only_train_init:
            return outputs, losses, state

        # select + downsample to the coarse stage (reference :297-341)
        occupied = init_mask & (jax.nn.sigmoid(occ_logits) > cfg.occ_init_threshold)
        stage_mask = dense3d.maxpool3d(occupied, 2 ** init_stage)  # 24^3
        stage_mask = dense3d.erode(stage_mask)
        stage_mask = dense3d.dilate(stage_mask)
        stage_mask = dense3d.dilate(stage_mask)

        frag_ok = init_ok

        # ------------------------------------------------------------------
        # Coarse-to-fine surface reconstruction (reference :347-511)
        # ------------------------------------------------------------------
        new_gmaps: List[DenseGlobalLevel] = []
        new_tmaps: List[DenseTargetLevel] = []
        pano_feats_dense: List[jnp.ndarray] = []   # [X,Y,Z, gru_ch] per stage
        pano_masks: List[jnp.ndarray] = []
        pano_scores: List[jnp.ndarray] = []        # occ logits, per stage
        prev_feats = None  # dense [X,Y,Z, channels+2]
        final = {}

        for i in range(cfg.n_layer):
            interval = 2 ** (n_scales - i)
            scale = n_scales - i
            dim = tuple(v // interval for v in cfg.n_vox)

            if i > 0:
                # x8 upsample of the previous selection (reference :193-214)
                stage_mask = dense3d.upsample_nearest2(
                    stage_mask[..., None])[..., 0]
                prev_feats = dense3d.upsample_nearest2(prev_feats)
                min_views = 0
            else:
                min_views = cfg.min_view_number

            # back-project image features over the dense window
            proj_s = frag.proj_matrices[:, None, scale]
            bp_mode = (("sorted" if i == 0 else "scatter")
                       if cfg.bp_backward == "auto" else cfg.bp_backward)
            volume, count = back_project_window(
                dim, interval, origin_b, cfg.voxel_size, fop[scale], proj_s,
                bp_backward=bp_mode)
            if i == 0:
                stage_mask = stage_mask & (count >= min_views)
            if self.debug_outputs:
                outputs[f"bp_vol_{i}"] = volume
                outputs[f"bp_count_{i}"] = count
                outputs[f"stage_entry_{i}"] = stage_mask

            volume = volume.astype(jnp.bfloat16)
            feat = volume if prev_feats is None else jnp.concatenate(
                [volume, prev_feats.astype(jnp.bfloat16)], axis=-1)
            feat = jnp.where(stage_mask[..., None], feat, jnp.bfloat16(0))

            # aligned-camera coordinate features (see module docstring)
            ac = aligned_coord_features(dim, interval, cfg.voxel_size,
                                        frag.vol_origin_partial,
                                        frag.world_to_aligned_camera)
            from eprecon_tpu.models.unet_dense import DenseUNet

            # remat (mode "full"): recompute 96^3-window activations in the
            # backward pass instead of saving them
            unet_cls = nn.remat(DenseUNet) if remat3d else DenseUNet
            feat3d = unet_cls(
                cr=1.0 / 2 ** i, dropout=cfg.sparsereg_dropout,
                use_running_average=self.use_running_average,
                name=f"sp_conv_{i}")(
                jnp.concatenate([feat, ac.astype(jnp.bfloat16)], axis=-1),
                stage_mask)

            feat_all = jnp.concatenate([feat3d.astype(jnp.bfloat16), volume],
                                       axis=-1)  # [X,Y,Z, gru_ch] bf16

            # GRU fusion over the dense window (reference :406-409); remat is
            # applied INSIDE (conv compute only) so the global-map
            # slice/writeback is not recomputed in the backward pass
            fused, union, new_gmap = DenseGRUFusion(
                ch_voxel=channels[i], ch_img=ch_init[i], remat=remat3d,
                name=f"gru_fusion_{i}")(
                    feat_all, stage_mask, state.gmaps[i], frag.rel_origins[i])
            new_gmaps.append(new_gmap)
            if self.debug_outputs:
                outputs[f"stage_unet_{i}"] = feat3d
                outputs[f"stage_fused_{i}"] = fused
                outputs[f"stage_union_{i}"] = union

            if targets is not None:
                tsdf_t, occ_t, new_tmap = fuse_target_window(
                    state.tmaps[i], targets.tsdf[scale], targets.occ[scale],
                    frag.rel_origins[i])
            else:
                tsdf_t = occ_t = None
                new_tmap = state.tmaps[i]
            new_tmaps.append(new_tmap)

            # heads (reference :414-415) on the dense window
            # tsdf/occ heads stay f32: in bf16 their gradient noise collapses
            # occupancy selection during early training (n_occ → 0 by step 12
            # on the tiny quality-loop config — the occ head is the sole
            # source of the stage losses, so the collapse is irrecoverable)
            feat_v = fused[..., :channels[i]].astype(jnp.float32)
            tsdf = Linear4xTrans(1, name=f"tsdf_pred_{i}")(feat_v)[..., 0]
            occ = Linear4xTrans(1, name=f"occ_pred_{i}")(feat_v)[..., 0]

            if targets is not None:
                l = tsdf_occ_loss(tsdf.reshape(-1), occ.reshape(-1),
                                  tsdf_t.reshape(-1), occ_t.reshape(-1),
                                  union.reshape(-1), cfg.pos_weight)
                losses[f"tsdf_occ_loss_{i}"] = jnp.where(frag_ok, l,
                                                         0.0 * tsdf.sum())

            # occupancy selection (reference :453-501)
            occupancy = (occ > cfg.thresholds[i]) & union
            n_occ = jnp.sum(occupancy.astype(jnp.int32))
            frag_ok = frag_ok & (n_occ >= cfg.min_stage_voxels)
            outputs[f"n_occ_{i}"] = n_occ  # reference logs 'no valid points'
            if self.debug_outputs:
                outputs[f"stage_tsdf_{i}"] = tsdf
                outputs[f"stage_occ_{i}"] = occ
                outputs[f"occupancy_{i}"] = occupancy

            pano_feats_dense.append(jnp.where(occupancy[..., None], fused, 0.0))
            pano_masks.append(occupancy)
            # occ logits order capacity-overflow truncation by confidence
            # (stop_gradient: selection order must not leak gradients)
            pano_scores.append(jax.lax.stop_gradient(occ))

            if i == cfg.n_layer - 1:
                final = dict(tsdf=tsdf, occupancy=occupancy,
                             occ_target=occ_t)
                outputs["tsdf_window"] = jnp.where(occupancy, tsdf, 1.0)
                outputs["occupancy"] = occupancy
            else:
                stage_mask = occupancy
                prev_feats = jnp.concatenate(
                    [feat_v, tsdf[..., None], occ[..., None]], axis=-1)
                prev_feats = jnp.where(occupancy[..., None], prev_feats, 0.0)

        outputs["frag_ok"] = frag_ok
        new_state = RecurrentState(tuple(new_gmaps), tuple(new_tmaps))

        # ------------------------------------------------------------------
        # Panoptic stage (reference :516-622)
        # ------------------------------------------------------------------
        # cross-scale alignment (reference :516-544): coarse voxels must
        # coincide with a fine voxel rounded to the coarse stride — on dense
        # windows that's a maxpool of the fine mask
        fine_mask = pano_masks[2]
        pano_masks[1] = pano_masks[1] & dense3d.maxpool3d(fine_mask, 2)
        pano_masks[0] = pano_masks[0] & dense3d.maxpool3d(fine_mask, 4)

        # per-level transfer to the panoptic width (reference :547-548)
        pano_ch = cfg.panoptic.hidden_dim
        lvl_dense = []
        for p in range(3):
            f = Linear4xTrans(pano_ch, dtype=jnp.bfloat16,
                              name=f"panoptic_pred_{p}")(pano_feats_dense[p])
            lvl_dense.append(jnp.where(pano_masks[p][..., None], f,
                                       jnp.bfloat16(0)))

        # mask features: 3 residual subM convs on the finest window
        # (reference modules.py:574-580), dense then compacted once
        mf = lvl_dense[2]
        for mi in range(3):
            mf = SparseConvResidual(pano_ch, name=f"mask_feat_{mi}")(mf, fine_mask)

        # compact each level to its static capacity for the decoder; the
        # fine level packs [pano feats ⊕ mask feats ⊕ tsdf] into ONE
        # compaction (each full-window gather costs ~8 ms)
        caps = cfg.voxel_capacity
        lvl_feats, lvl_coords, lvl_valid = [], [], []
        overflow = jnp.zeros((), jnp.int32)
        for p in range(2):
            stride = 2 ** (n_scales - p)
            svx, ovf = sp.dense_to_sparse(lvl_dense[p], pano_masks[p], caps[p],
                                          score=pano_scores[p])
            lvl_feats.append(svx.feats)
            lvl_coords.append(svx.coords[:, 1:] * stride)  # fine units
            lvl_valid.append(svx.valid)
            overflow = overflow + ovf
        # bf16 feats and f32 tsdf ride the same compaction order as separate
        # arrays — concatenating them would promote the 884k x 97 pack table
        # to f32 (2x the HBM traffic of the pack+gather)
        n_fine = int(np.prod(cfg.n_vox))
        fine_coords = jnp.concatenate(
            [jnp.zeros((n_fine, 1), jnp.int32),
             dense_coords(tuple(cfg.n_vox)).reshape(-1, 3)], axis=1)
        fine_sv, (fine_feats, fine_tsdf), ovf = sp.compact(
            pano_masks[2].reshape(-1), fine_coords, caps[2],
            jnp.concatenate([lvl_dense[2], mf], axis=-1).reshape(n_fine, -1),
            outputs["tsdf_window"].reshape(n_fine, 1),
            score=pano_scores[2].reshape(-1))
        lvl_feats.append(fine_feats[:, :pano_ch])
        lvl_coords.append(fine_sv.coords[:, 1:])
        lvl_valid.append(fine_sv.valid)
        mask_feats = fine_feats[:, pano_ch:2 * pano_ch]
        outputs["coords"] = fine_sv.coords
        outputs["tsdf"] = fine_tsdf[:, 0]
        outputs["valid"] = fine_sv.valid
        outputs["overflow"] = overflow + ovf

        # O(1) nearest-fine rows via cell alignment (see nearest_fine_in_cell)
        fine_rows = sp.sparse_to_dense(
            fine_sv.coords[:, 1:],
            jnp.arange(fine_sv.coords.shape[0], dtype=jnp.float32)[:, None],
            fine_sv.valid, tuple(cfg.n_vox), default=-1.0)[..., 0].astype(jnp.int32)
        mask_idx = [
            nearest_fine_in_cell(fine_rows, lvl_coords[0], 4),
            nearest_fine_in_cell(fine_rows, lvl_coords[1], 2),
            jnp.arange(fine_sv.coords.shape[0], dtype=jnp.int32),
        ]

        dec_cls = (nn.remat(MaskedTransformerDecoder, static_argnums=(5,))
                   if remat3d else MaskedTransformerDecoder)
        dec = dec_cls(
            num_classes=cfg.panoptic.num_classes,
            hidden_dim=pano_ch, num_queries=cfg.panoptic.num_queries,
            num_heads=cfg.panoptic.nheads,
            dim_feedforward=pano_ch * cfg.panoptic.dim_feedforward_mult,
            dec_layers=cfg.panoptic.dec_layers, name="panoptic")
        dec_out = dec(lvl_feats, lvl_coords, lvl_valid, mask_feats,
                      tuple(cfg.n_vox), mask_idx=mask_idx)
        outputs["pred_logits"] = dec_out.pred_logits[-1]
        outputs["pred_masks"] = dec_out.pred_masks[-1]
        outputs["panoptic_coords"] = fine_sv.coords
        outputs["panoptic_valid"] = fine_sv.valid

        # panoptic loss gated to occ-target voxels (reference :589-605)
        if targets is not None and targets.semantic is not None:
            fc = fine_sv.coords[:, 1:]
            sem_v = targets.semantic[fc[:, 0], fc[:, 1], fc[:, 2]]
            ins_v = targets.instance[fc[:, 0], fc[:, 1], fc[:, 2]]
            occ_t_v = final["occ_target"][fc[:, 0], fc[:, 1], fc[:, 2]]
            sup = fine_sv.valid & occ_t_v
            ptargets = build_targets(jnp.where(sup, sem_v, 0).astype(jnp.int32),
                                     jnp.where(sup, ins_v, 0).astype(jnp.int32),
                                     sup, cfg.panoptic.max_instances,
                                     cfg.panoptic.min_instance_voxels)
            pl = set_criterion(dec_out.pred_logits, dec_out.pred_masks, ptargets,
                               cfg.panoptic.class_weight, cfg.panoptic.mask_weight,
                               cfg.panoptic.dice_weight,
                               cfg.panoptic.no_object_weight)
            losses["panoptic_loss"] = jnp.where(frag_ok, pl,
                                                0.0 * dec_out.pred_masks.sum())

        return outputs, losses, new_state


class EPRecon(nn.Module):
    """Top module: dual backbones + core (reference models/neuralrecon.py)."""
    cfg: ModelConfig
    use_running_average: bool = False

    def normalize(self, imgs: jnp.ndarray) -> jnp.ndarray:
        """BGR mean/std normalization (reference neuralrecon.py:42-44).

        Accepts uint8 images too: callers may transfer pixels as uint8 (4x
        less host->device relay volume AND 4x slower relay-client RSS
        retention — PERF_NOTES 'Host-RSS leak') and the cast to f32 happens
        on device."""
        if jnp.issubdtype(imgs.dtype, jnp.integer):
            imgs = imgs.astype(jnp.float32)
        mean = jnp.asarray(self.cfg.pixel_mean)
        std = jnp.asarray(self.cfg.pixel_std)
        return (imgs - mean) / std

    @nn.compact
    def __call__(self, imgs: jnp.ndarray, frag: FragmentInputs,
                 state: RecurrentState,
                 targets: Optional[FragmentTargets] = None,
                 only_train_init: bool = False):
        """imgs: [V, H, W, 3] BGR float; returns (outputs, losses, state)."""
        x = self.normalize(imgs)
        alpha = self.cfg.backbone2d.alpha
        bb_cls = (MnasMulti if self.cfg.remat_mode == "none"
                  else nn.remat(MnasMulti))
        feats2d = bb_cls(alpha, self.use_running_average, name="backbone2d")(x)
        feats_op = bb_cls(alpha, self.use_running_average,
                          name="backbone_occ_pano")(x)
        outputs, losses, new_state = EPReconCore(
            self.cfg, self.use_running_average, name="neucon_net")(
                feats2d, feats_op, frag, state, targets, only_train_init)

        # weighted total (reference neuralrecon.py:79-84, LW applied in dict
        # insertion order over the 4 loss keys)
        order = ["occupancy_initialization_loss", "tsdf_occ_loss_0",
                 "tsdf_occ_loss_1", "tsdf_occ_loss_2", "panoptic_loss"]
        lw = {"tsdf_occ_loss_0": self.cfg.lw[0], "tsdf_occ_loss_1": self.cfg.lw[1],
              "tsdf_occ_loss_2": self.cfg.lw[2],
              "panoptic_loss": self.cfg.lw[3] if len(self.cfg.lw) > 3 else 1.0,
              "occupancy_initialization_loss": 1.0}
        total = 0.0
        for k in order:
            if k in losses:
                total = total + lw[k] * losses[k]
        if losses:
            losses["total_loss"] = total
        return outputs, losses, new_state
