"""EPRecon-TPU core network: occupancy init → coarse-to-fine TSDF → panoptic.

TPU-native re-design of reference models/neucon_network.py:25-624 (NeuConNet)
and models/neuralrecon.py:19-86 (NeuralRecon). The core operates on ONE
fragment (batch=1); training loops fragments sequentially (matching the
reference's per-batch incremental GRU fusion) and shards scene streams over
the device mesh for data parallelism.

Channel plan (alpha=1, reference neucon_network.py:32-39):
  ch_init     = [80, 40, 24]     back-projected image feats per stage
  ch_in       = [80, 138, 74]    SPVCNN input (volume ⊕ upsampled prev)
  channels    = [96, 48, 24]     SPVCNN output (voxel branch)
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
from eprecon_tpu.models.blocks import Linear4xTrans, LinearResidual
from eprecon_tpu.models.gru_fusion import (FusionInputs, GlobalMapLevel,
                                           GRUFusionStep)
from eprecon_tpu.models.occupancy_init import OccupancyInitialization
from eprecon_tpu.models.panoptic.criterion import (PanopticTargets,
                                                   build_targets, set_criterion)
from eprecon_tpu.models.panoptic.decoder import MaskedTransformerDecoder
from eprecon_tpu.models.spvcnn import SPVCNN, build_plan
from eprecon_tpu.ops import sparse as sp
from eprecon_tpu.ops.back_project import back_project_mean
from eprecon_tpu.train.losses import occupancy_init_loss, tsdf_occ_loss


class FragmentInputs(NamedTuple):
    """One fragment's geometry (batch=1). Images are handled by the caller."""
    proj_matrices: jnp.ndarray          # [V, n_scales, 4, 4] world→pixel
    vol_origin_partial: jnp.ndarray     # [3] fragment world origin
    world_to_aligned_camera: jnp.ndarray  # [4, 4]
    rel_origins: jnp.ndarray            # [n_stages, 3] int32 — window origin in
                                        # level units rel. to the global map


class FragmentTargets(NamedTuple):
    """Dense GT windows per pyramid level l (0 = finest), as produced by the
    data pipeline (reference datasets/transforms.py:262-365)."""
    tsdf: Tuple[jnp.ndarray, ...]       # ([96^3], [48^3], [24^3])
    occ: Tuple[jnp.ndarray, ...]
    semantic: Optional[jnp.ndarray]     # [96^3] nyu40 ids (finest)
    instance: Optional[jnp.ndarray]     # [96^3] instance ids (finest)


class RecurrentState(NamedTuple):
    """Cross-fragment state (one scene stream). Reset at scene change."""
    gmaps: Tuple[GlobalMapLevel, ...]   # per stage (0 = coarse)
    tmaps: Tuple[GlobalMapLevel, ...]   # GT tsdf target maps per stage


class StageOutput(NamedTuple):
    coords: jnp.ndarray   # [K, 4] fine-unit coords of selected (occupied) voxels
    feats: jnp.ndarray    # [K, gru_channels] fused features at selected voxels
    tsdf: jnp.ndarray     # [K]
    occ: jnp.ndarray      # [K] logits
    valid: jnp.ndarray


def make_recurrent_state(cfg: ModelConfig) -> RecurrentState:
    gru_ch = gru_channel_plan(cfg)
    gmaps, tmaps = [], []
    for i in range(cfg.n_layer):
        gmaps.append(GlobalMapLevel.empty(cfg.global_capacity[i], gru_ch[i]))
        tmaps.append(GlobalMapLevel.empty(cfg.global_capacity[i], 1))
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
    """SubM conv + ReLU + residual + LN on a compacted sparse set
    (reference models/modules.py:469-482 SparseConv3d_Residual)."""
    features: int

    @nn.compact
    def __call__(self, feats, nmap, valid):
        w = self.param("kernel",
                       nn.initializers.xavier_uniform(), (27, feats.shape[-1], self.features))
        out = sp.sparse_conv_apply(feats, nmap, w, out_valid=valid)
        out = nn.relu(out)
        out = feats + out
        out = nn.LayerNorm()(out)
        return jnp.where(valid[:, None], out, 0.0)


class EPReconCore(nn.Module):
    """The per-fragment pipeline (reference NeuConNet.forward,
    neucon_network.py:230-624), batch=1, FUSION_ON + FULL."""
    cfg: ModelConfig
    use_running_average: bool = False

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
        gru_ch = gru_channel_plan(cfg)
        losses: Dict[str, jnp.ndarray] = {}
        outputs: Dict[str, Any] = {}

        # reshape per-view features to [V, 1, H, W, C] (batch=1)
        f2d = [f[:, None] for f in features2d]
        fop = [f[:, None] for f in features_occ_pano]
        origin_b = frag.vol_origin_partial[None, :]  # [1, 3]

        # ------------------------------------------------------------------
        # Occupancy initialization (reference neucon_network.py:239-342)
        # ------------------------------------------------------------------
        init_stage = cfg.init_stage
        init_interval = 2 ** (n_scales - init_stage)
        init_scale = n_scales - init_stage
        init_shape = tuple(v // init_interval for v in cfg.n_vox)  # 48^3

        proj_init = frag.proj_matrices[:, None, init_scale]  # [V, 1, 4, 4]
        occ_logits, init_mask, init_count = OccupancyInitialization(
            use_running_average=self.use_running_average, name="initialization")(
                f2d, origin_b, cfg.voxel_size, proj_init, init_shape,
                init_interval, cfg.min_view_number)
        occ_logits, init_mask = occ_logits[0], init_mask[0]  # batch=1
        init_ok = jnp.sum(init_mask.astype(jnp.int32)) >= 1000  # reference :107

        if only_train_init or targets is not None:
            # init loss vs GT at the init level (reference :270-291,626-662)
            tsdf_w = targets.tsdf[init_scale] if targets is not None else None
            if tsdf_w is not None:
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
        coarse_mask = dense3d.maxpool3d(occupied, 2 ** init_stage)  # 24^3
        coarse_mask = dense3d.erode(coarse_mask)
        coarse_mask = dense3d.dilate(coarse_mask)
        coarse_mask = dense3d.dilate(coarse_mask)

        frag_ok = init_ok

        # ------------------------------------------------------------------
        # Coarse-to-fine surface reconstruction (reference :347-511)
        # ------------------------------------------------------------------
        new_gmaps: List[GlobalMapLevel] = []
        new_tmaps: List[GlobalMapLevel] = []
        panoptic_feats: List[jnp.ndarray] = []
        panoptic_coords: List[jnp.ndarray] = []
        panoptic_valid: List[jnp.ndarray] = []
        pre: Optional[StageOutput] = None
        last_occ_target = None

        for i in range(cfg.n_layer):
            interval = 2 ** (n_scales - i)
            scale = n_scales - i
            dim = tuple(v // interval for v in cfg.n_vox)

            if i == 0:
                sv, overflow = sp.dense_to_sparse(
                    jnp.zeros((*dim, 0)), coarse_mask, cfg.voxel_capacity[0])
                up_coords = jnp.concatenate(
                    [sv.coords[:, :1], sv.coords[:, 1:] * interval], axis=1)
                up_valid = sv.valid
                up_feat = None
                min_views = cfg.min_view_number
            else:
                # upsample x8 (reference :193-214)
                off = sp.kernel_offsets(2) * interval
                child = (pre.coords[:, None, 1:] + jnp.asarray(off)[None]).reshape(-1, 3)
                up_coords = jnp.concatenate(
                    [jnp.repeat(pre.coords[:, :1], 8, axis=0), child], axis=1)
                up_valid = jnp.repeat(pre.valid, 8, axis=0)
                prev_feat = jnp.concatenate(
                    [pre.feats[:, :channels[i - 1]],
                     pre.tsdf[:, None], pre.occ[:, None]], axis=1)
                up_feat = jnp.repeat(prev_feat, 8, axis=0)
                min_views = 0

            # back-project image features (reference :363-374)
            proj_s = frag.proj_matrices[:, None, scale]
            volume, count = back_project_mean(up_coords, up_valid, origin_b,
                                              cfg.voxel_size, fop[scale], proj_s)
            if i == 0:
                vox_valid = up_valid & (count >= min_views)
            else:
                vox_valid = up_valid  # min_views=0 at later stages (reference
                # :361): unseen children keep zero image features

            feat = volume if up_feat is None else jnp.concatenate(
                [volume, up_feat], axis=1)

            # aligned-camera point coords (reference :386-398)
            world = up_coords[:, 1:].astype(jnp.float32) * cfg.voxel_size + \
                frag.vol_origin_partial[None, :]
            wh = jnp.concatenate([world, jnp.ones_like(world[:, :1])], axis=1)
            aligned = (frag.world_to_aligned_camera[:3] @ wh.T).T

            # sparse 3D U-Net (reference :400-402)
            vres = cfg.voxel_size * interval
            pts = sp.PointSet(aligned / vres, jnp.zeros_like(up_coords[:, 0]),
                              feat, vox_valid)
            plan = build_plan(pts, vres=1.0, window=cfg.point_window[i])
            feat3d = SPVCNN(cr=1.0 / 2 ** i, dropout=cfg.sparsereg_dropout,
                            use_running_average=self.use_running_average,
                            name=f"sp_conv_{i}")(feat, plan)

            feat_all = jnp.concatenate([feat3d, volume], axis=-1)  # [K, gru_ch]

            # GRU fusion (reference :406-409)
            tsdf_w = targets.tsdf[scale] if targets is not None else None
            occ_w = targets.occ[scale] if targets is not None else None
            fin = FusionInputs(frag.rel_origins[i], frag.vol_origin_partial,
                               frag.world_to_aligned_camera)
            fused = GRUFusionStep(
                ch_voxel=channels[i], ch_img=ch_init[i], interval=interval,
                voxel_size=cfg.voxel_size, dim=dim,
                capacity=cfg.stage_capacity[i],
                point_window=cfg.point_window[i], name=f"gru_fusion_{i}")(
                    up_coords, feat_all, vox_valid, state.gmaps[i],
                    state.tmaps[i], tsdf_w, occ_w, fin)
            new_gmaps.append(fused["gmap"])
            new_tmaps.append(fused["target_map"])
            u_coords, u_feats, u_valid = fused["coords"], fused["feats"], fused["valid"]
            feat = u_feats[:, :channels[i]]

            # heads (reference :414-415)
            tsdf = Linear4xTrans(1, name=f"tsdf_pred_{i}")(feat)[:, 0]
            occ = Linear4xTrans(1, name=f"occ_pred_{i}")(feat)[:, 0]

            # per-level loss (reference :442-451)
            if targets is not None:
                l = tsdf_occ_loss(tsdf, occ, fused["tsdf_target"],
                                  fused["occ_target"], u_valid, cfg.pos_weight)
                losses[f"tsdf_occ_loss_{i}"] = jnp.where(frag_ok, l, 0.0 * tsdf.sum())

            # occupancy selection (reference :453-501)
            occupancy = (occ > cfg.thresholds[i]) & u_valid
            n_occ = jnp.sum(occupancy.astype(jnp.int32))
            frag_ok = frag_ok & (n_occ >= 500)
            sel_cap = cfg.voxel_capacity[i]
            sel_sv, (sel_featall, sel_tsdf, sel_occ), sel_overflow = sp.compact(
                occupancy, u_coords, sel_cap, u_feats, tsdf[:, None], occ[:, None])
            if targets is not None:
                _, (sel_occ_target,), _ = sp.compact(
                    occupancy, u_coords, sel_cap,
                    fused["occ_target"][:, None].astype(jnp.float32))
                last_occ_target = sel_occ_target[:, 0] > 0
                frag_ok = frag_ok & (jnp.sum(last_occ_target.astype(jnp.int32)) > 0)

            pre = StageOutput(sel_sv.coords, sel_featall, sel_tsdf[:, 0],
                              sel_occ[:, 0], sel_sv.valid)
            panoptic_feats.append(sel_featall)
            panoptic_coords.append(sel_sv.coords)
            panoptic_valid.append(sel_sv.valid)

            if i == cfg.n_layer - 1:
                outputs["coords"] = sel_sv.coords
                outputs["tsdf"] = sel_tsdf[:, 0]
                outputs["valid"] = sel_sv.valid

        outputs["frag_ok"] = frag_ok
        new_state = RecurrentState(tuple(new_gmaps), tuple(new_tmaps))

        # ------------------------------------------------------------------
        # Panoptic stage (reference :516-622)
        # ------------------------------------------------------------------
        # cross-scale alignment: keep only coarse voxels that coincide with a
        # fine voxel rounded down to the coarse stride (reference :516-544)
        fine_c, fine_v = panoptic_coords[2], panoptic_valid[2]
        for p, stride in ((1, 2), (0, 4)):
            dimp = tuple(v // stride for v in cfg.n_vox)
            down = jnp.concatenate(
                [fine_c[:, :1], jnp.floor_divide(fine_c[:, 1:], stride)], axis=1)
            g = sp.build_hash(sp.SparseVoxels(
                down, jnp.zeros((down.shape[0], 0)), fine_v), dimp,
                offset=jnp.zeros(3, jnp.int32))
            q = jnp.concatenate(
                [panoptic_coords[p][:, :1],
                 jnp.floor_divide(panoptic_coords[p][:, 1:], stride)], axis=1)
            hit = sp.lookup(g, q, panoptic_valid[p]) >= 0
            panoptic_valid[p] = panoptic_valid[p] & hit

        # per-level feature transfer to the panoptic width (reference :547-548)
        pano_ch = cfg.panoptic.hidden_dim
        lvl_feats = []
        for p in range(3):
            f = Linear4xTrans(pano_ch, name=f"panoptic_pred_{p}")(panoptic_feats[p])
            lvl_feats.append(jnp.where(panoptic_valid[p][:, None], f, 0.0))

        # mask features: img2pano/occ2pano fusion is folded into the finest
        # transfer; 3 residual subM convs on the finest set (reference
        # modules.py:574-580 generate_mask_features)
        fine_grid = sp.build_hash(sp.SparseVoxels(
            fine_c, lvl_feats[2], fine_v), tuple(cfg.n_vox),
            offset=jnp.zeros(3, jnp.int32))
        nmap = sp.neighbor_map(fine_grid, fine_grid.voxels.coords,
                               fine_grid.voxels.valid, sp.kernel_offsets(3))
        mask_feats = fine_grid.voxels.feats
        for mi in range(3):
            mask_feats = SparseConvResidual(pano_ch, name=f"mask_feat_{mi}")(
                mask_feats, nmap, fine_grid.voxels.valid)
        # fine_grid rows are a permutation-compaction of the input set? No —
        # build_hash preserves row order, so mask_feats aligns with fine_c.

        dec = MaskedTransformerDecoder(
            num_classes=cfg.panoptic.num_classes,
            hidden_dim=pano_ch, num_queries=cfg.panoptic.num_queries,
            num_heads=cfg.panoptic.nheads,
            dim_feedforward=pano_ch * cfg.panoptic.dim_feedforward_mult,
            dec_layers=cfg.panoptic.dec_layers, name="panoptic")
        dec_out = dec([lvl_feats[0], lvl_feats[1], lvl_feats[2]],
                      [panoptic_coords[0][:, 1:], panoptic_coords[1][:, 1:],
                       fine_c[:, 1:]],
                      [panoptic_valid[0], panoptic_valid[1], fine_v],
                      mask_feats, tuple(cfg.n_vox))
        outputs["pred_logits"] = dec_out.pred_logits[-1]
        outputs["pred_masks"] = dec_out.pred_masks[-1]
        outputs["panoptic_coords"] = fine_c
        outputs["panoptic_valid"] = fine_v

        # panoptic loss gated to occ-target voxels (reference :589-605)
        if targets is not None and targets.semantic is not None:
            sem_w = targets.semantic.reshape(-1)
            ins_w = targets.instance.reshape(-1)
            dimf = tuple(cfg.n_vox)
            flat = (fine_c[:, 1] * dimf[1] + fine_c[:, 2]) * dimf[2] + fine_c[:, 3]
            flat = jnp.clip(flat, 0, sem_w.shape[0] - 1)
            sem_v = jnp.where(fine_v, sem_w[flat], 0).astype(jnp.int32)
            ins_v = jnp.where(fine_v, ins_w[flat], 0).astype(jnp.int32)
            sup = fine_v & (last_occ_target if last_occ_target is not None
                            else jnp.ones_like(fine_v))
            ptargets = build_targets(sem_v, ins_v, sup,
                                     cfg.panoptic.max_instances)
            pl = set_criterion(dec_out.pred_logits, dec_out.pred_masks, ptargets,
                               cfg.panoptic.class_weight, cfg.panoptic.mask_weight,
                               cfg.panoptic.dice_weight, cfg.panoptic.no_object_weight)
            losses["panoptic_loss"] = jnp.where(frag_ok, pl, 0.0 * dec_out.pred_masks.sum())

        return outputs, losses, new_state


class EPRecon(nn.Module):
    """Top module: dual backbones + core (reference models/neuralrecon.py)."""
    cfg: ModelConfig
    use_running_average: bool = False

    def normalize(self, imgs: jnp.ndarray) -> jnp.ndarray:
        """BGR mean/std normalization (reference neuralrecon.py:42-44)."""
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
        feats2d = MnasMulti(alpha, self.use_running_average,
                            name="backbone2d")(x)
        feats_op = MnasMulti(alpha, self.use_running_average,
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
