"""Streaming incremental reconstruction pipeline.

The online API the reference exposes through its stateful fuse_to_global
module (reference models/neuralrecon.py:71-72, models/gru_fusion.py:259-394
direct-substitute mode + main.py:351-411 test loop): feed fragments of one
scene in temporal order; the global panoptic TSDF volume grows; a scene
change flushes the finished scene to a mesh and resets state.

Host-side control flow (scene-name compare / flush / reset) stays in Python;
the per-fragment compute (model forward + direct TSDF/panoptic fusion) is a
single jitted program.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from eprecon_tpu.config import Config
from eprecon_tpu.models.eprecon import (EPRecon, FragmentInputs,
                                        make_recurrent_state)
from eprecon_tpu.models.gru_fusion import PanopticGlobalDense, fuse_tsdf_direct
from eprecon_tpu.models.panoptic.post import panoptic_inference
from eprecon_tpu.ops import grid, sparse as sp


@dataclasses.dataclass
class SceneResult:
    """Finished-scene volumes (reference gru_fusion.py:217-257 save_mesh)."""
    name: str
    origin: np.ndarray        # [3] world origin of the dense crop
    voxel_size: float
    tsdf: np.ndarray          # [X, Y, Z]
    instance: np.ndarray      # [X, Y, Z] int32
    semantic: np.ndarray      # [X, Y, Z] int32
    # total voxels dropped by capacity compaction over the scene (the
    # reference warns + aborts at 1.5x cap, neucon_network.py:462-484)
    overflow: int = 0
    # fragments whose window fell outside the dense global volume and was
    # clamped (scene larger than model.global_extent)
    clipped: int = 0


def fragment_forward(model: EPRecon, cfg: Config, variables, imgs, frag,
                     rec_state, pmap_state, targets=None):
    """The complete per-fragment inference program as one pure function:
    model forward + panoptic post + direct-substitute global fusion
    (reference main.py:375-401 test step + gru_fusion.py:259-394).

    Shared by StreamingReconstructor (jitted with donated state) and
    inference.export (AOT jax.export serving artifact) so the serving
    artifact is the online path by construction.
    """
    # losses are computed against GT when targets are provided, exactly
    # as the reference test loop does (reference main.py:375-401)
    (outputs, losses, new_rec), _ = model.apply(
        variables, imgs, frag, rec_state, targets, mutable=["batch_stats"])
    seg = panoptic_inference(outputs["pred_logits"], outputs["pred_masks"],
                             outputs["panoptic_valid"])
    # scatter per-voxel segment ids back into the fragment window
    seg_window = sp.sparse_to_dense(
        outputs["coords"][:, 1:], seg.voxel_seg[:, None].astype(jnp.float32),
        outputs["valid"], tuple(cfg.model.n_vox))[..., 0].astype(jnp.int32)
    new_pmap = fuse_tsdf_direct(
        pmap_state, outputs["tsdf_window"], outputs["occupancy"],
        seg_window, seg.seg_class, seg.seg_isthing, seg.seg_valid,
        frag.rel_origins[-1])
    return outputs, losses, new_rec, new_pmap


class StreamingReconstructor:
    """Incremental panoptic reconstruction over a fragment stream."""

    def __init__(self, cfg: Config, variables):
        self.cfg = cfg
        self.model = EPRecon(cfg.model)
        self.variables = variables
        self.scene_name: Optional[str] = None
        self.global_origin: Optional[np.ndarray] = None
        self.last_losses = {}
        self._reset_state()
        # donate the recurrent/global state so volume updates are in-place
        self._fwd = jax.jit(self._forward, donate_argnums=(3, 4))

    def _reset_state(self):
        self.rec_state = make_recurrent_state(self.cfg.model)
        self.pmap_state = PanopticGlobalDense.empty(
            tuple(self.cfg.model.global_extent))
        # device-side overflow scalars, read back once per scene (a per-
        # fragment scalar readback costs ~30 ms through the relay)
        self._overflows = []
        self.clipped_fragments = 0

    def _forward(self, variables, imgs, frag, rec_state, pmap_state,
                 targets=None):
        return fragment_forward(self.model, self.cfg, variables, imgs, frag,
                                rec_state, pmap_state, targets)

    def process_fragment(self, scene: str, imgs: np.ndarray,
                         proj_matrices: np.ndarray, vol_origin: np.ndarray,
                         vol_origin_partial: np.ndarray,
                         world_to_aligned_camera: np.ndarray,
                         targets=None,
                         anchor: Optional[np.ndarray] = None
                         ) -> Optional[SceneResult]:
        """Feed one fragment. Returns the finished previous scene when the
        scene name changes (reference gru_fusion.py:280-286), else None.

        anchor: the scene's window-union anchor (data/scannet.py
        scene_anchor) — with cfg.model.scene_anchor == "window_union" the
        global volume anchors there, matching the training loop's placement
        exactly; without it (live streams where future fragments are
        unknown) the vol_origin scheme is the fallback."""
        finished = None
        if scene != self.scene_name:
            if self.scene_name is not None:
                finished = self.flush()
            self.scene_name = scene
            m = self.cfg.model
            if m.scene_anchor == "window_union" and anchor is not None:
                self.global_origin = grid.anchored_global_origin(
                    anchor, m.n_scales, m.voxel_size, m.origin_margin)
            else:
                self.global_origin = grid.scene_global_origin(
                    m.global_extent, m.n_vox, m.n_scales, m.voxel_size,
                    vol_origin, m.origin_margin)
            self._reset_state()

        rel = []
        for i in range(self.cfg.model.n_layer):
            interval = 2 ** (self.cfg.model.n_scales - i)
            vsz = self.cfg.model.voxel_size * interval
            rel.append(np.round(
                (vol_origin_partial - self.global_origin) / vsz).astype(np.int32))
        # scenes larger than the dense global volume: the in-graph clamp
        # would silently relocate this fragment (the reference's sparse map
        # grows unboundedly, gru_fusion.py:195-215) — count and warn instead
        fine_hi = (np.asarray(self.cfg.model.global_extent)
                   - np.asarray(self.cfg.model.n_vox))
        if (rel[-1] < 0).any() or (rel[-1] > fine_hi).any():
            self.clipped_fragments += 1
            if self.clipped_fragments == 1:
                import warnings

                warnings.warn(
                    f"scene '{scene}' exceeds the global volume "
                    f"(rel_origin {rel[-1].tolist()} outside [0, "
                    f"{fine_hi.tolist()}]); fragment clamped — raise "
                    f"model.global_extent for larger scenes")
        frag = FragmentInputs(
            jnp.asarray(proj_matrices), jnp.asarray(vol_origin_partial),
            jnp.asarray(world_to_aligned_camera), jnp.asarray(np.stack(rel)))
        if (self.cfg.model.transfer_images_uint8
                and np.asarray(imgs).dtype != np.uint8):
            imgs = np.clip(np.round(imgs), 0, 255).astype(np.uint8)
        outputs, losses, self.rec_state, self.pmap_state = self._fwd(
            self.variables, jnp.asarray(imgs), frag, self.rec_state,
            self.pmap_state, targets)
        self._overflows.append(outputs["overflow"])
        self.last_losses = losses  # device scalars; caller reads them lazily
        return finished

    def flush(self) -> Optional[SceneResult]:
        """Crop + return the current scene (reference save_mesh)."""
        pm = self.pmap_state
        mask = np.asarray(pm.mask)
        if not mask.any():
            return None
        occ = np.argwhere(mask)
        lo = occ.min(0)
        hi = occ.max(0) + 1
        sl = tuple(slice(l, h) for l, h in zip(lo, hi))
        vol_t = np.where(mask[sl], np.asarray(pm.tsdf)[sl], 1.0).astype(np.float32)
        vol_i = np.asarray(pm.instance)[sl]
        vol_s = np.asarray(pm.semantic)[sl]
        origin = self.global_origin + lo * self.cfg.model.voxel_size
        ovf = int(np.asarray(jnp.stack(self._overflows)).sum()) \
            if self._overflows else 0
        return SceneResult(self.scene_name, origin, self.cfg.model.voxel_size,
                           vol_t, vol_i, vol_s, overflow=ovf,
                           clipped=self.clipped_fragments)

    def snapshot(self) -> Optional[SceneResult]:
        """Current in-progress scene, without ending it — backs the
        save_incremental per-fragment export (reference utils.py:318-360)."""
        return self.flush()

    # ------------------------------------------------------------------
    # mid-scene session checkpointing (SURVEY §5: the reference never
    # persists its GRU global volumes — an online session dies with the
    # process; here the full streaming state round-trips through one file)
    # ------------------------------------------------------------------

    def save_session(self, path: str):
        """Serialize the in-progress scene state (recurrent feature volumes,
        panoptic global map, origin, overflow counters) to an .npz."""
        # bf16 → f32 for npz portability (exact widening; restore_session
        # casts back to the state tree's dtypes)
        widen = lambda a: (np.asarray(a, np.float32)
                           if str(a.dtype) == "bfloat16" else np.asarray(a))
        rec = jax.device_get(self.rec_state)
        pmap = jax.device_get(self.pmap_state)
        arrays = {f"rec_{i}": widen(leaf)
                  for i, leaf in enumerate(jax.tree_util.tree_leaves(rec))}
        arrays.update({f"pmap_{i}": widen(leaf)
                       for i, leaf in enumerate(jax.tree_util.tree_leaves(pmap))})
        np.savez_compressed(
            path, scene=np.asarray(self.scene_name or ""),
            origin=(self.global_origin if self.global_origin is not None
                    else np.full(3, np.nan, np.float32)),
            overflows=np.asarray([int(np.asarray(o)) for o in self._overflows],
                                 np.int64),
            clipped=np.asarray(self.clipped_fragments, np.int64),
            **arrays)

    def restore_session(self, path: str):
        """Resume a session saved by save_session; continuation is exact."""
        z = np.load(path)
        name = str(z["scene"])
        self.scene_name = name or None
        origin = z["origin"]
        self.global_origin = None if np.isnan(origin).any() else \
            np.asarray(origin, np.float32)
        rec_ref = make_recurrent_state(self.cfg.model)
        pmap_ref = PanopticGlobalDense.empty(tuple(self.cfg.model.global_extent))
        rec_def = jax.tree_util.tree_structure(rec_ref)
        pmap_def = jax.tree_util.tree_structure(pmap_ref)
        self.rec_state = jax.tree_util.tree_unflatten(
            rec_def, [jnp.asarray(z[f"rec_{i}"], ref.dtype) for i, ref in
                      enumerate(jax.tree_util.tree_leaves(rec_ref))])
        self.pmap_state = jax.tree_util.tree_unflatten(
            pmap_def, [jnp.asarray(z[f"pmap_{i}"], ref.dtype) for i, ref in
                       enumerate(jax.tree_util.tree_leaves(pmap_ref))])
        self._overflows = [jnp.asarray(v) for v in z["overflows"]]
        self.clipped_fragments = int(z["clipped"]) if "clipped" in z.files else 0
