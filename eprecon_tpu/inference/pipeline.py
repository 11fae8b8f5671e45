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
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from eprecon_tpu.config import Config
from eprecon_tpu.models.eprecon import (EPRecon, FragmentInputs,
                                        RecurrentState, make_recurrent_state)
from eprecon_tpu.models.gru_fusion import PanopticGlobalMap, fuse_tsdf_direct
from eprecon_tpu.models.panoptic.post import panoptic_inference


@dataclasses.dataclass
class SceneResult:
    """Finished-scene volumes (reference gru_fusion.py:217-257 save_mesh)."""
    name: str
    origin: np.ndarray        # [3] world origin of the dense crop
    voxel_size: float
    tsdf: np.ndarray          # [X, Y, Z]
    instance: np.ndarray      # [X, Y, Z] int32
    semantic: np.ndarray      # [X, Y, Z] int32


class StreamingReconstructor:
    """Incremental panoptic reconstruction over a fragment stream."""

    def __init__(self, cfg: Config, variables, global_capacity: Optional[int] = None):
        self.cfg = cfg
        self.model = EPRecon(cfg.model)
        self.variables = variables
        self.gcap = global_capacity or cfg.model.global_capacity[-1]
        self.scene_name: Optional[str] = None
        self.global_origin: Optional[np.ndarray] = None
        self._reset_state()
        self._fwd = jax.jit(self._forward)

    def _reset_state(self):
        self.rec_state = make_recurrent_state(self.cfg.model)
        self.pmap_state = PanopticGlobalMap.empty(self.gcap)

    def _forward(self, variables, imgs, frag, rec_state, pmap_state):
        (outputs, _, new_rec), _ = self.model.apply(
            variables, imgs, frag, rec_state, None, mutable=["batch_stats"])
        seg = panoptic_inference(outputs["pred_logits"], outputs["pred_masks"],
                                 outputs["panoptic_valid"])
        # gate panoptic ids to the final occupied voxel set (coords match)
        new_pmap, overflow = fuse_tsdf_direct(
            pmap_state, outputs["coords"], outputs["tsdf"], outputs["valid"],
            seg.voxel_seg, seg.seg_class, seg.seg_isthing, seg.seg_valid,
            frag.rel_origins[-1], tuple(self.cfg.model.n_vox),
            outputs["coords"].shape[0])
        return outputs, new_rec, new_pmap, overflow

    def process_fragment(self, scene: str, imgs: np.ndarray,
                         proj_matrices: np.ndarray, vol_origin: np.ndarray,
                         vol_origin_partial: np.ndarray,
                         world_to_aligned_camera: np.ndarray
                         ) -> Optional[SceneResult]:
        """Feed one fragment. Returns the finished previous scene when the
        scene name changes (reference gru_fusion.py:280-286), else None."""
        finished = None
        if scene != self.scene_name:
            if self.scene_name is not None:
                finished = self.flush()
            self.scene_name = scene
            self.global_origin = np.asarray(vol_origin, np.float32)
            self._reset_state()

        rel = []
        for i in range(self.cfg.model.n_layer):
            interval = 2 ** (self.cfg.model.n_scales - i)
            vsz = self.cfg.model.voxel_size * interval
            rel.append(np.round(
                (vol_origin_partial - self.global_origin) / vsz).astype(np.int32))
        frag = FragmentInputs(
            jnp.asarray(proj_matrices), jnp.asarray(vol_origin_partial),
            jnp.asarray(world_to_aligned_camera), jnp.asarray(np.stack(rel)))
        outputs, self.rec_state, self.pmap_state, overflow = self._fwd(
            self.variables, jnp.asarray(imgs), frag, self.rec_state,
            self.pmap_state)
        return finished

    def flush(self) -> Optional[SceneResult]:
        """Densify + return the current scene (reference save_mesh)."""
        pm = self.pmap_state
        valid = np.asarray(pm.valid)
        if not valid.any():
            return None
        coords = np.asarray(pm.coords)[valid]
        tsdf = np.asarray(pm.tsdf)[valid]
        inst = np.asarray(pm.instance)[valid]
        sem = np.asarray(pm.semantic)[valid]
        lo = coords.min(0)
        hi = coords.max(0)
        dim = hi - lo + 1
        vol_t = np.ones(dim, np.float32)
        vol_i = np.zeros(dim, np.int32)
        vol_s = np.zeros(dim, np.int32)
        idx = tuple((coords - lo).T)
        vol_t[idx] = tsdf
        vol_i[idx] = inst
        vol_s[idx] = sem
        origin = self.global_origin + lo * self.cfg.model.voxel_size
        return SceneResult(self.scene_name, origin, self.cfg.model.voxel_size,
                           vol_t, vol_i, vol_s)
