"""Shared helpers for the closed-loop quality tests and experiments.

Builds the tiny quality config + synthetic scene, reconstructs with trained
weights, and scores the reconstruction against analytic GT: mesh F-score
plus panoptic quality under the reference's label-transfer protocol
(predicted labels moved onto GT geometry by nearest neighbour before PQ —
reference tools/generate_semantic_instance.py:54-80 exports per-vertex
labels for exactly that benchmark treatment).

Used by tests/test_quality_loop.py, tests/test_quality_pq.py and
tools_dev/quality_pq_experiment.py so the three stay in lockstep.
"""
import dataclasses

import numpy as np

from eprecon_tpu.config import default_config


def tiny_cfg():
    cfg = default_config()
    pan = dataclasses.replace(cfg.model.panoptic, num_queries=16, dec_layers=2,
                              max_instances=8, hidden_dim=16, nheads=4,
                              min_instance_voxels=10)
    # abort floors scale with the window: the reference aborts at 500 of
    # ~15000+ candidate voxels (~3%, neucon_network.py:469-471); 50 of this
    # config's 512-voxel coarse window (~10%) sits ON the abort cliff and a
    # marginal occupancy prediction death-spirals (frag_ok gates every stage
    # loss off, permanently — observed collapsing by step 12).
    # occ_init_threshold 0.05: in the first ~30 steps the init head converges
    # to its class prior (sigmoid≈0.08 at ~5% positives, pos_weight 1.5)
    # BEFORE the variance features become discriminative; at the production
    # 0.3 threshold that empties every stage mask mid-training and the run
    # never recovers within the test budget.
    m = dataclasses.replace(
        cfg.model, n_vox=(32, 32, 32), voxel_size=0.12,
        voxel_capacity=(512, 2048, 8192), global_extent=(64, 64, 32),
        min_init_voxels=50, min_stage_voxels=10, occ_init_threshold=0.05,
        panoptic=pan)
    t = dataclasses.replace(cfg.train, lr=1e-3, accumulation_steps=1)
    return dataclasses.replace(cfg, model=m, train=t)


def build_scene_and_fragments(cfg, n_objects=3, n_views=5,
                              image_hw=(96, 128), seed=3,
                              angles=(0.0, 0.6, 1.2), scene_seed=3):
    """scene_seed picks the box layout (make_scene seed); `seed` keeps its
    historical role as the camera-jitter seed. Defaults reproduce the scene
    every trained floor was calibrated on (previously make_scene(n_objects)
    passed 3 POSITIONALLY into make_scene's seed slot — same layout, wrong
    knob; n_objects now really controls the box count)."""
    from eprecon_tpu.data.synthetic import make_fragment, make_scene

    scene = make_scene(seed=scene_seed, n_boxes=n_objects)
    frags = [make_fragment(n_views=n_views, image_hw=image_hw,
                           n_vox=cfg.model.n_vox,
                           voxel_size=cfg.model.voxel_size, seed=seed,
                           scene=scene, start_angle=a) for a in angles]
    samples = [dict(scene="s", imgs=d["imgs"],
                    proj_matrices=d["proj_matrices"],
                    vol_origin=d["vol_origin_partial"],
                    vol_origin_partial=d["vol_origin_partial"],
                    world_to_aligned_camera=d["world_to_aligned_camera"],
                    tsdf_list=d["tsdf_levels"], occ_list=d["occ_levels"],
                    semantic=d["semantic"], instance=d["instance"])
               for d in frags]
    return scene, frags, samples


def train_state_to_variables(tstate):
    return {"params": tstate.params,
            "batch_stats": tstate.batch_stats["batch_stats"],
            **({"buffers": tstate.batch_stats["buffers"]}
               if tstate.batch_stats.get("buffers") else {})}


def gt_on_grid(scene, frags, origin, dim, vsz):
    """GT tsdf/occupancy/labels fused on the reconstructed global grid."""
    import jax.numpy as jnp

    from eprecon_tpu.data.synthetic import voxel_labels
    from eprecon_tpu.ops import tsdf_fusion

    depths = np.concatenate([f["depths"] for f in frags])
    intr = np.concatenate([f["intrinsics"] for f in frags])
    poses = np.concatenate([f["poses"] for f in frags])
    t, w = tsdf_fusion.fuse_frames(
        jnp.asarray(depths), jnp.asarray(intr), jnp.asarray(poses),
        jnp.asarray(origin, jnp.float32), dim, vsz, margin=3)
    t, w = np.asarray(t), np.asarray(w)
    occ = (np.abs(t) < 0.999) & (w > 1)
    sem, ins = voxel_labels(scene, origin, vsz, dim)
    return t, occ, np.where(occ, sem, 0), np.where(occ, ins, 0)


def score_vs_gt(cfg, variables, frags, scene, verbose=False,
                return_result=False):
    """Reconstruct with `variables` and score F-score + PQ against GT.

    The F-score here compares marching-cubes meshes of the prediction and
    of GT re-fused on the full reconstructed grid — stricter than the
    per-fragment-window GT mesh (tests/test_quality_loop.py keeps the
    latter for its calibrated floor). With return_result=True also returns
    the SceneResult.
    """
    from eprecon_tpu.inference.mesh_export import marching_cubes
    from eprecon_tpu.inference.pipeline import StreamingReconstructor
    from eprecon_tpu.tools.evaluation_utils import (eval_mesh,
                                                    panoptic_quality,
                                                    transfer_labels_to_gt)

    recon = StreamingReconstructor(cfg, variables)
    for d in frags:
        recon.process_fragment("s", d["imgs"], d["proj_matrices"],
                               d["vol_origin_partial"],
                               d["vol_origin_partial"],
                               d["world_to_aligned_camera"])
    out = recon.flush()
    if out is None or not (np.abs(out.tsdf) < 1).any():
        m0 = dict(fscore=0.0, PQ=0.0, SQ=0.0, RQ=0.0,
                  n_pred_inst=0, n_gt_inst=-1)
        return (m0, out) if return_result else m0
    vsz = float(out.voxel_size)
    gt_tsdf, gt_occ, gt_sem, gt_ins = gt_on_grid(
        scene, frags, out.origin, out.tsdf.shape, vsz)
    m = {}
    pv, _, _ = marching_cubes(out.tsdf)
    gv, _, _ = marching_cubes(gt_tsdf) if (np.abs(gt_tsdf) < 1).any() else (
        np.zeros((0, 3)), None, None)
    m.update(eval_mesh(pv * vsz + out.origin, gv * vsz + out.origin,
                       threshold=0.15, down_sample=0.06))

    # label-transfer protocol: direct thin-shell voxel IoU between the two
    # grids is NOT the protocol and stays near zero even for visually
    # correct reconstructions (see tests/test_label_transfer.py)
    sel3 = gt_occ & (gt_ins > 0)
    ps, pi = transfer_labels_to_gt(out.semantic, out.instance, out.origin,
                                   sel3, out.origin, vsz)
    gt_i = gt_ins[sel3]
    gt_s = gt_sem[sel3]
    m["n_gt_inst"] = int(len(np.setdiff1d(np.unique(gt_i), [0])))
    m["n_pred_inst"] = int(len(np.setdiff1d(np.unique(out.instance), [0])))
    if not (pi > 0).any():
        m.update(PQ=0.0, SQ=0.0, RQ=0.0)
        return (m, out) if return_result else m

    if verbose:  # per-pair IoU diagnostics on the transferred labels
        for p in np.setdiff1d(np.unique(pi), [0]):
            pm_ = pi == p
            pc = np.bincount(ps[pm_]).argmax() if pm_.any() else -1
            best = max(((np.sum(pm_ & (gt_i == g))
                         / max(np.sum(pm_ | (gt_i == g)), 1), g)
                        for g in np.setdiff1d(np.unique(gt_i), [0])),
                       default=(0.0, -1))
            gc = (np.bincount(gt_s[gt_i == best[1]]).argmax()
                  if best[1] >= 0 else -1)
            print(f"    pred {p} (cls {pc}, {pm_.sum()} vox) best-IoU "
                  f"{best[0]:.3f} vs gt {best[1]} (cls {gc})", flush=True)

    def cls_map(seg, sem):
        out_m = {}
        for i in np.setdiff1d(np.unique(seg), [0]):
            vals = sem[seg == i]
            out_m[int(i)] = int(np.bincount(vals).argmax()) if len(vals) else 0
        return out_m

    m.update(panoptic_quality(pi, cls_map(pi, ps), gt_i, cls_map(gt_i, gt_s)))
    return (m, out) if return_result else m
