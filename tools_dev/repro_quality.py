"""Diagnose the quality-loop regression: train tiny config, print occupancy
stats per stage during training and at inference."""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np

from eprecon_tpu.config import default_config
from eprecon_tpu.data.synthetic import make_fragment, make_scene
from eprecon_tpu.models.eprecon import make_recurrent_state
from eprecon_tpu.train.loop import fragment_to_device_args, _scene_origin
from eprecon_tpu.train.state import create_train_state, make_train_step


def tiny_cfg():
    cfg = default_config()
    pan = dataclasses.replace(cfg.model.panoptic, num_queries=16, dec_layers=2,
                              max_instances=8, hidden_dim=16, nheads=4,
                              min_instance_voxels=10)
    m = dataclasses.replace(
        cfg.model, n_vox=(32, 32, 32), voxel_size=0.12,
        voxel_capacity=(512, 2048, 8192), global_extent=(64, 64, 32),
        min_init_voxels=50, min_stage_voxels=10, occ_init_threshold=0.05,
        panoptic=pan)
    t = dataclasses.replace(cfg.train, lr=1e-3, accumulation_steps=1)
    return dataclasses.replace(cfg, model=m, train=t)


cfg = tiny_cfg()
scene = make_scene(3)
frags = [make_fragment(n_views=5, image_hw=(96, 128), n_vox=cfg.model.n_vox,
                       voxel_size=cfg.model.voxel_size, seed=3, scene=scene,
                       start_angle=a) for a in (0.0, 0.6, 1.2)]
samples = []
for d in frags:
    samples.append(dict(
        scene="s", imgs=d["imgs"], proj_matrices=d["proj_matrices"],
        vol_origin=d["vol_origin_partial"],
        vol_origin_partial=d["vol_origin_partial"],
        world_to_aligned_camera=d["world_to_aligned_camera"],
        tsdf_list=d["tsdf_levels"], occ_list=d["occ_levels"],
        semantic=d["semantic"], instance=d["instance"]))

origin = _scene_origin(cfg, samples[0])
args = [fragment_to_device_args(cfg, s, origin) for s in samples]
rec0 = make_recurrent_state(cfg.model)
tstate, model, tx = create_train_state(
    cfg, jax.random.PRNGKey(0), (args[0][0], args[0][1], rec0, args[0][2]),
    steps_per_epoch=100)
step = make_train_step(model, tx, cfg)


# a probe forward that reports occupancy counts
import functools


@functools.partial(jax.jit)
def probe(params, bstats, imgs, frag, rec):
    variables = {"params": params, **bstats}
    (outputs, _, _), _ = model.apply(variables, imgs, frag, rec, None,
                                     mutable=["batch_stats"])
    return {k: outputs[k] for k in ("n_occ_0", "n_occ_1", "n_occ_2",
                                    "frag_ok", "overflow")}


rec = rec0
for it in range(36):
    i = it % len(args)
    if i == 0:
        rec = make_recurrent_state(cfg.model)
    imgs, frag, targets = args[i]
    tstate, rec, metrics = step(tstate, imgs, frag, targets, rec)
    if it % 6 == 0 or it >= 33:
        p = probe(tstate.params, tstate.batch_stats, imgs, frag,
                  make_recurrent_state(cfg.model))
        print(f"it {it:2d} loss {float(metrics['total_loss']):.3f} "
              f"tsdf0 {float(metrics.get('tsdf_occ_loss_0', np.nan)):.3f} "
              f"n_occ {int(p['n_occ_0'])}/{int(p['n_occ_1'])}/{int(p['n_occ_2'])} "
              f"frag_ok {bool(p['frag_ok'])}", flush=True)

from eprecon_tpu.inference.pipeline import StreamingReconstructor

variables = {"params": tstate.params,
             "batch_stats": tstate.batch_stats["batch_stats"],
             **({"buffers": tstate.batch_stats["buffers"]}
                if tstate.batch_stats.get("buffers") else {})}
recon = StreamingReconstructor(cfg, variables)
for d in frags:
    recon.process_fragment("s", d["imgs"], d["proj_matrices"],
                           d["vol_origin_partial"], d["vol_origin_partial"],
                           d["world_to_aligned_camera"])
pm = recon.pmap_state
print("pmap mask sum:", int(np.asarray(pm.mask).sum()),
      "tsdf<1:", int((np.abs(np.asarray(pm.tsdf)) < 1).sum()), flush=True)
out = recon.flush()
print("flush:", "None" if out is None else
      f"tsdf shape {out.tsdf.shape}", flush=True)

if out is not None:
    from eprecon_tpu.inference.mesh_export import marching_cubes
    from eprecon_tpu.tools.evaluation_utils import eval_mesh

    gt_verts = []
    for d in frags:
        t = d["tsdf_levels"][0]
        if (np.abs(t) < 1).any():
            v, _, _ = marching_cubes(t)
            gt_verts.append(v * cfg.model.voxel_size + d["vol_origin_partial"])
    gt_verts = np.concatenate(gt_verts)
    pv, _, _ = marching_cubes(out.tsdf)
    pred_verts = pv * out.voxel_size + out.origin
    m = eval_mesh(pred_verts, gt_verts, threshold=0.15, down_sample=0.06)
    print("metrics:", {k: round(float(x), 3) for k, x in m.items()}, flush=True)
