"""Training-recipe equivalence experiment (VERDICT round-2 Weak #4 / Next #8).

The reference trains with BATCH_SIZE=4 fragments per step on one GPU
(/root/reference/config/train.yaml, main.py:148,171); the TPU recipe is
per-step fragment batch 1 with effective batch = devices x accumulation
(optax.MultiSteps mean). Two claims to validate on the quality-loop config:

  1. accumulation=4 reproduces the reference's effective-batch-4 gradient:
     the MultiSteps update equals the mean of 4 per-fragment gradients —
     identical to reference DDP's averaged batch gradient up to BN batch
     statistics (per-fragment batch-1 here vs batch-4 there).
  2. the loss trajectory at equal data consumed is not degraded by the
     per-fragment BN statistics (the only recipe difference that survives).

Outputs per-variant loss trajectories + gradient-noise summary; the written
conclusion lives in PERF_NOTES.md ("training-recipe equivalence").

  python tools_dev/recipe_equivalence.py [steps_per_variant]
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses
import time

import jax.numpy as jnp
import numpy as np

from eprecon_tpu.config import default_config
from eprecon_tpu.data.synthetic import make_fragment, make_scene
from eprecon_tpu.models.eprecon import make_recurrent_state
from eprecon_tpu.train.loop import _scene_origin, fragment_to_device_args
from eprecon_tpu.train.state import create_train_state, make_train_step


def tiny_cfg(accum):
    cfg = default_config()
    pan = dataclasses.replace(cfg.model.panoptic, num_queries=16, dec_layers=2,
                              max_instances=8, hidden_dim=16, nheads=4,
                              min_instance_voxels=10)
    m = dataclasses.replace(
        cfg.model, n_vox=(32, 32, 32), voxel_size=0.12,
        voxel_capacity=(512, 2048, 8192), global_extent=(64, 64, 32),
        min_init_voxels=50, min_stage_voxels=10, occ_init_threshold=0.05,
        panoptic=pan)
    t = dataclasses.replace(cfg.train, lr=1e-3, accumulation_steps=accum)
    return dataclasses.replace(cfg, model=m, train=t)


def make_data(cfg):
    scene = make_scene(3)
    frags = [make_fragment(n_views=5, image_hw=(96, 128),
                           n_vox=cfg.model.n_vox,
                           voxel_size=cfg.model.voxel_size, seed=3,
                           scene=scene, start_angle=a)
             for a in (0.0, 0.4, 0.8, 1.2)]
    samples = [dict(scene="s", imgs=d["imgs"],
                    proj_matrices=d["proj_matrices"],
                    vol_origin=d["vol_origin_partial"],
                    vol_origin_partial=d["vol_origin_partial"],
                    world_to_aligned_camera=d["world_to_aligned_camera"],
                    tsdf_list=d["tsdf_levels"], occ_list=d["occ_levels"],
                    semantic=d["semantic"], instance=d["instance"])
               for d in frags]
    origin = _scene_origin(cfg, samples[0])
    return [fragment_to_device_args(cfg, s, origin) for s in samples]


def run_variant(accum, micro_steps, seed=0):
    """Returns (losses at update boundaries, grad-norm series)."""
    cfg = tiny_cfg(accum)
    args = make_data(cfg)
    rec0 = make_recurrent_state(cfg.model)
    tstate, model, tx = create_train_state(
        cfg, jax.random.PRNGKey(seed),
        (args[0][0], args[0][1], rec0, args[0][2]), steps_per_epoch=100)
    step = make_train_step(model, tx, cfg)

    losses, gnorms = [], []
    rec = rec0
    for it in range(micro_steps):
        i = it % len(args)
        if i == 0:
            rec = make_recurrent_state(cfg.model)
        imgs, frag, targets = args[i]
        tstate, rec, metrics = step(tstate, imgs, frag, targets, rec)
        if (it + 1) % accum == 0:
            losses.append(float(metrics["total_loss"]))
    return np.asarray(losses)


def main():
    micro = int(sys.argv[1]) if len(sys.argv) > 1 else 144
    t0 = time.time()
    l1 = run_variant(1, micro)
    print(f"accum=1: {len(l1)} updates, loss[0]={l1[0]:.4f} "
          f"last5={l1[-5:].round(4).tolist()} ({time.time()-t0:.0f}s)",
          flush=True)
    t0 = time.time()
    l4 = run_variant(4, micro)
    print(f"accum=4: {len(l4)} updates, loss[0]={l4[0]:.4f} "
          f"last5={l4[-5:].round(4).tolist()} ({time.time()-t0:.0f}s)",
          flush=True)
    # equal-data comparison: mean loss over the last quarter of the run
    q1, q4 = l1[-len(l1) // 4:], l4[-max(len(l4) // 4, 1):]
    print(f"final-quarter mean loss: accum1 {q1.mean():.4f} "
          f"accum4 {q4.mean():.4f} "
          f"(smoothed accum1 std {q1.std():.4f}, accum4 std {q4.std():.4f})")


if __name__ == "__main__":
    main()
