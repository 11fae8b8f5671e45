"""Calibrate tests/test_quality_loop.py's F-score floor vs train steps.

The 36-step tiny-config trajectory is chaotic at the margin where the
occupancy heads first clear their keep thresholds: a codegen change
(conftest's XLA:CPU opt-0 flags, round 4) moved 36-step F-score
0.509 -> 0.26 (precision 0.99, recall collapsed — the surface is accurate
but incomplete). This sweeps step counts and scores the calibrated
window-GT F-score at each checkpoint so the regression test can sit at a
step count where the metric has left the marginal regime.

  python tools_dev/calibrate_quality_floor.py [steps...]
"""
import os
import sys

sys.path.insert(0, "/root/repo")

# CPU with the suite's codegen flags — env vars alone do NOT override the
# axon TPU registration (CLAUDE.md); jax.config must be set before backend
# use, exactly as tests/conftest.py does.
flags = os.environ.get("XLA_FLAGS", "")
for f in ("--xla_force_host_platform_device_count=8",
          "--xla_backend_optimization_level=0",
          "--xla_llvm_disable_expensive_passes=true"):
    if f.split("=")[0] not in flags:
        flags += " " + f
os.environ["XLA_FLAGS"] = flags.strip()

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from eprecon_tpu.models.eprecon import make_recurrent_state
from eprecon_tpu.train.loop import fragment_to_device_args, _scene_origin
from eprecon_tpu.train.state import create_train_state, make_train_step
from tests.quality_utils import (build_scene_and_fragments, score_vs_gt,
                                 tiny_cfg, train_state_to_variables)


def window_fscore(cfg, tstate, frags, scene):
    from eprecon_tpu.inference.mesh_export import marching_cubes
    from eprecon_tpu.tools.evaluation_utils import eval_mesh

    m, out = score_vs_gt(cfg, train_state_to_variables(tstate), frags, scene,
                         return_result=True)
    if out is None:
        return None, m
    gt_verts = []
    for d in frags:
        t = d["tsdf_levels"][0]
        if (np.abs(t) < 1).any():
            v, _, _ = marching_cubes(t)
            gt_verts.append(v * cfg.model.voxel_size + d["vol_origin_partial"])
    pv, _, _ = marching_cubes(out.tsdf)
    if len(pv) == 0:
        return {"fscore": 0.0}, m
    mw = eval_mesh(pv * out.voxel_size + out.origin,
                   np.concatenate(gt_verts), threshold=0.15, down_sample=0.06)
    return mw, m


def main():
    probe_at = sorted(int(s) for s in sys.argv[1:]) or [36, 48, 60, 72]
    cfg = tiny_cfg()
    scene, frags, samples = build_scene_and_fragments(cfg)
    origin = _scene_origin(cfg, samples[0])
    args = [fragment_to_device_args(cfg, s, origin) for s in samples]
    rec0 = make_recurrent_state(cfg.model)
    tstate, model, tx = create_train_state(
        cfg, jax.random.PRNGKey(0), (args[0][0], args[0][1], rec0, args[0][2]),
        steps_per_epoch=100)
    step = make_train_step(model, tx, cfg)

    rec = rec0
    for it in range(max(probe_at)):
        i = it % len(args)
        if i == 0:
            rec = make_recurrent_state(cfg.model)
        imgs, frag, targets = args[i]
        tstate, rec, metrics = step(tstate, imgs, frag, targets, rec)
        if it + 1 in probe_at:
            loss = float(metrics["total_loss"])
            mw, m = window_fscore(cfg, tstate, frags, scene)
            print(f"step {it+1}: loss {loss:.3f} window_fscore "
                  f"{mw and mw.get('fscore')} prec {mw and mw.get('prec')} "
                  f"recal {mw and mw.get('recal')} PQ {m and m.get('PQ')}",
                  flush=True)


if __name__ == "__main__":
    main()
