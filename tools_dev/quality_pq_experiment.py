"""PQ-vs-GT training experiment (VERDICT round-2 Next #2).

Trains the quality-loop tiny config for N steps on one synthetic scene and
reports, at checkpoints, mesh F-score AND matched panoptic quality against
the analytic GT labels under the reference's label-transfer protocol
(tools/generate_semantic_instance.py:54-80) — shared scoring code in
tests/quality_utils.py (the regression floor lives in
tests/test_quality_pq.py, -m quality_pq).

  python tools_dev/quality_pq_experiment.py [steps] [report_every] [cpu|tpu]

PQ needs the classifier's softmax max-prob to clear the 0.3 keep threshold
(models/panoptic/post.py:34) before ANY instance is emitted — with 21
classes that starts at ~0.05, so PQ=0 for the first ~60 steps is expected,
not a bug. Measured 2026-08-17: PQ 0.493 at step 100 and step 200
(floor IoU 0.85-0.87, chair IoU 0.61-0.62, RQ 0.667).
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

if len(sys.argv) > 3 and sys.argv[3] == "tpu":
    pass  # axon sitecustomize default: the real TPU chip
else:
    jax.config.update("jax_platforms", "cpu")

import time

import numpy as np

from eprecon_tpu.models.eprecon import make_recurrent_state
from eprecon_tpu.train.loop import _scene_origin, fragment_to_device_args
from eprecon_tpu.train.state import create_train_state, make_train_step
from tests.quality_utils import (build_scene_and_fragments, score_vs_gt,
                                 tiny_cfg, train_state_to_variables)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    every = int(sys.argv[2]) if len(sys.argv) > 2 else 60
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
    t0 = time.time()
    variables = None
    for it in range(steps):
        i = it % len(args)
        if i == 0:
            rec = make_recurrent_state(cfg.model)
        imgs, frag, targets = args[i]
        tstate, rec, metrics = step(tstate, imgs, frag, targets, rec)
        if (it + 1) % every == 0 or it + 1 == steps:
            loss = float(metrics["total_loss"])
            pan = float(metrics.get("panoptic_loss", np.nan))
            variables = train_state_to_variables(tstate)
            m = score_vs_gt(cfg, variables, frags, scene, verbose=True)
            print(f"step {it+1:4d}  loss {loss:.4f}  pan {pan:.4f}  "
                  f"fscore {m.get('fscore', 0):.3f}  PQ {m.get('PQ', 0):.3f} "
                  f"SQ {m.get('SQ', 0):.3f}  RQ {m.get('RQ', 0):.3f}  "
                  f"inst {m.get('n_pred_inst', -1)}/{m.get('n_gt_inst', -1)}  "
                  f"({time.time()-t0:.0f}s)", flush=True)

    # persist final params for offline analysis (tiny checkpoint, ~MBs)
    import pickle

    with open("/tmp/pq_experiment_params.pkl", "wb") as f:
        pickle.dump(jax.tree_util.tree_map(np.asarray, variables), f)
    print("saved /tmp/pq_experiment_params.pkl", flush=True)


if __name__ == "__main__":
    main()
