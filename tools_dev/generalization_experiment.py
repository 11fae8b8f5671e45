"""Cross-scene generalization: train on several synthetic scenes, score on a
HELD-OUT scene the weights never saw.

The quality loop (tests/test_quality_pq.py, tools_dev/quality_pq_experiment.py)
trains and scores on the SAME scene — it proves the pipeline can fit, not
that the decoder learned transferable segmentation. This experiment trains
the tiny config round-robin over `n_train_scenes` box layouts (different
make_scene seeds, same class vocabulary: floor/wall stuff + box things, the
synthetic analogue of the reference's fixed ScanNet-20 vocabulary) and
reports mesh F-score + PQ-vs-GT (label-transfer protocol, reference
tools/generate_semantic_instance.py:54-80) on held-out layouts.

  python tools_dev/generalization_experiment.py [epochs] [report_every] \
      [n_train_scenes]

An epoch = one pass over every training scene (recurrent state reset per
scene, fragments in temporal order — the reference's contiguous-sampler
semantics, datasets/sampler.py:56-76). Held-out seeds are disjoint from
training seeds by construction.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from eprecon_tpu.models.eprecon import make_recurrent_state
from eprecon_tpu.train.loop import _scene_origin, fragment_to_device_args
from eprecon_tpu.train.state import create_train_state, make_train_step
from tests.quality_utils import (build_scene_and_fragments, score_vs_gt,
                                 tiny_cfg, train_state_to_variables)

TRAIN_SEEDS = (3, 5, 7, 13)
HELDOUT_SEEDS = (11, 17)


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    every = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    n_train = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cfg = tiny_cfg()

    train_scenes = []
    for s in TRAIN_SEEDS[:n_train]:
        scene, frags, samples = build_scene_and_fragments(cfg, scene_seed=s)
        origin = _scene_origin(cfg, samples[0])
        args = [fragment_to_device_args(cfg, smp, origin) for smp in samples]
        train_scenes.append((s, scene, frags, args))
    heldout = [(s, *build_scene_and_fragments(cfg, scene_seed=s)[:2])
               for s in HELDOUT_SEEDS]

    rec0 = make_recurrent_state(cfg.model)
    a0 = train_scenes[0][3][0]
    tstate, model, tx = create_train_state(
        cfg, jax.random.PRNGKey(0), (a0[0], a0[1], rec0, a0[2]),
        steps_per_epoch=len(train_scenes) * 3)
    step = make_train_step(model, tx, cfg)

    t0 = time.time()
    for ep in range(epochs):
        losses = []
        for _, _, _, args in train_scenes:
            rec = make_recurrent_state(cfg.model)
            for imgs, frag, targets in args:
                tstate, rec, metrics = step(tstate, imgs, frag, targets, rec)
                losses.append(float(metrics["total_loss"]))
        if (ep + 1) % every == 0 or ep + 1 == epochs:
            variables = train_state_to_variables(tstate)
            report = [f"epoch {ep+1:3d}  loss {np.mean(losses):.4f}"]
            sd, scene0, frags0 = train_scenes[0][0], train_scenes[0][1], \
                train_scenes[0][2]
            m = score_vs_gt(cfg, variables, frags0, scene0)
            report.append(f"train[{sd}] f {m['fscore']:.3f} PQ {m['PQ']:.3f}")
            for s, scene_h, frags_h in heldout:
                m = score_vs_gt(cfg, variables, frags_h, scene_h)
                report.append(f"held[{s}] f {m['fscore']:.3f} "
                              f"PQ {m['PQ']:.3f} SQ {m['SQ']:.3f} "
                              f"RQ {m['RQ']:.3f} "
                              f"inst {m['n_pred_inst']}/{m['n_gt_inst']}")
            print("  ".join(report) + f"  ({time.time()-t0:.0f}s)",
                  flush=True)

    import pickle
    with open("/tmp/generalization_params.pkl", "wb") as f:
        pickle.dump(jax.tree_util.tree_map(
            np.asarray, train_state_to_variables(tstate)), f)
    print("saved /tmp/generalization_params.pkl", flush=True)


if __name__ == "__main__":
    main()
