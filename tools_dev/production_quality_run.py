"""Production-scale quality loop on the TPU (VERDICT r3 #4, r4 #1/#8).

Drives the FULL protocol at (near-)production shapes — synthetic multi-room
ScanNet-layout scenes at 480x640 depth / 96^3 windows / 4 cm voxels —
through the real CLIs: make_synthetic_scannet → generate_gt →
main.run_train (TPU) → main.run_test → per-scene F-score + PQ under the
label-transfer protocol (tools/evaluation.py:157-230), aggregated over
N_HELDOUT held-out scenes (single-scene PQ swings on 1-2 instance flips).
This is the closest offline proxy to the reference's ScanNet benchmark
(/root/reference/tools/evaluation_utils.py:5-109).

  python tools_dev/production_quality_run.py [root] [epochs]

Robustness (all exercised by round-4 incidents):
- phases are marker-file resumable;
- training polls EPRECON_STOP_FILE (<root>/STOP) between steps, exported
  EXPLICITLY to the child env, so the run is sentinel-stoppable, never
  killed (the relay-wedge hazard, CLAUDE.md);
- EPRECON_MAX_RSS_GB makes the train loop self-checkpoint and exit 75 when
  the relay-client host-RSS leak nears the box's limit; the runner re-execs
  with resume=true until the epochs finish (round 4: 3 GB/epoch leak,
  OOM-kill at 130 GB).

Volume sizing: model.global_extent_auto with the default window-union
anchoring (cfg.model.scene_anchor) — per-(scene, epoch) anchors keep the
needed extent at the largest single-epoch window span, so TRAINING runs
with full geometric coverage (no clamped GRU writebacks). Round 4 trained
with clamped placements and quality tracked the train/eval placement
mismatch, not the model (PERF_NOTES 'Production-scale quality').
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

ROOT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prodq"
EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 40
N_TRAIN_SCENES, N_HELDOUT, N_FRAMES, N_ROOMS = 3, 3, 96, 2
MAX_RSS_GB = float(os.environ.get("EPRECON_MAX_RSS_GB", "48"))
MAX_RESTARTS = 50
DATA = os.path.join(ROOT, "data")
SCANS = os.path.join(DATA, "scans")
LABELS = os.path.join(DATA, "labels")
CKPT = os.path.join(ROOT, "ckpt")
TESTLOG = os.path.join(ROOT, "test_out")
os.makedirs(ROOT, exist_ok=True)

CHILD_ENV = {
    **os.environ,
    # ADVICE r4: export the sentinel explicitly — the documented safety
    # valve must reach the subprocess even if the parent env lacked it
    "EPRECON_STOP_FILE": os.path.join(ROOT, "STOP"),
    "EPRECON_MAX_RSS_GB": str(MAX_RSS_GB),
}


def marker(name):
    return os.path.join(ROOT, f".done_{name}")


def phase(name, fn):
    if os.path.exists(marker(name)):
        print(f"[{name}] already done", flush=True)
        return
    t0 = time.time()
    print(f"[{name}] running...", flush=True)
    fn()
    open(marker(name), "w").close()
    print(f"[{name}] done in {time.time()-t0:.0f}s", flush=True)


def gen_scenes():
    from eprecon_tpu.tools.make_synthetic_scannet import write_scene

    scenes = [f"scene{s:04d}_00" for s in range(N_TRAIN_SCENES + N_HELDOUT)]
    for s, scene in enumerate(scenes):
        write_scene(SCANS, LABELS, scene, seed=s, n_frames=N_FRAMES,
                    image_hw=(480, 640), n_rooms=N_ROOMS)
        print(f"  {scene} written", flush=True)
    st = os.path.join(DATA, "scans_test")
    if not os.path.exists(st):
        os.symlink(SCANS, st)


def gen_gt():
    from eprecon_tpu.tools.generate_gt import generate_all

    scenes = sorted(os.listdir(SCANS))
    splits = {"train": scenes[:N_TRAIN_SCENES],
              "val": scenes[N_TRAIN_SCENES:],
              "test": scenes[N_TRAIN_SCENES:]}
    generate_all(SCANS, save_name="all_tsdf_9", voxel_size=0.04, n_views=9,
                 label_path=LABELS, splits=splits)


def _cli(yaml, *overrides):
    cmd = [sys.executable, "-m", "eprecon_tpu.main", "--cfg",
           f"config/{yaml}"] + [str(x) for x in overrides]
    print("  $", " ".join(cmd), flush=True)
    return subprocess.run(cmd, cwd="/root/repo", env=CHILD_ENV).returncode


def train():
    # short-run recipe: lr 1e-3 / accum 1 (the calibrated quality-loop
    # recipe, tests/quality_utils.py) + occ_init_threshold 0.05 (the init
    # head converges to its class prior before variance features become
    # discriminative; 0.3 empties every stage mask early in training)
    args = ["train.yaml", "train.path", DATA, "logdir", CKPT,
            "train.epochs", EPOCHS, "train.lr", "1e-3",
            "train.accumulation_steps", 1, "model.occ_init_threshold", 0.05,
            "train.n_workers", 2, "save_freq", 5,
            "model.global_extent_auto", "true", "model.remat_mode", "full"]
    rc = _cli(*args)
    restarts = 0
    while rc == 75 and restarts < MAX_RESTARTS:  # RSS_RESTART_EXIT_CODE
        restarts += 1
        print(f"[train] RSS restart #{restarts} (resume)", flush=True)
        rc = _cli(*args, "resume", "true")
    if rc != 0:
        raise RuntimeError(f"train CLI failed with exit {rc}")


def test():
    import glob

    ckpts = sorted(glob.glob(os.path.join(CKPT, "model_*")))
    assert ckpts, f"no checkpoints under {CKPT}"
    rc = _cli("test.yaml", "test.path", DATA, "logdir", TESTLOG,
              "loadckpt", ckpts[-1], "model.occ_init_threshold", 0.05,
              "test.n_workers", 2, "model.global_extent_auto", "true")
    if rc != 0:
        raise RuntimeError(f"test CLI failed with exit {rc}")


def report():
    import glob

    import numpy as np

    scenes = {}
    for p in glob.glob(os.path.join(TESTLOG, "scenes", "*_metrics.json")):
        with open(p) as f:
            scenes[os.path.basename(p)[:-len("_metrics.json")]] = json.load(f)
    agg = {}
    if scenes:
        keys = [k for k, v in next(iter(scenes.values())).items()
                if isinstance(v, (int, float))]
        for k in keys:
            vals = [m[k] for m in scenes.values() if k in m]
            agg[k] = {"mean": float(np.mean(vals)),
                      "min": float(np.min(vals)),
                      "max": float(np.max(vals)), "n": len(vals)}
    out = {"scenes": scenes, "aggregate": agg,
           "protocol": {"epochs": EPOCHS, "n_train": N_TRAIN_SCENES,
                        "n_heldout": N_HELDOUT, "frames": N_FRAMES,
                        "rooms": N_ROOMS}}
    print(json.dumps(out, indent=2))
    with open(os.path.join(ROOT, "summary.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    phase("scenes", gen_scenes)
    phase("gt", gen_gt)
    phase("train", train)
    phase("test", test)
    report()
