"""Production-scale quality loop on the TPU (VERDICT r3 #4).

Drives the FULL protocol at (near-)production shapes — synthetic multi-room
ScanNet-layout scenes at 480x640 depth / 96^3 windows / 4 cm voxels —
through the real CLIs: make_synthetic_scannet → generate_gt →
main.run_train (TPU) → main.run_test → per-scene F-score + PQ under the
label-transfer protocol (tools/evaluation.py:157-230). This is the closest
offline proxy to the reference's ScanNet benchmark
(/root/reference/tools/evaluation_utils.py:5-109).

  python tools_dev/production_quality_run.py [root] [epochs]

Phases are marker-file resumable; training polls EPRECON_STOP_FILE
(<root>/STOP) between steps so the run is sentinel-stoppable, never killed
(CLAUDE.md relay rule).
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

ROOT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prodq"
EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 40
N_TRAIN_SCENES, N_FRAMES, N_ROOMS = 3, 96, 2
MARGIN = 64  # minimum model.origin_margin (fine voxels)
# HBM-safe train-phase bounds (see scene_extent docstring): feature globals
# 384*320*224 bf16 = 1.7 GB next to the ~10.7 GB remat-light train step
TRAIN_CAP = (320, 256, 192)
TRAIN_CAP_MARGIN = 96
DATA = os.path.join(ROOT, "data")
SCANS = os.path.join(DATA, "scans")
LABELS = os.path.join(DATA, "labels")
CKPT = os.path.join(ROOT, "ckpt")
TESTLOG = os.path.join(ROOT, "test_out")
os.makedirs(ROOT, exist_ok=True)
os.environ.setdefault("EPRECON_STOP_FILE", os.path.join(ROOT, "STOP"))


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

    scenes = [f"scene{s:04d}_00" for s in range(N_TRAIN_SCENES + 1)]
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
    splits = {"train": scenes[:N_TRAIN_SCENES], "val": scenes[N_TRAIN_SCENES:],
              "test": scenes[N_TRAIN_SCENES:]}
    generate_all(SCANS, save_name="all_tsdf_9", voxel_size=0.04, n_views=9,
                 label_path=LABELS, splits=splits)


def scene_extent(train: bool = False):
    """(extent-string, margin) via the product sizing (data/extent.py) with
    this run's margin floor. Kept as a thin wrapper so the phases below can
    pass explicit overrides; `model.global_extent_auto true` does the same
    inside run_train/run_test."""
    import dataclasses

    from eprecon_tpu.config import default_config
    from eprecon_tpu.data.extent import fit_global_extent

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, origin_margin=MARGIN),
        train=dataclasses.replace(cfg.train, path=DATA, epochs=EPOCHS,
                                  n_views=9),
        test=dataclasses.replace(cfg.test, path=DATA, n_views=9))
    ext, margin = fit_global_extent(cfg, "train" if train else "test",
                                    cap=TRAIN_CAP,
                                    cap_margin=TRAIN_CAP_MARGIN)
    return "[" + ",".join(map(str, ext)) + "]", margin


def _cli(yaml, *overrides):
    cmd = [sys.executable, "-m", "eprecon_tpu.main", "--cfg",
           f"config/{yaml}"] + [str(x) for x in overrides]
    print("  $", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd="/root/repo")


def train():
    # short-run recipe: lr 1e-3 / accum 1 (the calibrated quality-loop
    # recipe, tests/quality_utils.py) + occ_init_threshold 0.05 (the init
    # head converges to its class prior before variance features become
    # discriminative; 0.3 empties every stage mask early in training)
    ext, margin = scene_extent(train=True)
    _cli("train.yaml", "train.path", DATA, "logdir", CKPT,
         "train.epochs", EPOCHS, "train.lr", "1e-3",
         "train.accumulation_steps", 1, "model.occ_init_threshold", 0.05,
         "train.n_workers", 2, "save_freq", 5,
         "model.global_extent", ext, "model.origin_margin", margin,
         "model.remat_mode", "full")


def test():
    import glob

    ckpts = sorted(glob.glob(os.path.join(CKPT, "model_*")))
    assert ckpts, f"no checkpoints under {CKPT}"
    ext, margin = scene_extent()
    _cli("test.yaml", "test.path", DATA, "logdir", TESTLOG,
         "loadckpt", ckpts[-1], "model.occ_init_threshold", 0.05,
         "test.n_workers", 2, "model.global_extent", ext,
         "model.origin_margin", margin)


def report():
    import glob

    out = {}
    for p in glob.glob(os.path.join(TESTLOG, "scenes", "*_metrics.json")):
        with open(p) as f:
            out[os.path.basename(p)[:-len("_metrics.json")]] = json.load(f)
    print(json.dumps(out, indent=2))
    with open(os.path.join(ROOT, "summary.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    phase("scenes", gen_scenes)
    phase("gt", gen_gt)
    phase("train", train)
    phase("test", test)
    report()
