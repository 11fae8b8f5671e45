#!/bin/bash
# End-to-end quickstart on synthetic ScanNet-layout data (no downloads, no
# GPU/TPU required — runs on CPU in ~15 min: set EPRECON_PLATFORM=cpu as
# below; on a TPU chip drop it and raise the shapes).
#
# This demonstrates the full flow (layout -> GT -> train -> streaming eval
# with meshes + F-score/PQ/depth metrics); ONE epoch of training leaves
# quality near-random by design — raise train.epochs (and the tiny shapes)
# for meaningful numbers, or see tools_dev/quality_pq_experiment.py for a
# calibrated training run (PQ 0.49 at step 100).
#
# The same four commands run real ScanNet: point --out at a directory
# prepared by `python -m eprecon_tpu.tools.download_scannet` +
# `tools.sens_reader`, skip step 1, and use the production config defaults
# (drop every `model.*`/tiny override below). See docs/MIGRATION.md for the
# reference-CLI equivalents of each step.
set -euo pipefail
OUT=${1:-/tmp/eprecon_quickstart}
export EPRECON_PLATFORM=${EPRECON_PLATFORM:-cpu}
TINY="model.n_vox [16,16,16] model.voxel_size 0.24 \
  model.voxel_capacity [128,512,2048] model.global_extent [48,48,24] \
  model.min_init_voxels 10 model.min_stage_voxels 5 \
  model.panoptic.num_queries 16 model.panoptic.dec_layers 2 \
  model.panoptic.max_instances 8 model.panoptic.hidden_dim 16 \
  model.panoptic.nheads 4"
cd "$(dirname "$0")/.."

# 1. synthetic capture in the exact on-disk ScanNet layout
#    (color/, depth/, pose/, intrinsic/ per scene + label PLYs)
python -m eprecon_tpu.tools.make_synthetic_scannet \
    --out "$OUT" --scenes 2 --frames 20 --height 120 --width 160
ln -sfn "$OUT/scans" "$OUT/scans_test"

# 2. GT fusion: TSDF pyramids + panoptic label volumes + fragment metas
#    (reference tools/tsdf_fusion/generate_gt.py equivalent)
python -m eprecon_tpu.tools.generate_gt \
    --data_path "$OUT/scans" --save_name all_tsdf_9 --voxel_size 0.24 \
    --n_views 9 --label_path "$OUT/labels"

# 3. train one epoch (auto-shards over all visible devices)
python -m eprecon_tpu.main --cfg config/train.yaml \
    train.path "$OUT" train.epochs 1 train.accumulation_steps 1 \
    logdir "$OUT/ckpt" resume False $TINY

# 4. streaming inference + evaluation from the trained checkpoint:
#    meshes + per-scene metrics (F-score, PQ, depth AbsRel/RMSE/δ<1.25)
python -m eprecon_tpu.main --cfg config/test.yaml \
    test.path "$OUT" loadckpt "$OUT/ckpt/model_000000" \
    logdir "$OUT/eval" test.eval_depth_frames 2 $TINY

echo "--- results ---"
ls "$OUT/eval/scenes"
python - "$OUT/eval/scenes" <<'EOF'
import json, glob, sys
for p in sorted(glob.glob(sys.argv[1] + "/*_metrics.json")):
    print(p, json.load(open(p)))
EOF
