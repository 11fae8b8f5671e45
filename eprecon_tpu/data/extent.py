"""Dense-global-volume sizing from a dataset's actual window placements.

The reference's global map is an unbounded sparse union
(/root/reference/models/gru_fusion.py:91-98) and never needs sizing. Our
TPU-first design keeps the global scene state DENSE (static shapes, windowed
dynamic-slice updates), anchored at `scene_global_origin(vol_origin)` with
extent `cfg.model.global_extent` — so a scene larger than the volume, or a
fragment window placed outside it, hits the in-graph clamp and the
reconstruction is silently truncated (inference warns:
inference/pipeline.py clip detection).

This module sizes (extent, origin_margin) EXACTLY by replicating the data
pipeline's window placement (data/transforms.py RandomTransformSpace
.__call__ + ._window_and_gt) for every fragment meta:

- identity branch (test mode / no-GT inference): frustum-union xy center,
  absolute z = -0.2 m, vol_origin reported true;
- augmentation branch (train mode): the epoch-deterministic rotation /
  translation streams (rng(31)) are swept for every requested epoch.

Train-mode needs can be unaffordable (a rotated multi-room scene's diagonal
plus padding jitter measured [448,384,352] voxels / margin 184 ≈ 3.9 GB of
bf16 feature globals — OOM on a 16 GB v5e next to the ~10.7 GB train step),
so `cap` bounds the result: a capped volume only clamps the GRU global-map
writeback for outlier placements; per-fragment supervision is window-local
and stays exact.

Wire-up: set `model.global_extent_auto true` on the CLI and
run_train/run_test resolve the extent from the dataset before building the
model (eprecon_tpu/main.py).
"""
from __future__ import annotations

import glob
import os
import pickle
from typing import Optional, Sequence, Tuple

import numpy as np

# HBM-safe default cap for auto-sized TRAIN volumes (fine voxels). Measured
# on the 16 GB v5e: [384,320,224] at remat "light" RESOURCE_EXHAUSTED at the
# first full-scale train step (globals ~1.7 GB bf16 + step temps); this cap
# (~1.0 GB of globals) leaves the step its round-3-measured ~10.7 GB.
DEFAULT_TRAIN_CAP = (320, 256, 192)
DEFAULT_TRAIN_CAP_MARGIN = 96


def _pad_scannet_size(size, intr):
    """Size/intrinsics effect of transforms.pad_scannet (968 -> 972)."""
    h, w = size
    if (h, w) == (968, 1296):
        intr = intr.copy()
        intr[1, 2] += 2
        return (972, w), intr
    return size, intr


def fit_global_extent(cfg, mode: str, epochs: Optional[int] = None,
                      cap: Optional[Sequence[int]] = None,
                      cap_margin: Optional[int] = None,
                      round_to: int = 32) -> Tuple[Tuple[int, int, int], int]:
    """(global_extent, origin_margin) covering every fragment window.

    cfg: full Config (voxel size, n_vox, paddings, epochs, paths).
    mode: "train" sweeps the augmentation stream over `epochs`
    (default cfg.train.epochs) and applies `cap`; "test" sizes the identity
    placement of the test split exactly.
    """
    from eprecon_tpu.data.transforms import get_view_frustum

    m = cfg.model
    vs = float(m.voxel_size)
    win = np.asarray(m.n_vox)
    snap = 2 ** 3  # transforms.py RandomTransformSpace n_layers default
    train = mode == "train"
    epochs = epochs or cfg.train.epochs
    datapath = cfg.train.path if train else cfg.test.path
    augment = train and (cfg.train.random_rotation_3d
                         or cfg.train.random_translation_3d)

    # the transform's epoch-deterministic streams (RandomTransformSpace)
    rng = np.random.default_rng(31)
    rand_r = rng.random(999)
    rand_t = rng.random((999, 3))
    pad_start = np.array([cfg.train.pad_xy_3d, cfg.train.pad_xy_3d,
                          cfg.train.pad_z_3d])
    pad_end = np.array([cfg.train.pad_xy_3d, cfg.train.pad_xy_3d, 0.0])

    def window_org(frustum_pts, origin, dims_m, r, t3):
        """Window origin for one fragment under augmentation (r, t3), or the
        identity placement (r is None). Transforms the PER-VIEW frustum
        points — exactly what transforms.py does by applying T to the
        extrinsics before get_view_frustum — not a rotated union-AABB, whose
        bounds center can differ and cross the 8-voxel snap."""
        if r is None:
            T = np.eye(4)
            vol_origin = origin
        else:
            # r/t3 already encode the individual random_* flags (see sweep)
            R2 = np.array([[np.cos(r), -np.sin(r)], [np.sin(r), np.cos(r)]])
            xmin, ymin, zmin = origin
            xmax, ymax, zmax = origin + dims_m
            c2 = R2 @ np.array([[xmin, xmin, xmax, xmax],
                                [ymin, ymax, ymin, ymax]])
            start = np.array([c2[0].min(), c2[1].min(), zmin]) - pad_start
            end = (-dims_m + np.array([c2[0].max(), c2[1].max(), zmax])
                   + pad_end)
            t = t3 * start + (1 - t3) * end - origin
            T = np.eye(4)
            T[:2, :2] = R2
            T[:3, 3] = -t
            vol_origin = np.zeros(3)
        pts = T[:3, :3] @ frustum_pts + T[:3, 3:4]
        center = (np.array([(pts[0].min() + pts[0].max()) / 2,
                            (pts[1].min() + pts[1].max()) / 2, -0.2])
                  - vol_origin) / vs
        center[:2] = np.round(center[:2] / snap) * snap
        center[2] = np.floor(center[2] / snap) * snap
        return np.array([center[0] - win[0] // 2, center[1] - win[1] // 2,
                         center[2]])

    splits = ("train", "val") if train else ("test",)
    metas = []
    for split in splits:
        p = os.path.join(datapath, "all_tsdf_9", f"fragments_{split}.pkl")
        if not os.path.exists(p):
            p = os.path.join(datapath, f"fragments_{split}.pkl")
        if os.path.exists(p):
            with open(p, "rb") as f:
                metas += [(split, x) for x in pickle.load(f)]
    if not metas:
        raise FileNotFoundError(f"no fragment pkls under {datapath}")

    # mirror data/scannet.py source_path (scans_test may be a symlink)
    source = os.path.join(datapath, "scans_test" if not train else "scans")
    if not os.path.isdir(source):
        source = os.path.join(datapath, "scans")
    if not os.path.isdir(source):
        source = datapath
    lo = np.zeros(3)
    hi = np.zeros(3)
    cache = {}
    for split, meta in metas:
        scene = meta["scene"]
        if scene not in cache:
            sd = os.path.join(source, scene)
            intr = np.loadtxt(os.path.join(
                sd, "intrinsic", "intrinsic_color.txt"))[:3, :3]
            import cv2

            c0 = sorted(glob.glob(os.path.join(sd, "color", "*.jpg")))
            img = cv2.imread(c0[0])
            size, intr = _pad_scannet_size(img.shape[:2], intr)
            gt = os.path.join(datapath, "all_tsdf_9", scene,
                              "full_tsdf_layer0.npz")
            d = np.load(gt)
            dims = d[d.files[0]].shape
            cache[scene] = (sd, intr, size, np.asarray(dims))
        sd, intr, size, dims = cache[scene]
        pts = np.concatenate(
            [get_view_frustum(3.0, size, intr,
                              np.loadtxt(os.path.join(sd, "pose",
                                                      f"{fid}.txt")))
             for fid in meta["image_ids"]], axis=1)
        origin = np.asarray(meta["vol_origin"], np.float64)
        if augment:
            for ep in range(epochs):
                # per-flag streams exactly as RandomTransformSpace.__call__:
                # rotation off → r = 0; translation off → t = 0.5 (centered)
                r = (rand_r[ep] * 2 * np.pi
                     if cfg.train.random_rotation_3d else 0.0)
                t3 = (rand_t[ep]
                      if cfg.train.random_translation_3d else np.full(3, .5))
                org = window_org(pts, origin, dims * vs, r, t3)
                lo = np.minimum(lo, org)
                hi = np.maximum(hi, org + win)
        else:
            org = window_org(pts, origin, dims * vs, None, None)
            lo = np.minimum(lo, org)
            hi = np.maximum(hi, org + win)

    margin = int(np.ceil(max(0, -lo.min()) / snap) * snap)
    margin = max(margin, int(m.origin_margin))
    # guarantee scene_global_origin honors the FULL margin: it spends at most
    # half the slack (extent - window) below vol_origin, so extent must be at
    # least window + 2*margin per axis or the applied margin silently halves
    # and fragments relocate — the clamp-truncation bug this module exists to
    # prevent (round-4: train z-margin 96 silently became 48)
    need = [int(np.ceil(max(h, w + 2 * margin) / round_to) * round_to)
            for h, w in zip(hi + margin, win)]
    ext = need
    if train:
        cap = tuple(cap or DEFAULT_TRAIN_CAP)
        margin = min(margin, cap_margin or DEFAULT_TRAIN_CAP_MARGIN)
        ext = [min(e, c) for e, c in zip(ext, cap)]
        if ext != need:
            # per-axis margins scene_global_origin will actually apply
            applied = [min(margin, (e - w) // 2 // snap * snap)
                       for e, w in zip(ext, win)]
            print(f"fit_global_extent: train cap truncates coverage — "
                  f"need extent {need}, capped to {ext} (applied per-axis "
                  f"margins {applied} of requested {margin}); out-of-volume "
                  f"fragment windows will clamp (GRU writeback relocated)")
    return tuple(ext), margin
