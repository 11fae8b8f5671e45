"""Write synthetic scenes to disk in the exact ScanNet on-disk layout.

Produces everything the real-data path consumes — per-scene color jpgs,
depth pngs (uint16 millimeters), pose txts, intrinsic txts (the layout of
datasets/scannet/reader.py exports in the reference), plus the label export
files ({scene}_vert.npy / _sem_label.npy / _ins_label.npy, the format of
reference datasets/scannet/load_scannet_data.py:66-138) — so that
generate_gt → ScanNetDataset → train/test can be exercised end to end
without network access. Any layout/convention bug that would bite on real
ScanNet (fragment pkl schema, depth clamp, pose conventions, intrinsics
scaling) trips here first.

CLI:
  python -m eprecon_tpu.tools.make_synthetic_scannet --out /data/synthscan \
      --scenes 2 --frames 40
"""
from __future__ import annotations

import argparse
import os
from typing import Tuple

import numpy as np

from eprecon_tpu.data.synthetic import make_scene, orbit_poses, render_view


def _backproject_labeled_points(depth, intr, pose, sem, ins, stride=4):
    """Labeled world points from a rendered view (stand-in for the ScanNet
    mesh-vertex label export)."""
    h, w = depth.shape
    ys, xs = np.meshgrid(np.arange(0, h, stride), np.arange(0, w, stride),
                         indexing="ij")
    d = depth[ys, xs]
    ok = d > 0
    x = (xs[ok] - intr[0, 2]) * d[ok] / intr[0, 0]
    y = (ys[ok] - intr[1, 2]) * d[ok] / intr[1, 1]
    pts_c = np.stack([x, y, d[ok]], axis=1)
    pts_w = pts_c @ pose[:3, :3].T + pose[:3, 3]
    return pts_w, sem[ys, xs][ok], ins[ys, xs][ok]


def _color_intrinsics(depth_intr: np.ndarray, depth_hw: Tuple[int, int],
                      color_hw: Tuple[int, int]) -> np.ndarray:
    """Color intrinsics consistent with real ScanNet's 1296×968 vs 640×480
    split: x scales by w_c/w_d; y is laid out so that the loader's
    pad_scannet step (cy += 2 then treat h as 972, reference
    datasets/transforms.py:83-116) makes the padded color intrinsics exactly
    proportional to the depth intrinsics."""
    dh, dw = depth_hw
    ch, cw = color_hw
    sx = cw / dw
    pad = 4 if (ch, cw) == (968, 1296) else 0  # 968 → 972 vertical pad
    sy = (ch + pad) / dh
    intr = depth_intr.copy()
    intr[0, :] *= sx
    intr[1, :] *= sy
    intr[1, 2] -= pad / 2
    return intr


def write_scene(scans_dir: str, labels_dir: str, scene: str, seed: int = 0,
                n_frames: int = 40, image_hw: Tuple[int, int] = (480, 640),
                color_hw: Tuple[int, int] = None, n_rooms: int = 1):
    """image_hw is the DEPTH resolution (and color's, when color_hw is None).
    color_hw=(968, 1296) reproduces real ScanNet's split color/depth
    resolutions including the 968→972 pad relationship; n_rooms > 1 writes a
    walkthrough of doorway-connected rooms spanning several fragment
    windows."""
    import cv2

    from eprecon_tpu.data.synthetic import walkthrough_poses

    root = os.path.join(scans_dir, scene)
    for sub in ("color", "depth", "pose", "intrinsic"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    os.makedirs(labels_dir, exist_ok=True)

    # textured: large uniform surfaces blind the cross-view feature-variance
    # occupancy cue (see data/synthetic.Scene.textured); real ScanNet
    # surfaces are textured, so the on-disk protocol scenes are too
    sc = make_scene(seed, n_rooms=n_rooms, textured=True)
    h, w = image_hw
    f = 0.9 * w / 2
    intr = np.array([[f, 0, w / 2 - 0.5], [0, f, h / 2 - 0.5], [0, 0, 1]],
                    np.float32)
    color_intr = (intr if color_hw is None
                  else _color_intrinsics(intr, image_hw, color_hw))
    for name, k in (("intrinsic_color.txt", color_intr),
                    ("intrinsic_depth.txt", intr)):
        intr4 = np.eye(4, dtype=np.float32)
        intr4[:3, :3] = k
        np.savetxt(os.path.join(root, "intrinsic", name), intr4)

    if n_rooms > 1:
        poses = walkthrough_poses(n_frames, n_rooms)
    else:
        poses = orbit_poses(n_frames, start=0.0,
                            sweep=2 * np.pi * (n_frames - 1) / n_frames)
    all_pts, all_sem, all_ins = [], [], []
    for i in range(n_frames):
        depth, rgb, sem, ins = render_view(sc, intr, poses[i], image_hw)
        if color_hw is not None:
            _, rgb, _, _ = render_view(sc, color_intr, poses[i], color_hw)
        cv2.imwrite(os.path.join(root, "color", f"{i}.jpg"),
                    rgb.astype(np.uint8))
        cv2.imwrite(os.path.join(root, "depth", f"{i}.png"),
                    (depth * 1000.0).astype(np.uint16))
        np.savetxt(os.path.join(root, "pose", f"{i}.txt"), poses[i])
        if i % 4 == 0:
            p, s, ii = _backproject_labeled_points(depth, intr, poses[i],
                                                   sem, ins)
            all_pts.append(p)
            all_sem.append(s)
            all_ins.append(ii)

    pts = np.concatenate(all_pts).astype(np.float32)
    verts = np.concatenate([pts, np.zeros_like(pts)], axis=1)  # xyzrgb
    np.save(os.path.join(labels_dir, f"{scene}_vert.npy"), verts)
    np.save(os.path.join(labels_dir, f"{scene}_sem_label.npy"),
            np.concatenate(all_sem).astype(np.int32))
    np.save(os.path.join(labels_dir, f"{scene}_ins_label.npy"),
            np.concatenate(all_ins).astype(np.int32))
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True,
                    help="dataset root; scenes go under <out>/scans")
    ap.add_argument("--scenes", type=int, default=2)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--color_height", type=int, default=0,
                    help="968 + --color_width 1296 = real ScanNet split")
    ap.add_argument("--color_width", type=int, default=0)
    ap.add_argument("--rooms", type=int, default=1)
    args = ap.parse_args()

    scans = os.path.join(args.out, "scans")
    labels = os.path.join(args.out, "labels")
    color_hw = ((args.color_height, args.color_width)
                if args.color_height and args.color_width else None)
    for s in range(args.scenes):
        scene = f"scene{s:04d}_00"
        write_scene(scans, labels, scene, seed=s, n_frames=args.frames,
                    image_hw=(args.height, args.width), color_hw=color_hw,
                    n_rooms=args.rooms)
        print(f"{scene}: wrote {args.frames} frames")


if __name__ == "__main__":
    main()
