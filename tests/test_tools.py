"""Offline tools: keyframes, metrics, GT gen pieces, label export, ARKit."""
import numpy as np

from eprecon_tpu.tools import evaluation_utils as eu
from eprecon_tpu.tools import generate_gt as gg
from eprecon_tpu.tools import keyframes as kf
from eprecon_tpu.tools.process_arkit_data import (arkit_pose_to_scannet,
                                                  sync_by_timestamp)


def _pose(angle_deg=0.0, t=(0, 0, 0)):
    a = np.radians(angle_deg)
    p = np.eye(4)
    p[:2, :2] = [[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]]
    p[:3, 3] = t
    return p


def test_keyframe_selection():
    poses = [_pose(0), _pose(5), _pose(20), _pose(21),
             _pose(21, (0.2, 0, 0)), _pose(21, (0.25, 0, 0))]
    ids = kf.select_keyframes(poses, rmax_deg=15, tmax=0.1)
    # frame 0 always; frame 2 rotated 20 deg from 0; frame 4 moved 0.2 m
    assert ids == [0, 2, 4]
    bad = poses + [np.full((4, 4), np.nan)]
    assert kf.select_keyframes(bad, 15, 0.1) == [0, 2, 4]


def test_build_fragments():
    frags = kf.build_fragments("scene0", list(range(20)), np.zeros(3), 9)
    assert len(frags) == 2
    assert frags[0]["image_ids"] == list(range(9))
    assert frags[1]["fragment_id"] == 1


def test_eval_mesh_perfect_and_shifted(rng):
    pts = rng.uniform(0, 1, (2000, 3)).astype(np.float32)
    m = eu.eval_mesh(pts, pts.copy(), down_sample=0)
    assert m["fscore"] == 1.0 and m["dist1"] < 1e-6
    shifted = pts + np.array([0.5, 0, 0], np.float32)
    m2 = eu.eval_mesh(shifted, pts, down_sample=0)
    assert m2["fscore"] < 0.35


def test_eval_depth():
    gt = np.full((10, 10), 2.0, np.float32)
    pred = gt * 1.1
    m = eu.eval_depth(pred, gt)
    assert abs(m["AbsRel"] - 0.1) < 1e-5
    assert m["r1"] == 1.0


def test_panoptic_quality():
    gt = np.zeros(100, np.int32)
    gt[:50] = 1
    gt[50:] = 2
    pred = gt.copy()
    m = eu.panoptic_quality(pred, {1: 5, 2: 7}, gt, {1: 5, 2: 7})
    assert m["PQ"] == 1.0
    # wrong class on one segment → it can't match
    m2 = eu.panoptic_quality(pred, {1: 5, 2: 9}, gt, {1: 5, 2: 7})
    assert m2["tp"] == 1 and m2["fn"] == 1


def test_voxelize_labels_majority():
    pts = np.array([[0.05, 0.05, 0.05], [0.06, 0.04, 0.05], [0.05, 0.04, 0.06],
                    [0.5, 0.5, 0.5]], np.float32)
    labels = np.array([3, 3, 7, 9])
    vol = gg.voxelize_labels(pts, labels, np.zeros(3), 0.1, (8, 8, 8))
    assert vol[0, 0, 0] == 3  # majority vote
    assert vol[5, 5, 5] == 9
    assert vol[1, 1, 1] == 0


def test_interpolate_labels():
    vol = np.zeros((6, 6, 6), np.int32)
    vol[0, 0, 0] = 4
    valid = np.zeros((6, 6, 6), bool)
    valid[0, 0, :3] = True
    out = gg.interpolate_labels(vol, valid)
    assert out[0, 0, 1] == 4 and out[0, 0, 2] == 4
    assert out[5, 5, 5] == 0  # outside valid untouched


def test_arkit_pose_and_sync():
    pose = arkit_pose_to_scannet(np.array([1.0, 2, 3]),
                                 np.array([1.0, 0, 0, 0]))
    np.testing.assert_allclose(pose[:3, 3], [1, 2, 3])
    np.testing.assert_allclose(pose[:3, :3], np.diag([1, -1, -1]))
    idx = sync_by_timestamp(np.array([0.1, 0.5, 0.9]),
                            np.array([0.0, 0.45, 1.0]))
    np.testing.assert_array_equal(idx, [0, 1, 2])


def test_scene_fusion_roundtrip(rng):
    """fuse_scene on synthetic depth reproduces a wall surface."""
    k = np.array([[80.0, 0, 32], [0, 80.0, 24], [0, 0, 1]], np.float32)
    pose = np.eye(4, dtype=np.float32)
    depths = [np.full((48, 64), 1.0, np.float32)] * 3
    tsdfs, weights, origin = gg.fuse_scene(depths, [k] * 3, [pose] * 3,
                                           voxel_size=0.08, n_layers=2)
    assert len(tsdfs) == 2
    zc = np.abs(tsdfs[0]) < 0.999
    assert zc.any()


def test_viewer_headless_snapshot(tmp_path):
    """Incremental viewer renders a PLY to a PNG headlessly
    (reference tools/render.py counterpart)."""
    import numpy as np

    from eprecon_tpu.inference.mesh_export import write_ply
    from eprecon_tpu.tools.ply_io import read_ply_mesh
    from eprecon_tpu.tools.render import Visualizer

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    p = str(tmp_path / "m.ply")
    write_ply(p, verts, faces, colors=np.full((4, 3), 128, np.uint8))
    rv, rf, rc = read_ply_mesh(p)
    np.testing.assert_allclose(rv, verts, atol=1e-4)
    assert rf.shape == (4, 3) and rc.shape == (4, 3)

    vis = Visualizer(headless_dir=str(tmp_path))
    out = vis.vis_mesh(p)
    vis.close()
    import os

    assert out and os.path.exists(out)
