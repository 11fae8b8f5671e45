"""End-to-end on-disk ScanNet-layout exercise (VERDICT round-1 Missing #2).

Writes synthetic scenes in the exact ScanNet directory layout, runs the GT
generator (fragment pkls + full-scene volumes + label voxelization), then
drives the REAL CLI paths — main.run_test (streaming eval + mesh export +
loss meters) and main.run_train (one epoch) — against the on-disk data.
Catches fragment-pkl schema, depth-clamp, intrinsics-scaling and pose
convention bugs that only real-format data exposes.
"""
import dataclasses
import os
import pickle

import numpy as np
import pytest


def _cfg(root, logdir, mode, **over):
    from eprecon_tpu.config import default_config

    cfg = default_config()
    pan = dataclasses.replace(cfg.model.panoptic, num_queries=16, dec_layers=2,
                              max_instances=8, hidden_dim=16, nheads=4)
    m = dataclasses.replace(
        cfg.model, n_vox=(16, 16, 16), voxel_size=0.24,
        voxel_capacity=(128, 512, 2048), global_extent=(48, 48, 24),
        min_init_voxels=10, min_stage_voxels=5, panoptic=pan)
    t = dataclasses.replace(cfg.train, path=str(root), epochs=1,
                            accumulation_steps=1, n_views=9)
    te = dataclasses.replace(cfg.test, path=str(root), n_views=9,
                             **{k: v for k, v in over.items()
                                if k in ("eval_depth_frames",)})
    return dataclasses.replace(
        cfg, model=m, train=t, test=te, mode=mode, logdir=str(logdir),
        resume=False, save_incremental=True,
        **{k: over.get(k, d) for k, d in
           (("loadckpt", ""), ("save_freq", 100))})


@pytest.fixture(scope="module")
def scannet_root(tmp_path_factory):
    from eprecon_tpu.tools.generate_gt import generate_all
    from eprecon_tpu.tools.make_synthetic_scannet import write_scene

    root = tmp_path_factory.mktemp("synthscan")
    scans = os.path.join(root, "scans")
    labels = os.path.join(root, "labels")
    for s in range(2):
        write_scene(scans, labels, f"scene{s:04d}_00", seed=s, n_frames=20,
                    image_hw=(120, 160))
    # test split reads from scans_test (reference datasets/scannet.py)
    os.symlink(scans, os.path.join(root, "scans_test"))
    generate_all(scans, save_name="all_tsdf_9", voxel_size=0.24, n_views=9,
                 label_path=labels)
    return root


@pytest.mark.slow
def test_gt_layout(scannet_root):
    root = scannet_root
    with open(os.path.join(root, "all_tsdf_9", "fragments_train.pkl"),
              "rb") as f:
        frags = pickle.load(f)
    assert len(frags) == 4  # 2 scenes x (20 keyframes // 9)
    for fr in frags:
        assert set(fr) >= {"scene", "fragment_id", "image_ids", "vol_origin"}
        for vid in fr["image_ids"]:
            assert os.path.exists(os.path.join(
                root, "scans", fr["scene"], "color", f"{vid}.jpg"))
    # label volumes written + interpolated
    sdir = os.path.join(root, "all_tsdf_9", "scene0000_00")
    for name in ("full_tsdf_layer0.npz", "full_tsdf_layer2.npz",
                 "full_semantic_layer0.npz",
                 "full_semantic_layer_interpolate0.npz",
                 "full_instance_layer_interpolate0.npz"):
        assert os.path.exists(os.path.join(sdir, name)), name
    sem = np.load(os.path.join(sdir, "full_semantic_layer0.npz"))["arr_0"]
    assert (sem > 0).any()


@pytest.mark.slow
def test_run_test_cli_on_disk(scannet_root, tmp_path):
    from eprecon_tpu import main as cli

    cfg = _cfg(scannet_root, tmp_path, "test")
    cli.run_test(cfg)
    out = os.path.join(tmp_path, "scenes")
    names = os.listdir(out)
    assert any(n.endswith(".npz") for n in names), names
    assert any(n.endswith(".ply") for n in names), names
    assert os.path.isdir(os.path.join(out, "incremental"))
    assert len(os.listdir(os.path.join(out, "incremental"))) > 0
    # closed-loop scene metrics vs generated GT (F-score + PQ)
    mfiles = [n for n in names if n.endswith("_metrics.json")]
    import json

    assert mfiles, names
    with open(os.path.join(out, mfiles[0])) as f:
        m = json.load(f)
    assert "fscore" in m


@pytest.mark.slow
def test_native_prefetcher_matches_python_path(scannet_root, tmp_path):
    """The decode-ahead native path must yield the same samples as the
    synchronous python decoder (images within interpolation tolerance,
    geometry exact)."""
    from eprecon_tpu import main as cli
    from eprecon_tpu.data.prefetch import FragmentPrefetcher

    cfg = _cfg(scannet_root, tmp_path, "train")
    dataset = cli.build_dataset(cfg, "train")
    pf = FragmentPrefetcher(dataset, n_threads=2)
    got = next(iter(pf.iterate([0])))
    want = dataset[0]
    pf.close()

    assert got["scene"] == want["scene"]
    np.testing.assert_allclose(got["vol_origin_partial"],
                               want["vol_origin_partial"], atol=1e-5)
    np.testing.assert_allclose(np.stack(got["proj_matrices"]),
                               np.stack(want["proj_matrices"]), atol=1e-3)
    gi, wi = np.stack(got["imgs"]), np.stack(want["imgs"])
    assert gi.shape == wi.shape
    # bilinear implementations differ at sub-LSB level; mean must be tight
    assert np.abs(gi - wi).mean() < 2.0, np.abs(gi - wi).mean()
    # fused GT occupancy must agree almost everywhere (depth was resized
    # by the native path, python used native depth resolution)
    go, wo = got["occ_list"][0], want["occ_list"][0]
    denom = max((go | wo).sum(), 1)
    assert (go & wo).sum() / denom > 0.8


@pytest.mark.slow
def test_run_train_cli_on_disk(scannet_root, tmp_path):
    from eprecon_tpu import main as cli

    cfg = _cfg(scannet_root, tmp_path, "train")
    cli.run_train(cfg)  # one epoch over 4 on-disk fragments


@pytest.fixture(scope="module")
def scannet_root_real(tmp_path_factory):
    """One multi-room scene at REAL ScanNet resolutions: 1296×968 color /
    640×480 depth (exercising the 968→972 pad and the depth/color intrinsics
    split at true scale), 40 keyframes spanning two doorway-connected rooms
    (several fragment windows). VERDICT round-2 Missing #2 / Next #3."""
    from eprecon_tpu.tools.generate_gt import generate_all
    from eprecon_tpu.tools.make_synthetic_scannet import write_scene

    root = tmp_path_factory.mktemp("synthscan_real")
    scans = os.path.join(root, "scans")
    labels = os.path.join(root, "labels")
    write_scene(scans, labels, "scene0000_00", seed=3, n_frames=40,
                image_hw=(480, 640), color_hw=(968, 1296), n_rooms=2)
    os.symlink(scans, os.path.join(root, "scans_test"))
    generate_all(scans, save_name="all_tsdf_9", voxel_size=0.24, n_views=9,
                 label_path=labels)
    return root


@pytest.mark.slow
def test_real_resolution_intrinsics_convention(scannet_root_real):
    """After pad_scannet + resize to 640×480, the color intrinsics must land
    exactly on the depth intrinsics (the relationship real ScanNet data
    satisfies; reference datasets/transforms.py:83-116)."""
    import cv2

    from eprecon_tpu.data.transforms import pad_scannet

    sdir = os.path.join(scannet_root_real, "scans", "scene0000_00")
    img = cv2.imread(os.path.join(sdir, "color", "0.jpg"))
    assert img.shape[:2] == (968, 1296), img.shape
    depth = cv2.imread(os.path.join(sdir, "depth", "0.png"),
                       cv2.IMREAD_UNCHANGED)
    assert depth.shape == (480, 640), depth.shape
    k_c = np.loadtxt(os.path.join(sdir, "intrinsic",
                                  "intrinsic_color.txt"))[:3, :3]
    k_d = np.loadtxt(os.path.join(sdir, "intrinsic",
                                  "intrinsic_depth.txt"))[:3, :3]
    padded, k_p = pad_scannet(img, k_c)
    assert padded.shape[:2] == (972, 1296)
    k_p = k_p.copy()
    k_p[0, :] /= 1296 / 640
    k_p[1, :] /= 972 / 480
    np.testing.assert_allclose(k_p, k_d, atol=1e-5)


@pytest.mark.slow
def test_real_resolution_run_test(scannet_root_real, tmp_path):
    """Streaming eval through the CLI at true image shapes; the multi-room
    scene must reconstruct something in BOTH rooms (fragment windows move
    across the global volume)."""
    from eprecon_tpu import main as cli

    cfg = _cfg(scannet_root_real, tmp_path, "test")
    cli.run_test(cfg)
    out = os.path.join(tmp_path, "scenes")
    npz = [n for n in os.listdir(out) if n.endswith(".npz")]
    assert npz, os.listdir(out)
    data = np.load(os.path.join(out, npz[0]))
    assert (np.abs(data["tsdf"]) < 1).any()


@pytest.mark.slow
def test_real_resolution_native_prefetcher(scannet_root_real, tmp_path):
    """The C++ decode loader's 968→972 pad + resize must agree with the
    python path at true resolution."""
    from eprecon_tpu import main as cli
    from eprecon_tpu.data.prefetch import FragmentPrefetcher

    cfg = _cfg(scannet_root_real, tmp_path, "train")
    dataset = cli.build_dataset(cfg, "train")
    pf = FragmentPrefetcher(dataset, n_threads=2)
    got = next(iter(pf.iterate([0])))
    want = dataset[0]
    pf.close()
    np.testing.assert_allclose(np.stack(got["proj_matrices"]),
                               np.stack(want["proj_matrices"]), atol=1e-3)
    gi, wi = np.stack(got["imgs"]), np.stack(want["imgs"])
    assert gi.shape == wi.shape == (9, 480, 640, 3)
    assert np.abs(gi - wi).mean() < 2.0, np.abs(gi - wi).mean()


@pytest.mark.slow
def test_train_checkpoint_eval_handoff(scannet_root, tmp_path):
    """train → save → run_test(loadckpt) → depth-protocol metrics
    (VERDICT round-2 Missing #4/#5; reference main.py:343-348 save +
    :362-367 test-mode load_state_dict + tools/evaluation.py:85-158)."""
    import json

    from eprecon_tpu import main as cli
    from eprecon_tpu.train.checkpoint import latest_checkpoint

    train_dir = os.path.join(tmp_path, "train")
    cfg = _cfg(scannet_root, train_dir, "train", save_freq=1)
    cli.run_train(cfg)
    ckpt = latest_checkpoint(train_dir)
    assert ckpt, os.listdir(train_dir)

    eval_dir = os.path.join(tmp_path, "eval")
    cfg_t = _cfg(scannet_root, eval_dir, "test", loadckpt=ckpt,
                 eval_depth_frames=3)
    cli.run_test(cfg_t)

    out = os.path.join(eval_dir, "scenes")
    mfiles = [n for n in os.listdir(out) if n.endswith("_metrics.json")]
    assert mfiles, os.listdir(out)
    with open(os.path.join(out, mfiles[0])) as f:
        m = json.load(f)
    # 2D depth protocol keys (render→eval_depth) + trimmed mesh metrics
    for key in ("AbsRel", "RMSE", "r1", "fscore"):
        assert key in m, (key, m)
        assert np.isfinite(m[key]) or np.isnan(m[key])


def _coverage_origin(cfg, s, ext, margin):
    """Global-volume origin the consumers would use for sample `s`."""
    from eprecon_tpu.ops.grid import anchored_global_origin, scene_global_origin

    m = cfg.model
    if m.scene_anchor == "window_union" and s.get("global_anchor") is not None:
        return anchored_global_origin(s["global_anchor"], m.n_scales,
                                      m.voxel_size, margin)
    return scene_global_origin(ext, m.n_vox, m.n_scales, m.voxel_size,
                               np.asarray(s["vol_origin"], np.float32), margin)


@pytest.mark.slow
@pytest.mark.parametrize("anchor_mode", ["window_union", "vol_origin"])
def test_auto_extent_covers_all_windows(scannet_root, anchor_mode):
    """data/extent.py sizes the dense global volume so that every fragment
    window of the split indexes non-negatively and fits inside the extent
    (the clamp-relocation class of bug behind the round-4 production quality
    collapse) — under both anchoring schemes."""
    import dataclasses

    from eprecon_tpu.data.extent import fit_global_extent
    from eprecon_tpu.main import build_dataset

    cfg = _cfg(scannet_root, scannet_root, "test")
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, scene_anchor=anchor_mode))
    ext, margin = fit_global_extent(cfg, "test", round_to=8)
    m = cfg.model
    assert all(e >= n for e, n in zip(ext, m.n_vox))
    assert margin % (2 ** m.n_scales) == 0 or margin >= 0
    if anchor_mode == "vol_origin":
        # scene_global_origin spends at most half the slack below vol_origin,
        # so the fit must guarantee extent >= window + 2*margin per axis or
        # the applied margin silently halves and fragments relocate (round-4
        # production regression; ADVICE r4 medium)
        assert all(e >= w + 2 * margin for e, w in zip(ext, m.n_vox)), \
            (ext, margin)

    ds = build_dataset(cfg, "test")
    for i in range(len(ds)):
        s = ds[i]
        go = _coverage_origin(cfg, s, ext, margin)
        rel = np.round((s["vol_origin_partial"] - go) / m.voxel_size)
        assert (rel >= 0).all(), (i, rel)
        assert (rel + m.n_vox <= ext).all(), (i, rel, ext)

    # train mode applies the HBM cap
    ext_t, margin_t = fit_global_extent(cfg, "train", epochs=3, round_to=8,
                                        cap=(64, 64, 48), cap_margin=24)
    assert all(e <= c for e, c in zip(ext_t, (64, 64, 48)))
    assert margin_t <= 24


@pytest.mark.slow
@pytest.mark.parametrize("anchor_mode", ["window_union", "vol_origin"])
def test_auto_extent_train_sweep_exact(scannet_root, anchor_mode):
    """The train-mode sweep must predict the data pipeline's ACTUAL window
    placements (ADVICE r4: rotating the frustum-union AABB instead of the
    per-view frustum points can cross the 8-voxel snap and mispredict by a
    window-relocation's worth). Uncapped fit, then every augmented epoch's
    real placements must fit — under both anchoring schemes. For
    window_union this also pins the dataset's scene_anchor prediction to the
    transform's actual output (min over fragments == anchor)."""
    import dataclasses

    from eprecon_tpu.data.extent import fit_global_extent
    from eprecon_tpu.main import build_dataset

    epochs = 3
    cfg = _cfg(scannet_root, scannet_root, "train")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, scene_anchor=anchor_mode),
        train=dataclasses.replace(
            cfg.train, random_rotation_3d=True, random_translation_3d=True))
    m = cfg.model
    ext, margin = fit_global_extent(cfg, "train", epochs=epochs, round_to=8,
                                    cap=(10_000, 10_000, 10_000),
                                    cap_margin=10_000)
    ds = build_dataset(cfg, "train")
    for ep in range(epochs):
        ds.epoch = ep
        partials = {}
        for i in range(len(ds)):
            s = ds[i]
            go = _coverage_origin(cfg, s, ext, margin)
            rel = np.round((s["vol_origin_partial"] - go) / m.voxel_size)
            assert (rel >= 0).all(), (ep, i, rel, margin)
            assert (rel + m.n_vox <= ext).all(), (ep, i, rel, ext)
            partials.setdefault(s["scene"], []).append(
                (s["vol_origin_partial"], s.get("global_anchor")))
        if anchor_mode == "window_union":
            for scene, items in partials.items():
                actual_min = np.stack([p for p, _ in items]).min(0)
                anchor = items[0][1]
                assert anchor is not None
                np.testing.assert_allclose(anchor, actual_min, atol=1e-5)
