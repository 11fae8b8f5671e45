"""TSDF fusion + camera math vs NumPy/torch-free oracles."""
import jax.numpy as jnp
import numpy as np

from eprecon_tpu.ops import camera, tsdf_fusion
from eprecon_tpu.ops.grid import generate_grid


def _simple_cam():
    k = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], np.float32)
    pose = np.eye(4, dtype=np.float32)  # camera at origin looking +z
    return k, pose


def test_tsdf_integrate_flat_wall():
    """A flat wall at z=1m produces a zero crossing at the right depth."""
    k, pose = _simple_cam()
    depth = np.full((48, 64), 1.0, np.float32)
    vol_dim = (16, 16, 32)
    voxel_size = 0.05
    origin = np.array([-0.4, -0.4, 0.2], np.float32)
    tsdf, weight = tsdf_fusion.fuse_frames(
        jnp.asarray(depth)[None], jnp.asarray(k)[None], jnp.asarray(pose)[None],
        jnp.asarray(origin), vol_dim, voxel_size)
    tsdf, weight = np.asarray(tsdf), np.asarray(weight)
    # voxel at z index i is at depth 0.2 + 0.05*i; wall at z=1.0 → i=16
    center = tsdf[8, 8, :]
    # in front of wall, far: +1 (truncated); behind wall: untouched (1.0 init, w=0)
    zs = origin[2] + voxel_size * np.arange(vol_dim[2])
    sdf_expected = np.clip((1.0 - zs) / (3 * voxel_size), None, 1.0)
    observed = weight[8, 8, :] > 0
    # behind wall beyond truncation never integrated
    assert not observed[zs > 1.0 + 3 * voxel_size + 1e-6].any()
    np.testing.assert_allclose(center[observed], sdf_expected[observed], atol=1e-5)


def test_tsdf_weight_accumulates():
    k, pose = _simple_cam()
    depth = np.full((48, 64), 1.0, np.float32)
    depths = jnp.asarray(np.stack([depth, depth]))
    tsdf, weight = tsdf_fusion.fuse_frames(
        depths, jnp.asarray(np.stack([k, k])), jnp.asarray(np.stack([pose, pose])),
        jnp.zeros(3), (8, 8, 8), 0.1)
    w = np.asarray(weight)
    assert set(np.unique(w)) <= {0.0, 2.0}


def test_projection_matrices_scale():
    k, pose = _simple_cam()
    mats = camera.projection_matrices(jnp.asarray(k)[None], jnp.asarray(pose)[None],
                                      stride=4, n_scales=3)
    assert mats.shape == (1, 3, 4, 4)
    m = np.asarray(mats)
    # focal length halves each scale
    np.testing.assert_allclose(m[0, 0, 0, 0], 100 / 4)
    np.testing.assert_allclose(m[0, 1, 0, 0], 100 / 8)
    np.testing.assert_allclose(m[0, 2, 0, 0], 100 / 16)
    # bottom row preserved
    np.testing.assert_allclose(m[0, :, 3], [[0, 0, 0, 1]] * 3)


def test_project_voxels_mask():
    k, pose = _simple_cam()
    proj = np.eye(4, dtype=np.float32)
    proj[:3, :3] = k
    pts = jnp.asarray(np.array([
        [0.0, 0.0, 1.0],    # center, in front → visible
        [0.0, 0.0, -1.0],   # behind camera
        [10.0, 0.0, 1.0],   # off-screen
    ], np.float32))
    uv, z, mask = camera.project_voxels(pts, jnp.asarray(proj)[None], (48, 64))
    mask = np.asarray(mask)[0]
    assert mask[0] and not mask[1] and not mask[2]
    np.testing.assert_allclose(np.asarray(uv)[0, 0], [32, 24], atol=1e-5)


def test_world_to_aligned_camera_gravity():
    """After alignment, the world up axis maps to camera-space [0,-1,0]."""
    rng = np.random.default_rng(3)
    # random camera pose
    a = rng.standard_normal((3, 3))
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = q
    pose[:3, 3] = rng.standard_normal(3)
    w2ac = np.asarray(camera.world_to_aligned_camera(jnp.asarray(pose)))
    up = w2ac[:3, :3] @ np.array([0, 0, 1.0])
    np.testing.assert_allclose(up, [0, -1, 0], atol=1e-5)


def test_generate_grid():
    coords, shape = generate_grid((96, 96, 96), 2)
    assert shape == (48, 48, 48)
    assert coords.shape == (3, 48 ** 3)
    c = np.asarray(coords)
    assert c.min() == 0 and c.max() == 94
    assert (c % 2 == 0).all()


def test_view_frustum():
    k, pose = _simple_cam()
    pts = np.asarray(camera.view_frustum_points(3.0, (48, 64), jnp.asarray(k), jnp.asarray(pose)))
    assert pts.shape == (3, 5)
    np.testing.assert_allclose(pts[:, 0], [0, 0, 0], atol=1e-6)  # camera center
    np.testing.assert_allclose(pts[2, 1:], 3.0)
