"""Back-projection vs a torch grid_sample oracle (reference math,
models/occupancy_initialization.py:79-128,189-261)."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from eprecon_tpu.ops import back_project as bp


def _setup(rng, n_views=4, bs=2, h=12, w=16, c=5, k=64, n_active=50):
    feats = rng.standard_normal((n_views, bs, h, w, c)).astype(np.float32)
    # simple pinhole cameras at slightly different positions
    projs = []
    for v in range(n_views):
        kmat = np.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]], np.float32)
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.1 * v  # shift camera along x
        world2cam = np.linalg.inv(pose)
        pm = np.eye(4, dtype=np.float32)
        pm[:3, :4] = kmat @ world2cam[:3, :4]
        projs.append(pm)
    proj = np.stack([np.stack(projs)] * bs, axis=1)  # [V, B, 4, 4]

    coords = np.zeros((k, 4), np.int32)
    coords[:n_active, 0] = rng.integers(0, bs, n_active)
    coords[:n_active, 1:] = rng.integers(0, 8, (n_active, 3))
    valid = np.arange(k) < n_active
    origin = np.tile(np.array([[-0.2, -0.2, 0.5]], np.float32), (bs, 1))
    voxel_size = 0.1
    return feats, proj, coords, valid, origin, voxel_size


def _torch_oracle(feats, proj, coords, valid, origin, voxel_size, variance):
    """Replicates reference occupancy_initialization.py math with torch."""
    n_views, bs, h, w, c = feats.shape
    k = coords.shape[0]
    out = np.zeros((k, c), np.float32)
    count = np.zeros(k, np.float32)
    for b in range(bs):
        sel = valid & (coords[:, 0] == b)
        if not sel.any():
            continue
        cw = coords[sel, 1:].astype(np.float32) * voxel_size + origin[b]
        n = cw.shape[0]
        rs = np.concatenate([cw, np.ones((n, 1), np.float32)], 1).T  # [4, N]
        im_p = proj[:, b] @ rs  # [V, 4, N]
        im_x, im_y, im_z = im_p[:, 0], im_p[:, 1], im_p[:, 2]
        im_x, im_y = im_x / im_z, im_y / im_z
        im_grid = np.stack([2 * im_x / (w - 1) - 1, 2 * im_y / (h - 1) - 1], -1)
        mask = (np.abs(im_grid) <= 1).sum(-1) == 2
        mask = mask & (im_z > 0)  # [V, N]
        tfeats = torch.from_numpy(feats[:, b].transpose(0, 3, 1, 2))  # [V, C, H, W]
        grid = torch.from_numpy(im_grid.astype(np.float32)).view(n_views, 1, -1, 2)
        sampled = F.grid_sample(tfeats, grid, padding_mode="zeros", align_corners=True)
        sampled = sampled.view(n_views, c, n).numpy()
        sampled[~mask[:, None, :].repeat(c, 1)] = 0
        cnt = mask.sum(0).astype(np.float32)
        denom = np.maximum(cnt, 1.0)
        mean = sampled.sum(0) / denom  # [C, N]
        if variance:
            diff = (sampled - mean[None]) * mask[:, None, :]
            var = (diff ** 2).sum(0) / denom
            out[sel] = var.T
        else:
            out[sel] = mean.T
        count[sel] = cnt
    return out, count


def test_back_project_mean_matches_torch(rng):
    feats, proj, coords, valid, origin, voxel_size = _setup(rng)
    mean, count = bp.back_project_mean(jnp.asarray(coords), jnp.asarray(valid),
                                       jnp.asarray(origin), voxel_size,
                                       jnp.asarray(feats), jnp.asarray(proj))
    exp, exp_count = _torch_oracle(feats, proj, coords, valid, origin, voxel_size, False)
    np.testing.assert_allclose(np.asarray(count)[valid], exp_count[valid])
    np.testing.assert_allclose(np.asarray(mean)[valid], exp[valid], rtol=1e-4, atol=1e-5)


def test_back_project_window_matches_sparse_path(rng):
    """The dense-window fast path (production, bf16 quad-row gathers) agrees
    with the oracle-tested sparse back_project_mean on every window voxel."""
    n_views, h, w, c = 4, 12, 16, 5
    dim, interval, voxel_size = (8, 8, 8), 2, 0.1
    feats = rng.standard_normal((n_views, 1, h, w, c)).astype(np.float32)
    projs = []
    for v in range(n_views):
        kmat = np.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]],
                        np.float32)
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.1 * v
        pm = np.eye(4, dtype=np.float32)
        pm[:3, :4] = kmat @ np.linalg.inv(pose)[:3, :4]
        projs.append(pm)
    proj = np.stack(projs)[:, None]  # [V, 1, 4, 4]
    origin = np.array([[-0.2, -0.2, 0.5]], np.float32)

    mean_w, count_w = bp.back_project_window(dim, interval, jnp.asarray(origin),
                                             voxel_size, jnp.asarray(feats),
                                             jnp.asarray(proj))

    n = dim[0] * dim[1] * dim[2]
    ii, jj, kk = np.meshgrid(*[np.arange(d) for d in dim], indexing="ij")
    coords = np.zeros((n, 4), np.int32)
    coords[:, 1:] = np.stack([ii, jj, kk], -1).reshape(-1, 3) * interval
    valid = np.ones(n, bool)
    mean_s, count_s = bp.back_project_mean(jnp.asarray(coords),
                                           jnp.asarray(valid),
                                           jnp.asarray(origin), voxel_size,
                                           jnp.asarray(feats),
                                           jnp.asarray(proj))
    np.testing.assert_array_equal(np.asarray(count_w).reshape(-1),
                                  np.asarray(count_s))
    # window path computes in bf16 → loose atol
    np.testing.assert_allclose(
        np.asarray(mean_w, np.float32).reshape(n, c),
        np.asarray(mean_s, np.float32), atol=0.03)


def test_back_project_variance_matches_torch(rng):
    feats, proj, coords, valid, origin, voxel_size = _setup(rng)
    var, count = bp.back_project_variance(jnp.asarray(coords), jnp.asarray(valid),
                                          jnp.asarray(origin), voxel_size,
                                          jnp.asarray(feats), jnp.asarray(proj))
    exp, exp_count = _torch_oracle(feats, proj, coords, valid, origin, voxel_size, True)
    np.testing.assert_allclose(np.asarray(count)[valid], exp_count[valid])
    np.testing.assert_allclose(np.asarray(var)[valid], exp[valid], rtol=1e-3, atol=1e-5)
    assert (np.asarray(var) >= 0).all()


def test_sorted_backward_matches_scatter(rng):
    """bp_backward='sorted' (gather_rows_segsum: argsort + segment-sum
    adjoint) must produce the same gradients as XLA's default scatter-add
    gather adjoint — it only changes summation ORDER of the cotangent rows.
    Checked through back_project_window (production path, bf16 quads — f32
    grads compared loosely) and back_project_variance (f32 — compared
    tightly)."""
    import jax

    n_views, h, w, c = 4, 12, 16, 5
    dim, interval, voxel_size = (8, 8, 8), 2, 0.1
    feats = rng.standard_normal((n_views, 1, h, w, c)).astype(np.float32)
    projs = []
    for v in range(n_views):
        kmat = np.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]],
                        np.float32)
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.1 * v
        pm = np.eye(4, dtype=np.float32)
        pm[:3, :4] = kmat @ np.linalg.inv(pose)[:3, :4]
        projs.append(pm)
    proj = np.stack(projs)[:, None]
    origin = np.array([[-0.2, -0.2, 0.5]], np.float32)

    def loss_window(f, mode):
        mean, _ = bp.back_project_window(dim, interval, jnp.asarray(origin),
                                         voxel_size, f, jnp.asarray(proj),
                                         bp_backward=mode)
        return jnp.sum(mean.astype(jnp.float32) ** 2)

    g_scatter = jax.grad(loss_window)(jnp.asarray(feats), "scatter")
    g_sorted = jax.grad(loss_window)(jnp.asarray(feats), "sorted")
    np.testing.assert_allclose(np.asarray(g_scatter), np.asarray(g_sorted),
                               rtol=1e-2, atol=1e-3)  # bf16 quad path

    n = dim[0] * dim[1] * dim[2]
    ii, jj, kk = np.meshgrid(*[np.arange(d) for d in dim], indexing="ij")
    coords = np.zeros((n, 4), np.int32)
    coords[:, 1:] = np.stack([ii, jj, kk], -1).reshape(-1, 3) * interval
    valid = np.ones(n, bool)

    def loss_var(f, mode):
        var, _ = bp.back_project_variance(jnp.asarray(coords),
                                          jnp.asarray(valid),
                                          jnp.asarray(origin), voxel_size, f,
                                          jnp.asarray(proj), mode)
        return jnp.sum(var ** 2)

    gv_scatter = jax.grad(loss_var)(jnp.asarray(feats), "scatter")
    gv_sorted = jax.grad(loss_var)(jnp.asarray(feats), "sorted")
    np.testing.assert_allclose(np.asarray(gv_scatter), np.asarray(gv_sorted),
                               rtol=1e-5, atol=1e-6)
