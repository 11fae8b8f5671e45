"""Golden-activation parity: full Occupancy_Initialization vs a plain-torch
reimplementation of the reference module.

The reference (models/occupancy_initialization.py:11-182) composes 2D fusion
blocks, per-voxel multi-view variance, and a spconv submanifold stack. Here
the ENTIRE module runs in both frameworks from the SAME reference-layout
random checkpoint (tools/import_reference_weights.random_state_dict):

  torch oracle: reference forward re-written with dense ops — F.conv2d /
    F.grid_sample verbatim, spconv SubMConv3d == masked dense F.conv3d
    (exact for submanifold convs), eval-mode BatchNorm.
  flax side:    OccupancyInitialization with the converted weights.

Agreement of the final occupancy logits validates the converter's layout
assumptions AND the dense-window re-design end-to-end for this stage
(VERDICT round-1 Missing #1: per-stage golden activations).
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from eprecon_tpu.models.occupancy_init import OccupancyInitialization
from eprecon_tpu.tools import import_reference_weights as irw

SRC = "neucon_net.initialization"


# ---------------------------------------------------------------------------
# torch oracle — reference modules re-written densely (eval-mode BN)
# ---------------------------------------------------------------------------

def _t(sd, key):
    return torch.from_numpy(sd[key])


def t_conv2d(sd, p, x):
    return F.conv2d(x, _t(sd, p + ".weight"), _t(sd, p + ".bias"),
                    padding="same")


def t_bn(sd, p, x):
    """Eval-mode BatchNorm over the channel dim (dim 1 of [N, C, ...])."""
    return F.batch_norm(x, _t(sd, p + ".running_mean"),
                        _t(sd, p + ".running_var"), _t(sd, p + ".weight"),
                        _t(sd, p + ".bias"), training=False, eps=1e-5)


def t_conv_block(sd, p, x):
    """Conv2d_Block (reference models/modules.py:372-382)."""
    return F.relu(t_bn(sd, p + ".bn", t_conv2d(sd, p + ".conv", x)))


def t_elan(sd, p, x):
    """ELAN (reference models/modules.py:340-370)."""
    f = t_conv_block(sd, p + ".conv1", x)
    f2 = t_conv_block(sd, p + ".conv2", x)
    f = torch.cat([f, f2], 1)
    for j in (3, 4, 5, 6):
        f2 = t_conv_block(sd, p + f".conv{j}", f2)
        f = torch.cat([f, f2], 1)
    return t_conv_block(sd, p + ".conv7", f)


def t_fusion_block(sd, p, x):
    """Fusion_Block (reference models/modules.py:313-338)."""
    out = F.relu(t_bn(sd, p + ".bn1", t_conv2d(sd, p + ".conv1", x)))
    out = F.relu(t_bn(sd, p + ".bn2", t_conv2d(sd, p + ".conv2", out)))
    return t_elan(sd, p + ".ELAN", out)


def t_feat_fusion_pre(sd, f1x, f2x, f4x):
    """reference occupancy_initialization.py:41-58 (eval BN)."""
    f1 = t_fusion_block(sd, SRC + ".self_fusion_1x", f1x)
    f2 = t_fusion_block(sd, SRC + ".self_fusion_2x", f2x)
    f4 = t_fusion_block(sd, SRC + ".self_fusion_4x", f4x)
    f1 = F.interpolate(f1, scale_factor=2, mode="bilinear")
    f4 = F.avg_pool2d(f4, 2)
    fused = torch.cat([f1, f2, f4], 1)
    fused = t_conv_block(sd, SRC + ".fusion_down", fused)
    for j in (1, 2, 3, 4):
        out = F.relu(t_conv2d(sd, SRC + f".post_fusion_{j}.conv", fused))
        fused = t_bn(sd, SRC + f".post_fusion_{j}.bn", out + fused)
    return fused


def t_subm(sd, p, vol, mask):
    """spconv SubMConv3d == masked dense conv3d (KRSC [O,k,k,k,I];
    same permute as tests/test_import_reference.py::test_spconv_layout_oracle).
    vol: [C, X, Y, Z]; mask: [X, Y, Z]."""
    w = _t(sd, p + ".weight").permute(0, 4, 1, 2, 3)
    b = _t(sd, p + ".bias")
    k = w.shape[-1]
    x = (vol * mask[None])[None]
    y = F.conv3d(x, w, b, padding=k // 2)[0]
    return y * mask[None]


def t_ln_vox(sd, p, vol, mask):
    """LayerNorm over channels at active voxels. vol: [C, X, Y, Z]."""
    v = vol.permute(1, 2, 3, 0)
    v = F.layer_norm(v, v.shape[-1:], _t(sd, p + ".weight"),
                     _t(sd, p + ".bias"), eps=1e-5)
    return v.permute(3, 0, 1, 2) * mask[None]


def t_subm_block(sd, p, vol, mask):
    """SubMconv3dBlock: conv + LN + ReLU (reference models/modules.py:440-452)."""
    v = t_subm(sd, p + ".conv", vol, mask)
    return F.relu(t_ln_vox(sd, p + ".ln", v, mask)) * mask[None]


def t_sparse_elan(sd, p, vol, mask):
    """Spares3dELAN (reference models/modules.py:401-438)."""
    f1 = t_subm_block(sd, p + ".conv1", vol, mask)
    f2 = t_subm_block(sd, p + ".conv2", vol, mask)
    f = torch.cat([f1, f2], 0)
    for j in (3, 4, 5, 6):
        f2 = t_subm_block(sd, p + f".conv{j}", f2, mask)
        f = torch.cat([f, f2], 0)
    return t_subm_block(sd, p + ".conv7", f, mask)


def t_bn_vox(sd, p, vol, mask):
    """Eval BatchNorm1d over active voxels. vol: [C, X, Y, Z]."""
    c = vol.shape[0]
    y = t_bn(sd, p, vol.reshape(1, c, -1)).reshape(vol.shape)
    return y * mask[None]


def torch_occupancy_init(sd, feats, origin, voxel_size, proj, grid_shape,
                         interval, min_view_number=2):
    """Full reference forward (occupancy_initialization.py:60-182), bs=1,
    dense over the grid; returns (occ_logits [X,Y,Z], mask [X,Y,Z])."""
    f_fine, f_mid, f_coarse = [torch.from_numpy(f[:, 0].transpose(0, 3, 1, 2))
                               for f in feats]
    fused = t_feat_fusion_pre(sd, f_coarse, f_mid, f_fine)  # [V, 32, h, w]
    v, c, h, w = fused.shape

    gx, gy, gz = grid_shape
    ii, jj, kk = np.meshgrid(np.arange(gx), np.arange(gy), np.arange(gz),
                             indexing="ij")
    coords = np.stack([ii, jj, kk], -1).reshape(-1, 3).astype(np.float32)
    world = coords * interval * voxel_size + origin[0]
    n = world.shape[0]
    rs = torch.from_numpy(
        np.concatenate([world, np.ones((n, 1), np.float32)], 1).T)
    im_p = torch.from_numpy(proj[:, 0]) @ rs          # [V, 4, N]
    im_x, im_y, im_z = im_p[:, 0], im_p[:, 1], im_p[:, 2]
    im_x, im_y = im_x / im_z, im_y / im_z
    im_grid = torch.stack([2 * im_x / (w - 1) - 1, 2 * im_y / (h - 1) - 1], -1)
    vmask = (im_grid.abs() <= 1).sum(-1) == 2
    vmask = vmask & (im_z > 0)                        # [V, N]
    count = vmask.sum(0).float()
    valid = count >= min_view_number

    grid = im_grid.view(v, 1, -1, 2).float()
    sampled = F.grid_sample(fused, grid, padding_mode="zeros",
                            align_corners=True).view(v, c, n)
    sampled = sampled * vmask[:, None, :]
    denom = torch.clamp(count, min=1.0)
    mean = sampled.sum(0) / denom                     # [C, N]
    var = ((sampled - mean[None]) * vmask[:, None, :]).pow(2).sum(0) / denom

    mask3 = torch.from_numpy(np.asarray(valid).reshape(gx, gy, gz))
    vol = (var * valid[None, :]).reshape(c, gx, gy, gz)

    vol = t_bn_vox(sd, SRC + ".norm0", vol, mask3)
    vol = t_sparse_elan(sd, SRC + ".similary_1", vol, mask3)
    for j in (1, 2, 3):
        r = t_subm(sd, SRC + f".subm{j}.sparsesubmconv3d", vol, mask3)
        r = F.relu(r) + vol
        vol = t_ln_vox(sd, SRC + f".norm{j}", r, mask3)
    out = t_subm(sd, SRC + ".subm4.sparsesubmconv3d", vol, mask3)
    out = t_bn_vox(sd, SRC + ".norm4", out, mask3)
    return out[0].numpy(), mask3.numpy()


# ---------------------------------------------------------------------------
# the golden test
# ---------------------------------------------------------------------------

def test_occupancy_init_golden_vs_torch(rng):
    entries = irw.initialization_entries()
    sd = irw.random_state_dict(entries, seed=7)
    conv = irw.apply_entries(sd, entries)
    conv.pop("_used_keys")

    v = 3
    feats = [rng.standard_normal(s).astype(np.float32) * 0.5 for s in
             [(v, 1, 32, 40, 24), (v, 1, 16, 20, 40), (v, 1, 8, 10, 80)]]
    # cameras at the mid (1/8) feature scale looking at the grid
    projs = []
    for view in range(v):
        k = np.array([[12.0, 0, 10.0], [0, 12.0, 8.0], [0, 0, 1]], np.float32)
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.15 * view
        pm = np.eye(4, dtype=np.float32)
        pm[:3, :4] = k @ np.linalg.inv(pose)[:3, :4]
        projs.append(pm)
    proj = np.stack(projs)[:, None]  # [V, 1, 4, 4]
    # Off-grid origin: round decimals put 12 voxels EXACTLY on the image
    # boundary (|im_grid| == 1 to float64 rounding), so the <=1 in-bounds
    # test flips with the compiler's FMA contraction choices (it did when
    # conftest dropped XLA:CPU LLVM effort). Nudged, the nearest voxel is
    # 2.5e-3 from any boundary — robust to any fp reassociation.
    origin = np.array([[-0.6037, -0.4971, 0.8023]], np.float32)
    grid_shape, interval, voxel_size = (12, 12, 12), 2, 0.05

    model = OccupancyInitialization(use_running_average=True)
    variables = model.init(jax.random.PRNGKey(0),
                           [jnp.asarray(f) for f in feats],
                           jnp.asarray(origin), voxel_size, jnp.asarray(proj),
                           grid_shape, interval)
    variables = {
        "params": conv["params"]["neucon_net"]["initialization"],
        "batch_stats": conv["batch_stats"]["neucon_net"]["initialization"],
    }
    occ, mask, count = model.apply(
        variables, [jnp.asarray(f) for f in feats], jnp.asarray(origin),
        voxel_size, jnp.asarray(proj), grid_shape, interval)
    occ = np.asarray(occ[0], np.float32)
    mask = np.asarray(mask[0])

    want, want_mask = torch_occupancy_init(sd, feats, origin, voxel_size,
                                           proj, grid_shape, interval)

    np.testing.assert_array_equal(mask, want_mask)
    assert mask.sum() > 100, "degenerate test setup: too few valid voxels"
    got_v, want_v = occ[mask], want[mask]
    # flax convs run bf16 (PERF_NOTES rule 7) → loose atol, tight correlation
    corr = np.corrcoef(got_v, want_v)[0, 1]
    assert corr > 0.999, corr
    assert np.abs(got_v - want_v).max() < 0.05, np.abs(got_v - want_v).max()
