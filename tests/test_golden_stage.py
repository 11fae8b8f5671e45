"""Golden-activation parity: the full coarse-to-fine stage stack vs a
plain-torch reimplementation of the reference (VERDICT round-2 Missing #1).

The ENTIRE per-fragment surface-reconstruction path runs in both frameworks
from the SAME reference-layout random checkpoint
(tools/import_reference_weights.random_state_dict):

  torch oracle: reference NeuConNet stages re-written densely —
    Back_Project (occupancy_initialization.py:185-261) as f32 projection +
    F.grid_sample; SPVCNN (modules.py:75-175) as masked dense convs built
    from the converter's documented torchsparse layouts (ts3/ts2/ts2T/ts1),
    with the point branch's devoxelize as corner-aligned trilinear
    interpolation (ops/torchsparse_utils.py:68-106 calc_ti_weights) and
    point_to_voxel as masked cell means; ConvGRU (modules.py:200-222) as
    SConv3d = conv + pointwise linear; Linear4xTrans heads.
  flax side:    EPReconCore with the converted weights (debug_outputs=True).

World-to-aligned-camera is IDENTITY in this test so the reference's
aligned-frame point voxelization coincides with the fragment grid — the
oracle then matches the flax dense-window redesign exactly, validating every
converter layout switch IN COMPOSITION (stem channel plan, down/up kernels,
residual/point-transform wiring, fused z/r GRU gates, head order) plus the
dense-window equivalences (masked conv == submanifold, maxpool == strided
coords, corner trilinear == devoxelize).

Stage boundaries are teacher-forced: the oracle consumes the flax run's
boolean stage masks (entry/occupancy) so a single near-threshold bf16 flip
cannot cascade into different active sets; the selection chain itself
(maxpool/erode/dilate/count-filter, upsample x8) is verified EXACTLY in
numpy against the flax masks, which are pure boolean functions of the
compared logits.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from eprecon_tpu.tools import import_reference_weights as irw

N_VOX = (32, 32, 32)
VOXEL_SIZE = 0.08
N_VIEWS = 3
# random-checkpoint occ logits are offset by the random head bias, so a real
# threshold can select nothing; open the stage thresholds (occupancy = union)
# — selection semantics are still exactly covered by the occ-init sigmoid
# threshold and test_selection_chain_exact's byte-exact boolean chain.
THRESH = (-100.0, -100.0, -100.0)


# ---------------------------------------------------------------------------
# torch oracle helpers — volumes are [C, X, Y, Z], masks [X, Y, Z] float
# ---------------------------------------------------------------------------

def _t(sd, k):
    return torch.from_numpy(sd[k])


def ts3_w(ts):
    """[27, I, O] x-fastest offsets → conv3d weight [O, I, kx, ky, kz]
    (documented layout, tests/test_import_reference.py::test_ts3_layout_oracle)."""
    k, i, o = ts.shape
    w = torch.zeros(o, i, 3, 3, 3)
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                w[:, :, dx, dy, dz] = torch.from_numpy(ts[dz * 9 + dy * 3 + dx]).T
    return w


def conv_ts3(sd, key, vol, mask):
    x = (vol * mask[None])[None]
    y = F.conv3d(x, ts3_w(sd[key]), padding=1)[0]
    return y * mask[None]


def conv_ts2_down(sd, key, vol, mask):
    """[8, I, O] z-fastest even-kernel offsets, stride-2 (torchsparse down:
    output coords = any-active 2^3 cells)."""
    ts = sd[key]
    _, i, o = ts.shape
    w = torch.zeros(o, i, 2, 2, 2)
    for dx in range(2):
        for dy in range(2):
            for dz in range(2):
                w[:, :, dx, dy, dz] = torch.from_numpy(ts[dx * 4 + dy * 2 + dz]).T
    y = F.conv3d((vol * mask[None])[None], w, stride=2)[0]
    m = maxpool_bool(mask, 2)
    return y * m[None], m


def conv_ts2_up(sd, key, vol, cmask, fmask):
    """transposed even-kernel conv; outputs restricted to the cached finer
    coordinate set (fmask)."""
    ts = sd[key]
    _, i, o = ts.shape
    w = torch.zeros(i, o, 2, 2, 2)
    for dx in range(2):
        for dy in range(2):
            for dz in range(2):
                w[:, :, dx, dy, dz] = torch.from_numpy(ts[dx * 4 + dy * 2 + dz])
    y = F.conv_transpose3d((vol * cmask[None])[None], w, stride=2)[0]
    return y * fmask[None]


def lin(sd, src, vol, bias=True):
    """torch Linear on channel-first volume."""
    w = _t(sd, src + ".weight")
    y = torch.einsum("oi,i...->o...", w, vol)
    if bias:
        y = y + _t(sd, src + ".bias").reshape(-1, *([1] * (vol.ndim - 1)))
    return y


def bn_eval(sd, p, vol, mask):
    c = vol.shape[0]
    y = F.batch_norm(vol.reshape(1, c, -1), _t(sd, p + ".running_mean"),
                     _t(sd, p + ".running_var"), _t(sd, p + ".weight"),
                     _t(sd, p + ".bias"), training=False,
                     eps=1e-5).reshape(vol.shape)
    return y * mask[None]


def maxpool_bool(mask, f):
    x, y, z = mask.shape
    return mask.reshape(x // f, f, y // f, f, z // f, f).amax(dim=(1, 3, 5))


def mean_pool_masked(vol, f, mask):
    """point_to_voxel: mean of active fine voxels per f^3 cell."""
    c, x, y, z = vol.shape
    v = (vol * mask[None]).reshape(c, x // f, f, y // f, f, z // f, f)
    v = v.sum(dim=(2, 4, 6))
    m = mask.reshape(x // f, f, y // f, f, z // f, f).sum(dim=(1, 3, 5))
    return v / torch.clamp(m[None], min=1.0)


def corner_up(vol, f):
    """Corner-aligned trilinear upsample == torchsparse devoxelize
    (calc_ti_weights): corner floor(c/f){,+1}, weights (1-frac, frac),
    zero past the top edge."""
    def up_axis(v, axis):
        n = v.shape[axis]
        pad = [0, 0] * v.ndim
        pad[2 * (v.ndim - 1 - axis)] = 0
        pad[2 * (v.ndim - 1 - axis) + 1] = 1
        nxt = F.pad(v, pad).narrow(axis, 1, n)
        a = torch.repeat_interleave(v, f, dim=axis)
        b = torch.repeat_interleave(nxt, f, dim=axis)
        frac = (torch.arange(n * f) % f).float() / f
        shape = [1] * v.ndim
        shape[axis] = n * f
        return a * (1 - frac.reshape(shape)) + b * frac.reshape(shape)

    for ax in (1, 2, 3):
        vol = up_axis(vol, ax)
    return vol


def res_block(sd, src, vol, mask, has_down):
    """torchsparse ResidualBlock (reference models/modules.py:46-72)."""
    h = conv_ts3(sd, f"{src}.net.0.kernel", vol, mask)
    h = torch.relu(bn_eval(sd, f"{src}.net.1", h, mask)) * mask[None]
    h = conv_ts3(sd, f"{src}.net.3.kernel", h, mask)
    h = bn_eval(sd, f"{src}.net.4", h, mask)
    if has_down:
        w = torch.from_numpy(sd[f"{src}.downsample.0.kernel"])  # [I, O] ts1
        skip = torch.einsum("io,i...->o...", w, vol)
        skip = bn_eval(sd, f"{src}.downsample.1", skip, mask)
    else:
        skip = vol
    return torch.relu(h + skip) * mask[None]


def t_unet(sd, src, x, mask, cr):
    """SPVCNN forward (reference models/modules.py:148-175), dense."""
    cs = [int(cr * v) for v in (32, 64, 128, 96, 96)]
    x0 = conv_ts3(sd, f"{src}.stem.0.kernel", x, mask)
    x0 = torch.relu(bn_eval(sd, f"{src}.stem.1", x0, mask)) * mask[None]
    z0 = x0  # voxel_to_point at stride 1 == identity on the grid

    x1, m1 = conv_ts2_down(sd, f"{src}.stage1.0.net.0.kernel", z0, mask)
    x1 = torch.relu(bn_eval(sd, f"{src}.stage1.0.net.1", x1, m1)) * m1[None]
    x1 = res_block(sd, f"{src}.stage1.1", x1, m1, cs[0] != cs[1])
    x1 = res_block(sd, f"{src}.stage1.2", x1, m1, False)

    x2, m2 = conv_ts2_down(sd, f"{src}.stage2.0.net.0.kernel", x1, m1)
    x2 = torch.relu(bn_eval(sd, f"{src}.stage2.0.net.1", x2, m2)) * m2[None]
    x2 = res_block(sd, f"{src}.stage2.1", x2, m2, cs[1] != cs[2])
    x2 = res_block(sd, f"{src}.stage2.2", x2, m2, False)

    # point branch 0: z1 = devox(x2) + relu(bn(lin(z0)))
    pt0 = lin(sd, f"{src}.point_transforms.0.0", z0)
    pt0 = torch.relu(bn_eval(sd, f"{src}.point_transforms.0.1", pt0, mask))
    z1 = (corner_up(x2, 4) + pt0) * mask[None]

    y3 = mean_pool_masked(z1, 4, mask)
    y3 = conv_ts2_up(sd, f"{src}.up1.0.net.0.kernel", y3, m2, m1)
    y3 = torch.relu(bn_eval(sd, f"{src}.up1.0.net.1", y3, m1)) * m1[None]
    y3 = torch.cat([y3, x1], 0)
    y3 = res_block(sd, f"{src}.up1.1.0", y3, m1, True)
    y3 = res_block(sd, f"{src}.up1.1.1", y3, m1, False)

    y4 = conv_ts2_up(sd, f"{src}.up2.0.net.0.kernel", y3, m1, mask)
    y4 = torch.relu(bn_eval(sd, f"{src}.up2.0.net.1", y4, mask)) * mask[None]
    y4 = torch.cat([y4, x0], 0)
    y4 = res_block(sd, f"{src}.up2.1.0", y4, mask, True)
    y4 = res_block(sd, f"{src}.up2.1.1", y4, mask, False)

    pt1 = lin(sd, f"{src}.point_transforms.1.0", z1)
    pt1 = torch.relu(bn_eval(sd, f"{src}.point_transforms.1.1", pt1, mask))
    return (y4 + pt1) * mask[None]


def sconv(sd, src, vol, mask):
    """SConv3d = ts3 conv + pointwise linear residual (modules.py:178-197)."""
    y = conv_ts3(sd, f"{src}.net.kernel", vol, mask)
    return (y + lin(sd, f"{src}.point_transforms.0", vol)) * mask[None]


def conv_gru(sd, src, h, x, mask):
    """ConvGRU (reference models/modules.py:200-222)."""
    hx = torch.cat([h, x], 0)
    z = torch.sigmoid(sconv(sd, f"{src}.convz", hx, mask))
    r = torch.sigmoid(sconv(sd, f"{src}.convr", hx, mask))
    q = torch.tanh(sconv(sd, f"{src}.convq", torch.cat([r * h, x], 0), mask))
    return ((1 - z) * h + z * q) * mask[None]


def linear4x(sd, src, vol):
    """Linear4xTrans head on channel-first volume → [1, X, Y, Z]."""
    from test_import_reference import _torch_linear4x

    c = vol.shape[0]
    rows = vol.reshape(c, -1).T
    out = _torch_linear4x(sd, src, rows)
    return out.T.reshape(-1, *vol.shape[1:])


def t_back_project(feats, proj, dim, interval, origin, voxel_size):
    """Back_Project mean over visible views (reference
    occupancy_initialization.py:189-261), dense window.
    feats: [V, C, h, w]; proj: [V, 4, 4]. Returns ([C,X,Y,Z], count [X,Y,Z])."""
    v, c, h, w = feats.shape
    gx, gy, gz = dim
    ii, jj, kk = np.meshgrid(np.arange(gx), np.arange(gy), np.arange(gz),
                             indexing="ij")
    coords = np.stack([ii, jj, kk], -1).reshape(-1, 3).astype(np.float32)
    world = coords * interval * voxel_size + origin
    n = world.shape[0]
    rs = torch.from_numpy(
        np.concatenate([world, np.ones((n, 1), np.float32)], 1).T)
    im_p = torch.from_numpy(proj) @ rs
    im_x, im_y, im_z = im_p[:, 0], im_p[:, 1], im_p[:, 2]
    im_x, im_y = im_x / im_z, im_y / im_z
    im_grid = torch.stack([2 * im_x / (w - 1) - 1, 2 * im_y / (h - 1) - 1], -1)
    m = ((im_grid.abs() <= 1).sum(-1) == 2) & (im_z > 0)  # [V, N]
    sampled = F.grid_sample(feats, im_grid.view(v, 1, n, 2).float(),
                            padding_mode="zeros",
                            align_corners=True).view(v, c, n)
    sampled = sampled * m[:, None, :]
    count = m.sum(0).float()
    mean = sampled.sum(0) / torch.clamp(count, min=1.0)
    return mean.reshape(c, gx, gy, gz), count.reshape(gx, gy, gz)


def nearest_up(vol, f=2):
    return torch.repeat_interleave(
        torch.repeat_interleave(
            torch.repeat_interleave(vol, f, dim=1), f, dim=2), f, dim=3)


# ---------------------------------------------------------------------------
# shared fixture data
# ---------------------------------------------------------------------------

def make_cameras():
    """3 cameras looking +z at the [0, 2.56]^3 volume; per-scale K for
    feature maps 16^2 / 8^2 / 4^2."""
    projs = []  # [V, 3, 4, 4]
    for view in range(N_VIEWS):
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 1.28 + 0.2 * (view - 1)
        pose[1, 3] = 1.28 + 0.12 * view
        pose[2, 3] = -2.0
        w2c = np.linalg.inv(pose)
        per_scale = []
        for s, size in enumerate((16, 8, 4)):
            f = 7.0 / 2 ** s
            k = np.array([[f, 0, (size - 1) / 2],
                          [0, f, (size - 1) / 2],
                          [0, 0, 1]], np.float32)
            pm = np.eye(4, dtype=np.float32)
            pm[:3, :4] = k @ w2c[:3, :4]
            per_scale.append(pm)
        projs.append(np.stack(per_scale))
    return np.stack(projs)


def chain_numpy(occ_logits, init_mask, thr):
    """Selection chain (reference neucon_network.py:297-341) in torch/numpy."""
    occupied = torch.from_numpy(init_mask) & (
        torch.from_numpy(occ_logits).sigmoid() > thr)
    m = maxpool_bool(occupied.float(), 2)
    k = torch.ones(1, 1, 3, 3, 3)
    def conv(v):
        return F.conv3d(v[None, None], k, padding=1)[0, 0]
    m = (conv(m) == 27).float()          # erode
    m = (conv(m) >= 1).float()           # dilate
    m = (conv(m) >= 1).float()           # dilate
    return m.bool().numpy()


@pytest.fixture(scope="module")
def golden_run():
    from eprecon_tpu.config import default_config
    from eprecon_tpu.models.eprecon import (EPReconCore, FragmentInputs,
                                            make_recurrent_state)

    rng = np.random.default_rng(3)
    cfg = default_config()
    m = dataclasses.replace(
        cfg.model, n_vox=N_VOX, voxel_size=VOXEL_SIZE,
        global_extent=N_VOX, voxel_capacity=(1024, 4096, 16384),
        min_init_voxels=10, min_stage_voxels=1, thresholds=THRESH)

    feats_op = [rng.standard_normal((N_VIEWS, 16, 16, 24)).astype(np.float32) * 0.5,
                rng.standard_normal((N_VIEWS, 8, 8, 40)).astype(np.float32) * 0.5,
                rng.standard_normal((N_VIEWS, 4, 4, 80)).astype(np.float32) * 0.5]
    feats_2d = [rng.standard_normal(f.shape).astype(np.float32) * 0.5
                for f in feats_op]
    projs = make_cameras()

    frag = FragmentInputs(
        proj_matrices=jnp.asarray(projs),
        vol_origin_partial=jnp.zeros(3, jnp.float32),
        world_to_aligned_camera=jnp.eye(4, dtype=jnp.float32),
        rel_origins=jnp.zeros((3, 3), jnp.int32))
    state = make_recurrent_state(m)

    entries = irw.initialization_entries() + irw.heads_entries() + \
        irw.decoder_entries()
    zeros = []
    for i in range(3):
        e, z = irw.spvcnn_entries(i)
        entries += e
        zeros += z
    e, z = irw.gru_entries()
    entries += e
    zeros += z
    sd = irw.random_state_dict(entries, seed=11)
    conv = irw.apply_entries(sd, entries, zeros)
    conv.pop("_used_keys")
    conv["params"] = irw.fuse_zr_gates(conv["params"])
    converted = {c: conv[c].get("neucon_net", {}) for c in
                 ("params", "batch_stats", "buffers")}

    model = EPReconCore(m, use_running_average=True, debug_outputs=True)
    f2 = [jnp.asarray(f) for f in feats_2d]
    fo = [jnp.asarray(f) for f in feats_op]
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), f2, fo, frag,
                                    state, None)
    variables = irw.merge_variables(
        {k: v for k, v in variables.items()}, converted, check_shapes=True)
    outputs, _, _ = model.apply(variables, f2, fo, frag, state, None)

    def to_np(v):
        a = np.asarray(v)
        if a.dtype.kind not in "biu":  # bf16 → f32 for torch interop
            a = a.astype(np.float32)
        return a

    outputs = {k: to_np(v) for k, v in outputs.items() if hasattr(v, "shape")}
    return dict(cfg=m, sd=sd, outputs=outputs, feats_op=feats_op,
                projs=projs)


def _cmp(name, got, want, mask, corr_min=0.999, atol=0.12):
    g = np.asarray(got, np.float32)[..., mask] if got.ndim == 4 else \
        np.asarray(got, np.float32)[mask]
    w = want.numpy()[..., mask] if want.ndim == 4 else want.numpy()[mask]
    g, w = g.ravel(), w.ravel()
    assert g.size > 50, f"{name}: degenerate mask ({g.size})"
    corr = np.corrcoef(g, w)[0, 1]
    mad = np.abs(g - w).max()
    assert corr > corr_min, f"{name}: corr {corr:.5f} (maxabs {mad:.4f})"
    assert mad < atol, f"{name}: maxabs {mad:.4f} (corr {corr:.5f})"


def test_selection_chain_exact(golden_run):
    """maxpool/erode/dilate/count-filter + x8 upsample wiring — exact."""
    o = golden_run["outputs"]
    chain = chain_numpy(o["occ_init_logits"], o["occ_init_mask"], 0.3)
    entry0 = chain & (o["bp_count_0"] >= 2)
    np.testing.assert_array_equal(entry0, o["stage_entry_0"])
    for i in (1, 2):
        up = nearest_up(torch.from_numpy(
            o[f"occupancy_{i-1}"][None]).float())[0].bool().numpy()
        np.testing.assert_array_equal(up, o[f"stage_entry_{i}"])
    assert o["stage_entry_0"].sum() > 200, "degenerate: too few active voxels"


def test_stage_stack_golden_vs_torch(golden_run):
    """BP → U-Net → ConvGRU → heads per stage, teacher-forced masks."""
    o, sd = golden_run["outputs"], golden_run["sd"]
    feats_op, projs = golden_run["feats_op"], golden_run["projs"]
    cfg = golden_run["cfg"]
    channels = [96, 48, 24]
    ch_init = [80, 40, 24]

    prev_up = None
    for i in range(3):
        interval = 2 ** (2 - i)
        scale = 2 - i
        dim = tuple(v // interval for v in N_VOX)
        entry = torch.from_numpy(o[f"stage_entry_{i}"]).float()

        fop = torch.from_numpy(
            feats_op[scale].transpose(0, 3, 1, 2))  # [V, C, h, w]
        vol, count = t_back_project(fop, projs[:, scale], dim, interval,
                                    np.zeros(3, np.float32), VOXEL_SIZE)
        _cmp(f"bp_vol_{i}", o[f"bp_vol_{i}"].transpose(3, 0, 1, 2),
             vol * entry[None], o[f"stage_entry_{i}"], atol=0.05)

        feat = vol if i == 0 else torch.cat([vol, prev_up], 0)
        feat = feat * entry[None]

        unet = t_unet(sd, f"neucon_net.sp_convs.{i}", feat, entry,
                      1.0 / 2 ** i)
        _cmp(f"unet_{i}", o[f"stage_unet_{i}"].transpose(3, 0, 1, 2),
             unet, o[f"stage_entry_{i}"], corr_min=0.998)

        feat_all = torch.cat([unet, vol * entry[None]], 0)
        union = torch.from_numpy(o[f"stage_union_{i}"]).float()
        cv = channels[i]
        h0 = torch.zeros_like(feat_all)
        fused_v = conv_gru(sd, f"neucon_net.gru_fusion.fusion_nets_voxel.{i}",
                           h0[:cv], feat_all[:cv] * union[None], union)
        fused_i = conv_gru(sd, f"neucon_net.gru_fusion.fusion_nets_img.{i}",
                           h0[cv:], feat_all[cv:] * union[None], union)
        fused = torch.cat([fused_v, fused_i], 0)
        _cmp(f"fused_{i}", o[f"stage_fused_{i}"].transpose(3, 0, 1, 2),
             fused, o[f"stage_union_{i}"], corr_min=0.998)

        tsdf = linear4x(sd, f"neucon_net.tsdf_preds.{i}", fused[:cv])[0]
        occ = linear4x(sd, f"neucon_net.occ_preds.{i}", fused[:cv])[0]
        _cmp(f"tsdf_{i}", o[f"stage_tsdf_{i}"], tsdf, o[f"stage_union_{i}"],
             corr_min=0.999)
        _cmp(f"occ_{i}", o[f"stage_occ_{i}"], occ, o[f"stage_union_{i}"],
             corr_min=0.999)

        if i < 2:
            occu = torch.from_numpy(o[f"occupancy_{i}"]).float()
            prev = torch.cat([fused[:cv], tsdf[None], occ[None]], 0) * occu[None]
            prev_up = nearest_up(prev)
