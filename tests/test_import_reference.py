"""Reference-checkpoint converter tests.

torchsparse/spconv/torchvision are not installed in this image, so the
oracles are plain-torch modules implementing the SAME math the reference
modules compute on dense-filled windows (the documented layout assumptions
in eprecon_tpu/tools/import_reference_weights.py are exercised end to end:
converted flax modules must reproduce the torch forward bit-for-bit up to
bf16 tolerance). The full-schema test verifies that a randomly-initialized
checkpoint with the reference's exact key layout loads into the real model.
"""
import dataclasses

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from eprecon_tpu.tools import import_reference_weights as irw


def _conv_sd(entries, seed=0):
    sd = irw.random_state_dict(entries, seed)
    return sd


# ---------------------------------------------------------------------------
# Linear4xTrans
# ---------------------------------------------------------------------------

def _torch_linear4x(sd, src, x):
    """reference models/modules.py:273-311 forward in plain torch."""
    t = lambda k: torch.from_numpy(sd[f"{src}.{k}"])
    out = F.linear(x, t("linear1.weight"), t("linear1.bias"))
    out = F.layer_norm(out, out.shape[-1:], t("norm1.weight"), t("norm1.bias"))
    out = F.relu(out)
    out = F.linear(out, t("linear2.weight"), t("linear2.bias"))
    out = F.layer_norm(out, out.shape[-1:], t("norm2.weight"), t("norm2.bias"))
    out = F.relu(out)
    out2 = F.linear(out, t("linear3.weight"), t("linear3.bias"))
    if out2.shape[-1] == out.shape[-1]:
        out2 = out2 + out
    return out2


def test_linear4x_oracle(rng):
    from eprecon_tpu.models.blocks import Linear4xTrans

    entries = irw._linear4x("head", 8, 1, ("head",))
    sd = _conv_sd(entries)
    conv = irw.apply_entries(sd, entries)
    x = rng.standard_normal((5, 8)).astype(np.float32)

    m = Linear4xTrans(1)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = m.apply({"params": conv["params"]["head"]}, jnp.asarray(x))
    want = _torch_linear4x(sd, "head", torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


# ---------------------------------------------------------------------------
# spconv SubMConv3d layout (KRSC) vs masked dense conv
# ---------------------------------------------------------------------------

def test_spconv_layout_oracle(rng):
    from eprecon_tpu.models.dense3d import SubMConv3dDense

    ci, co = 4, 6
    entries = irw._spconv("m.conv", ci, co, 3, ("m",))
    sd = _conv_sd(entries)
    conv = irw.apply_entries(sd, entries)

    x = rng.standard_normal((8, 8, 8, ci)).astype(np.float32)
    mask = jnp.ones((8, 8, 8), bool)
    m = SubMConv3dDense(co, 3)
    m.init(jax.random.PRNGKey(0), jnp.asarray(x), mask)
    got = m.apply({"params": {"Conv_0": conv["params"]["m"]}},
                  jnp.asarray(x), mask)

    # torch conv3d weight [O, I, kd, kh, kw]; KRSC → permute (0, 4, 1, 2, 3)
    w = torch.from_numpy(sd["m.conv.weight"]).permute(0, 4, 1, 2, 3)
    xt = torch.from_numpy(x.transpose(3, 0, 1, 2))[None]
    want = F.conv3d(xt, w, torch.from_numpy(sd["m.conv.bias"]),
                    padding=1)[0].numpy().transpose(1, 2, 3, 0)
    assert np.abs(np.asarray(got, np.float32) - want).max() < 0.05  # bf16
    corr = np.corrcoef(np.asarray(got, np.float32).ravel(), want.ravel())[0, 1]
    assert corr > 0.999


# ---------------------------------------------------------------------------
# torchsparse ks=3 layout (x-fastest offsets) vs dense conv
# ---------------------------------------------------------------------------

def test_ts3_layout_oracle(rng):
    ci, co = 4, 6
    ts = rng.standard_normal((27, ci, co)).astype(np.float32)
    flax_k = irw._t_ts3(ts)

    # documented interpretation: ts[z*9+y*3+x, i, o] is the tap at offset
    # (x-1, y-1, z-1); the matching torch conv3d weight is
    # w[o, i, dx, dy, dz] = ts[dz*9 + dy*3 + dx, i, o]
    w = np.zeros((co, ci, 3, 3, 3), np.float32)
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                w[:, :, dx, dy, dz] = ts[dz * 9 + dy * 3 + dx].T

    x = rng.standard_normal((8, 8, 8, ci)).astype(np.float32)
    got = jax.lax.conv_general_dilated(
        jnp.asarray(x)[None], jnp.asarray(flax_k), (1, 1, 1), "SAME",
        dimension_numbers=("NXYZC", "XYZIO", "NXYZC"))[0]
    want = F.conv3d(torch.from_numpy(x.transpose(3, 0, 1, 2))[None],
                    torch.from_numpy(w),
                    padding=1)[0].numpy().transpose(1, 2, 3, 0)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


# ---------------------------------------------------------------------------
# torchsparse ks=2 stride-2 down/up layout vs torch
# ---------------------------------------------------------------------------

def test_ts2_down_layout_oracle(rng):
    from eprecon_tpu.models.dense3d import ConvDown3dDense

    c = 4
    ts = rng.standard_normal((8, c, c)).astype(np.float32)
    flax_k = irw._t_ts2(ts)
    x = rng.standard_normal((8, 8, 8, c)).astype(np.float32)
    mask = jnp.ones((8, 8, 8), bool)

    m = ConvDown3dDense(c, dtype=jnp.float32)
    m.init(jax.random.PRNGKey(0), jnp.asarray(x), mask)
    got, _ = m.apply({"params": {"Conv_0": {"kernel": jnp.asarray(flax_k)}}},
                     jnp.asarray(x), mask)

    # ts even-kernel taps are offsets {0,1} z-fastest:
    # w[o, i, dx, dy, dz] = ts[dx*4 + dy*2 + dz, i, o]
    w = np.zeros((c, c, 2, 2, 2), np.float32)
    for dx in range(2):
        for dy in range(2):
            for dz in range(2):
                w[:, :, dx, dy, dz] = ts[dx * 4 + dy * 2 + dz].T
    want = F.conv3d(torch.from_numpy(x.transpose(3, 0, 1, 2))[None],
                    torch.from_numpy(w),
                    stride=2)[0].numpy().transpose(1, 2, 3, 0)
    assert np.abs(np.asarray(got, np.float32) - want).max() < 0.05  # bf16
    corr = np.corrcoef(np.asarray(got, np.float32).ravel(), want.ravel())[0, 1]
    assert corr > 0.999


def test_ts2_up_layout_oracle(rng):
    from eprecon_tpu.models.dense3d import ConvUp3dDense

    ci, co = 4, 6
    ts = rng.standard_normal((8, ci, co)).astype(np.float32)
    flax_k = irw.TRANSFORMS["ts2T"](ts)
    x = rng.standard_normal((4, 4, 4, ci)).astype(np.float32)
    cmask = jnp.ones((4, 4, 4), bool)
    fmask = jnp.ones((8, 8, 8), bool)

    m = ConvUp3dDense(co, dtype=jnp.float32)
    m.init(jax.random.PRNGKey(0), jnp.asarray(x), cmask, fmask)
    got = m.apply(
        {"params": {"ConvTranspose_0": {"kernel": jnp.asarray(flax_k)}}},
        jnp.asarray(x), cmask, fmask)

    # torch conv_transpose3d weight [I, O, dx, dy, dz]; fine voxel
    # q = 2p + offset receives tap ts[offset]
    w = np.zeros((ci, co, 2, 2, 2), np.float32)
    for dx in range(2):
        for dy in range(2):
            for dz in range(2):
                w[:, :, dx, dy, dz] = ts[dx * 4 + dy * 2 + dz]
    want = F.conv_transpose3d(
        torch.from_numpy(x.transpose(3, 0, 1, 2))[None],
        torch.from_numpy(w), stride=2)[0].numpy().transpose(1, 2, 3, 0)
    assert np.abs(np.asarray(got, np.float32) - want).max() < 0.05  # bf16
    corr = np.corrcoef(np.asarray(got, np.float32).ravel(), want.ravel())[0, 1]
    assert corr > 0.999


# ---------------------------------------------------------------------------
# torch MultiheadAttention in_proj split
# ---------------------------------------------------------------------------

def test_mha_inproj_oracle(rng):
    from eprecon_tpu.models.panoptic.decoder import MultiHeadAttention

    c, h, q, l = 16, 4, 5, 7
    tm = torch.nn.MultiheadAttention(c, h, dropout=0.0)
    sd = {f"neucon_net.panoptic.transformer_cross_attention_layers.0."
          f"multihead_attn.{k}": v.detach().numpy()
          for k, v in tm.state_dict().items()}
    base = ("neucon_net.panoptic.transformer_cross_attention_layers.0."
            "multihead_attn")
    entries = []
    for qi, name in enumerate(("q", "k", "v")):
        entries += [
            irw.Entry(f"{base}.in_proj_weight", (3 * c, c), "params",
                      ("att", name, "kernel"), f"inproj_w{qi}"),
            irw.Entry(f"{base}.in_proj_bias", (3 * c,), "params",
                      ("att", name, "bias"), f"inproj_b{qi}")]
    entries += irw._linear(f"{base}.out_proj", c, c, ("att", "out"))
    conv = irw.apply_entries(sd, entries)

    qx = rng.standard_normal((q, c)).astype(np.float32)
    kx = rng.standard_normal((l, c)).astype(np.float32)
    m = MultiHeadAttention(h)
    m.init(jax.random.PRNGKey(0), jnp.asarray(qx), jnp.asarray(kx),
           jnp.asarray(kx))
    got = m.apply({"params": conv["params"]["att"]}, jnp.asarray(qx),
                  jnp.asarray(kx), jnp.asarray(kx))

    with torch.no_grad():
        want, _ = tm(torch.from_numpy(qx)[:, None],
                     torch.from_numpy(kx)[:, None],
                     torch.from_numpy(kx)[:, None])
    w = want[:, 0].numpy()
    assert np.abs(np.asarray(got, np.float32) - w).max() < 0.05  # bf16 qkv
    corr = np.corrcoef(np.asarray(got, np.float32).ravel(), w.ravel())[0, 1]
    assert corr > 0.999


# ---------------------------------------------------------------------------
# Fourier position encoding buffer
# ---------------------------------------------------------------------------

def test_fourier_posenc_oracle(rng):
    from eprecon_tpu.models.panoptic.position_encoding import \
        FourierPositionEncoding

    d_pos = 16
    gauss = rng.standard_normal((3, d_pos // 2)).astype(np.float32)
    xyz = rng.uniform(0, 32, (10, 3)).astype(np.float32)

    m = FourierPositionEncoding(d_pos)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(xyz), jnp.zeros(3),
               jnp.full(3, 32.0))
    got = m.apply({"buffers": {"gauss_B": jnp.asarray(gauss)}},
                  jnp.asarray(xyz), jnp.zeros(3), jnp.full(3, 32.0))

    # reference models/voxel_position_encoding.py:123-151 fourier math
    p = torch.from_numpy(xyz) / 32.0
    proj = (p * 2 * np.pi) @ torch.from_numpy(gauss)
    want = torch.cat([proj.sin(), proj.cos()], dim=1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


# ---------------------------------------------------------------------------
# Fusion_Block / ELAN conv stack oracle
# ---------------------------------------------------------------------------

def _torch_conv_bn_relu(sd, src, x, k):
    w = torch.from_numpy(sd[f"{src}.conv.weight"])
    b = torch.from_numpy(sd[f"{src}.conv.bias"])
    y = F.conv2d(x, w, b, padding=k // 2)
    y = F.batch_norm(y, torch.from_numpy(sd[f"{src}.bn.running_mean"]),
                     torch.from_numpy(sd[f"{src}.bn.running_var"]),
                     torch.from_numpy(sd[f"{src}.bn.weight"]),
                     torch.from_numpy(sd[f"{src}.bn.bias"]), False)
    return F.relu(y)


def test_fusion_block_oracle(rng):
    from eprecon_tpu.models.blocks import FusionBlock

    c = 8
    entries = irw._fusion_block("fb", c, ("fb",))
    sd = _conv_sd(entries)
    conv = irw.apply_entries(sd, entries)

    x = rng.standard_normal((1, 8, 8, c)).astype(np.float32)
    m = FusionBlock(use_running_average=True)
    m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = m.apply({"params": conv["params"]["fb"],
                   "batch_stats": conv["batch_stats"]["fb"]}, jnp.asarray(x))

    # torch replica of reference models/modules.py:313-370
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    t = lambda k: torch.from_numpy(sd[k])
    y = F.conv2d(xt, t("fb.conv1.weight"), t("fb.conv1.bias"), padding=1)
    y = F.batch_norm(y, t("fb.bn1.running_mean"), t("fb.bn1.running_var"),
                     t("fb.bn1.weight"), t("fb.bn1.bias"), False)
    y = F.relu(y)
    y = F.conv2d(y, t("fb.conv2.weight"), t("fb.conv2.bias"))
    y = F.batch_norm(y, t("fb.bn2.running_mean"), t("fb.bn2.running_var"),
                     t("fb.bn2.weight"), t("fb.bn2.bias"), False)
    y = F.relu(y)
    # ELAN
    f = _torch_conv_bn_relu(sd, "fb.ELAN.conv1", y, 1)
    f2 = _torch_conv_bn_relu(sd, "fb.ELAN.conv2", y, 1)
    f = torch.cat([f, f2], 1)
    for j in (3, 4, 5, 6):
        f2 = _torch_conv_bn_relu(sd, f"fb.ELAN.conv{j}", f2, 3)
        f = torch.cat([f, f2], 1)
    want = _torch_conv_bn_relu(sd, "fb.ELAN.conv7", f, 1)
    w = want.numpy().transpose(0, 2, 3, 1)
    g = np.asarray(got, np.float32)
    assert np.abs(g - w).max() < 0.08  # bf16 conv chain
    assert np.corrcoef(g.ravel(), w.ravel())[0, 1] > 0.999


# ---------------------------------------------------------------------------
# full-schema load into the real model (slow)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_full_schema_loads_into_model():
    """A random checkpoint with the reference's exact key schema converts and
    merges into the real (default channel plan) model without any missing
    path or shape mismatch — the structural half of parity."""
    from eprecon_tpu.config import default_config
    from eprecon_tpu.models.eprecon import EPRecon, make_recurrent_state
    from eprecon_tpu.data.synthetic import make_fragment
    from eprecon_tpu.models.eprecon import FragmentInputs

    cfg = default_config()
    m = dataclasses.replace(
        cfg.model, n_vox=(16, 16, 16), voxel_size=0.24,
        voxel_capacity=(64, 256, 1024), global_extent=(32, 32, 16),
        min_init_voxels=10, min_stage_voxels=5)  # default channels/queries
    cfg = dataclasses.replace(cfg, model=m)

    d = make_fragment(n_views=2, image_hw=(48, 64), n_vox=m.n_vox,
                      voxel_size=m.voxel_size, seed=0)
    frag = FragmentInputs(jnp.asarray(d["proj_matrices"]),
                          jnp.asarray(d["vol_origin_partial"]),
                          jnp.asarray(d["world_to_aligned_camera"]),
                          jnp.zeros((3, 3), jnp.int32))
    model = EPRecon(cfg.model)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.asarray(d["imgs"]), frag,
                                    make_recurrent_state(cfg.model), None)

    entries, _ = irw.all_entries()
    sd = irw.random_state_dict(entries)
    converted = irw.convert_reference_state_dict(sd)
    merged = irw.merge_variables(variables, converted, check_shapes=True)

    n_converted = sum(1 for _ in irw._iter_leaves(converted))
    assert n_converted > 900  # the full reference parameter surface
    # spot-check deep leaves actually landed (incl. the fused zr gate:
    # out = [z | r] concat)
    got = np.asarray(
        merged["params"]["neucon_net"]["gru_fusion_1"]["gru_img"]["convq"]
        ["point_transform"]["kernel"])
    want = irw._t_lin(
        sd["neucon_net.gru_fusion.fusion_nets_img.1.convq.point_transforms.0"
           ".weight"])
    np.testing.assert_allclose(got, want, atol=1e-6)
    zr = np.asarray(
        merged["params"]["neucon_net"]["gru_fusion_1"]["gru_img"]["convzr"]
        ["point_transform"]["kernel"])
    ch = zr.shape[1] // 2
    np.testing.assert_allclose(
        zr[:, :ch],
        irw._t_lin(sd["neucon_net.gru_fusion.fusion_nets_img.1.convz"
                      ".point_transforms.0.weight"]), atol=1e-6)
    np.testing.assert_allclose(
        zr[:, ch:],
        irw._t_lin(sd["neucon_net.gru_fusion.fusion_nets_img.1.convr"
                      ".point_transforms.0.weight"]), atol=1e-6)
    # and that the converted model still runs
    (outputs, _, _), _ = model.apply(
        merged, jnp.asarray(d["imgs"]), frag, make_recurrent_state(cfg.model),
        None, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(outputs["tsdf"], np.float32)).all()
