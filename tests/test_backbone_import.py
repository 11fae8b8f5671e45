"""MNASNet weight import: the flax backbone trunk must reproduce a torch
trunk with identical weights (parity path, reference models/backbone.py:28).
torchvision isn't installed here, so the torch trunk (same structure and
state_dict key layout as torchvision mnasnet1_0) is built inline.
"""
import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from eprecon_tpu.models.backbone import MBStack, get_depths
from eprecon_tpu.tools.import_backbone_weights import convert_mnasnet


class _InvertedResidual(nn.Module):
    """torchvision.models.mnasnet._InvertedResidual equivalent."""

    def __init__(self, in_ch, out_ch, kernel, stride, expansion):
        super().__init__()
        mid = in_ch * expansion
        self.apply_residual = in_ch == out_ch and stride == 1
        self.layers = nn.Sequential(
            nn.Conv2d(in_ch, mid, 1, bias=False),
            nn.BatchNorm2d(mid),
            nn.ReLU(inplace=True),
            nn.Conv2d(mid, mid, kernel, padding=kernel // 2, stride=stride,
                      groups=mid, bias=False),
            nn.BatchNorm2d(mid),
            nn.ReLU(inplace=True),
            nn.Conv2d(mid, out_ch, 1, bias=False),
            nn.BatchNorm2d(out_ch),
        )

    def forward(self, x):
        out = self.layers(x)
        return out + x if self.apply_residual else out


def _stack(in_ch, out_ch, kernel, stride, exp, repeats):
    mods = [_InvertedResidual(in_ch, out_ch, kernel, stride, exp)]
    for _ in range(repeats - 1):
        mods.append(_InvertedResidual(out_ch, out_ch, kernel, 1, exp))
    return nn.Sequential(*mods)


class TorchTrunk(nn.Module):
    """layers 0-10 of torchvision mnasnet1_0 (same state_dict keys)."""

    def __init__(self):
        super().__init__()
        d = get_depths(1.0)
        self.layers = nn.Sequential(
            nn.Conv2d(3, d[0], 3, padding=1, stride=2, bias=False),
            nn.BatchNorm2d(d[0]),
            nn.ReLU(inplace=True),
            nn.Conv2d(d[0], d[0], 3, padding=1, groups=d[0], bias=False),
            nn.BatchNorm2d(d[0]),
            nn.ReLU(inplace=True),
            nn.Conv2d(d[0], d[1], 1, bias=False),
            nn.BatchNorm2d(d[1]),
            _stack(d[1], d[2], 3, 2, 3, 3),
            _stack(d[2], d[3], 5, 2, 3, 3),
            _stack(d[3], d[4], 5, 2, 6, 3),
        )

    def forward(self, x):
        h = x
        for i in range(9):
            h = self.layers[i](h)
        c0 = h
        c1 = self.layers[9](c0)
        c2 = self.layers[10](c1)
        return c0, c1, c2


class FlaxTrunk(fnn.Module):
    @fnn.compact
    def __call__(self, x):
        d = get_depths(1.0)
        h = fnn.Conv(d[0], (3, 3), strides=2, padding=((1, 1), (1, 1)), use_bias=False,
                     dtype=jnp.float32)(x)
        h = fnn.BatchNorm(use_running_average=True)(h)
        h = fnn.relu(h)
        h = fnn.Conv(d[0], (3, 3), padding="SAME", feature_group_count=d[0],
                     use_bias=False, dtype=jnp.float32)(h)
        h = fnn.BatchNorm(use_running_average=True)(h)
        h = fnn.relu(h)
        h = fnn.Conv(d[1], (1, 1), use_bias=False, dtype=jnp.float32)(h)
        h = fnn.BatchNorm(use_running_average=True)(h)
        c0 = MBStack(d[1], d[2], 3, 2, 3, 3, True, jnp.float32)(h)
        c1 = MBStack(d[2], d[3], 5, 2, 3, 3, True, jnp.float32)(c0)
        c2 = MBStack(d[3], d[4], 5, 2, 6, 3, True, jnp.float32)(c1)
        return c0, c1, c2


def test_trunk_matches_torch(rng):
    tm = TorchTrunk()
    tm.eval()
    # randomize batch norm stats so the test is nontrivial
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_mnasnet(sd)

    x = rng.standard_normal((1, 96, 128, 3)).astype(np.float32)
    trunk = FlaxTrunk()
    tv = trunk.init(jax.random.PRNGKey(0), jnp.asarray(x))
    v = {"params": dict(tv["params"]), "batch_stats": dict(tv["batch_stats"])}
    v["params"].update(params)
    v["batch_stats"].update(stats)
    c0, c1, c2 = trunk.apply(v, jnp.asarray(x))

    with torch.no_grad():
        t0, t1, t2 = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    for got, want in ((c0, t0), (c1, t1), (c2, t2)):
        w = want.numpy().transpose(0, 2, 3, 1)
        g = np.asarray(got, np.float32)
        assert g.shape == w.shape
        assert np.abs(g - w).max() < 2e-3, np.abs(g - w).max()
        corr = np.corrcoef(g.ravel(), w.ravel())[0, 1]
        assert corr > 0.99999
