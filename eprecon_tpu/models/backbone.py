"""MNASNet-1.0 trunk + FPN backbone (flax.linen, NHWC).

TPU-native re-implementation of the reference backbone
(reference: models/backbone.py:22-77): the torchvision MNASNet layers 0-8 /
9 / 10 trunk feeding a 3-level top-down FPN, emitting feature maps at
1/4 (24ch), 1/8 (40ch), 1/16 (80ch) of a 640x480 input, fine→coarse order.

Weight import from a torchvision checkpoint is supported offline via
eprecon_tpu/tools/import_backbone_weights.py (parity testing); training from
scratch uses He init.
"""
from __future__ import annotations

from typing import Any, List, Sequence

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp


def _round_to_multiple_of(val: float, divisor: int, round_up_bias: float = 0.9) -> int:
    # reference models/backbone.py:6-12
    new_val = max(divisor, int(val + divisor / 2) // divisor * divisor)
    return new_val if new_val >= round_up_bias * val else new_val + divisor


def get_depths(alpha: float) -> List[int]:
    # reference models/backbone.py:15-19
    depths = [32, 16, 24, 40, 80, 96, 192, 320]
    return [_round_to_multiple_of(d * alpha, 8) for d in depths]


class InvertedResidual(nn.Module):
    """MNASNet MBConv block: 1x1 expand → kxk depthwise → 1x1 project."""
    in_ch: int
    out_ch: int
    kernel: int
    stride: int
    expansion: int
    use_running_average: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        mid = self.in_ch * self.expansion
        ura = self.use_running_average
        _Conv = functools.partial(nn.Conv, dtype=self.dtype)
        h = _Conv(mid, (1, 1), use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=ura, dtype=self.dtype)(h)
        h = nn.relu(h)
        pad = self.kernel // 2
        h = _Conv(mid, (self.kernel, self.kernel), strides=self.stride,
                  padding=((pad, pad), (pad, pad)),
                  feature_group_count=mid, use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=ura, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = _Conv(self.out_ch, (1, 1), use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=ura, dtype=self.dtype)(h)
        if self.stride == 1 and self.in_ch == self.out_ch:
            h = h + x
        return h


class MBStack(nn.Module):
    in_ch: int
    out_ch: int
    kernel: int
    stride: int
    expansion: int
    repeats: int
    use_running_average: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = InvertedResidual(self.in_ch, self.out_ch, self.kernel, self.stride,
                             self.expansion, self.use_running_average,
                             self.dtype)(x)
        for _ in range(self.repeats - 1):
            x = InvertedResidual(self.out_ch, self.out_ch, self.kernel, 1,
                                 self.expansion, self.use_running_average,
                                 self.dtype)(x)
        return x


class MnasMulti(nn.Module):
    """3-scale FPN over an MNASNet trunk. Input NHWC, output fine→coarse.

    For alpha=1 and input [N, 480, 640, 3] returns
    [[N,120,160,24], [N,60,80,40], [N,30,40,80]]
    (reference models/backbone.py:59-77).
    """
    alpha: float = 1.0
    use_running_average: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        d = get_depths(self.alpha)
        ura = self.use_running_average
        _Conv = functools.partial(nn.Conv, dtype=self.dtype)

        # conv0 = torchvision layers 0-8 (reference backbone.py:32-42)
        # torch-style symmetric padding (flax SAME pads (0,1) at stride 2)
        h = _Conv(d[0], (3, 3), strides=2, padding=((1, 1), (1, 1)),
                  use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=ura, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = _Conv(d[0], (3, 3), padding="SAME", feature_group_count=d[0],
                    use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=ura, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = _Conv(d[1], (1, 1), use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=ura, dtype=self.dtype)(h)
        conv0 = MBStack(d[1], d[2], 3, 2, 3, 3, ura, self.dtype)(h)       # 1/4, 24ch
        conv1 = MBStack(d[2], d[3], 5, 2, 3, 3, ura, self.dtype)(conv0)   # 1/8, 40ch
        conv2 = MBStack(d[3], d[4], 5, 2, 6, 3, ura, self.dtype)(conv1)   # 1/16, 80ch

        # FPN (reference backbone.py:47-77)
        final_chs = d[4]
        intra = conv2
        out_coarse = _Conv(final_chs, (1, 1), use_bias=False)(intra)

        up = jax.image.resize(intra, (intra.shape[0], intra.shape[1] * 2,
                                      intra.shape[2] * 2, intra.shape[3]), "nearest")
        intra = up + _Conv(final_chs, (1, 1), use_bias=True)(conv1)
        out_mid = _Conv(d[3], (3, 3), padding="SAME", use_bias=False)(intra)

        up = jax.image.resize(intra, (intra.shape[0], intra.shape[1] * 2,
                                      intra.shape[2] * 2, intra.shape[3]), "nearest")
        intra = up + _Conv(final_chs, (1, 1), use_bias=True)(conv0)
        out_fine = _Conv(d[2], (3, 3), padding="SAME", use_bias=False)(intra)

        return [out_fine, out_mid, out_coarse]
