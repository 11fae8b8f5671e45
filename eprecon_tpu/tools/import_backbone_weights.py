"""Import torchvision MNASNet-1.0 weights into the flax MnasMulti backbone.

The reference initializes its backbone from ImageNet-pretrained torchvision
MNASNet (reference models/backbone.py:28). This tool converts a local
torchvision state_dict (.pth) — or a reference EPRecon checkpoint's
backbone2d/backbone_occ_pano subtrees — into the flax parameter pytree, for
accuracy-parity evaluation against the CUDA reference.

Usage:
  python -m eprecon_tpu.tools.import_backbone_weights \
      --torch_ckpt mnasnet1.0_top1_73.512-f206786ef8.pth \
      --out backbone_params.msgpack
"""
from __future__ import annotations

import argparse
from typing import Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    """torch [out, in/groups, kh, kw] → flax [kh, kw, in/groups, out]."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _bn(prefix: str, sd) -> Tuple[Dict, Dict]:
    params = {"scale": np.asarray(sd[f"{prefix}.weight"]),
              "bias": np.asarray(sd[f"{prefix}.bias"])}
    stats = {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
             "var": np.asarray(sd[f"{prefix}.running_var"])}
    return params, stats


def convert_mnasnet(sd, prefix: str = "layers") -> Tuple[Dict, Dict]:
    """torchvision mnasnet1_0 state_dict → (params, batch_stats) for
    eprecon_tpu.models.backbone.MnasMulti (trunk only; FPN heads are new)."""
    params: Dict = {}
    stats: Dict = {}

    def put(flax_name, conv_key, bn_key=None):
        params[flax_name] = {"kernel": _conv(sd[conv_key])}
        if bn_key:
            bnp, bns = _bn(bn_key, sd)
            n = flax_name.replace("Conv", "BatchNorm")
            params[n] = bnp
            stats[n] = bns

    # stem: layers 0/1, 3/4, 6/7 (reference backbone.py:32-42 conv0 head)
    put("Conv_0", f"{prefix}.0.weight", f"{prefix}.1")
    put("Conv_1", f"{prefix}.3.weight", f"{prefix}.4")
    put("Conv_2", f"{prefix}.6.weight", f"{prefix}.7")

    # stacks 8, 9, 10 → MBStack_0..2 with InvertedResidual_0..2
    for si, layer in enumerate((8, 9, 10)):
        stack: Dict = {}
        sstats: Dict = {}
        for bi in range(3):
            blk: Dict = {}
            bstats: Dict = {}
            base = f"{prefix}.{layer}.{bi}.layers"
            for ci, (conv_idx, bn_idx) in enumerate(((0, 1), (3, 4), (6, 7))):
                blk[f"Conv_{ci}"] = {"kernel": _conv(sd[f"{base}.{conv_idx}.weight"])}
                bnp, bns = _bn(f"{base}.{bn_idx}", sd)
                blk[f"BatchNorm_{ci}"] = bnp
                bstats[f"BatchNorm_{ci}"] = bns
            stack[f"InvertedResidual_{bi}"] = blk
            sstats[f"InvertedResidual_{bi}"] = bstats
        params[f"MBStack_{si}"] = stack
        stats[f"MBStack_{si}"] = sstats
    return params, stats


def merge_into_backbone(variables, converted_params, converted_stats,
                        backbone_name: str):
    """Graft converted trunk weights into a full model's variables dict."""
    import flax

    v = flax.core.unfreeze(variables) if hasattr(variables, "unfreeze") else dict(variables)
    p = dict(v["params"][backbone_name])
    p.update(converted_params)
    v["params"] = dict(v["params"])
    v["params"][backbone_name] = p
    bs = dict(v.get("batch_stats", {}))
    b = dict(bs.get(backbone_name, {}))
    b.update(converted_stats)
    bs[backbone_name] = b
    v["batch_stats"] = bs
    return v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--prefix", default="layers")
    args = ap.parse_args()

    import torch

    sd = torch.load(args.torch_ckpt, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    params, stats = convert_mnasnet(sd, args.prefix)

    from flax import serialization

    with open(args.out, "wb") as f:
        f.write(serialization.msgpack_serialize(
            {"params": params, "batch_stats": stats}))
    print(f"wrote {args.out}: {len(params)} param groups")


if __name__ == "__main__":
    main()
