"""Record layout-ground-truth activation fingerprints from a REAL reference
checkpoint, in an environment that has torch (+ torchsparse for its offset
table). Counterpart of eprecon_tpu/tools/fingerprint.py — see its docstring
for the protocol and the exact probe semantics this script must mirror.

Usage (in the reference environment):
    python tools_dev/record_reference_fingerprint.py model_000099.ckpt fp.json

For each layout-sensitive probe kernel this builds a dense [kx, ky, kz, I, O]
kernel by placing every torchsparse row at the offset reported by
``torchsparse.nn.utils.get_kernel_offsets`` — the LIBRARY's own enumeration,
independent of any assumption in this repo — then runs the probe convolution
in torch and records the output. eprecon_tpu's converter then verifies (and
auto-flips) its enumeration assumptions against this recording
(``import_reference_weights.py --fingerprint fp.json``).

torch↔flax probe correspondences are the ones oracle-tested in
tests/test_import_reference.py (conv3d = NDHWC/DHWIO correlation;
conv_transpose3d with offset-placed [I, O, kx, ky, kz] weight = flax
ConvTranspose on the spatially flipped kernel — test_ts2_up_layout_oracle).

spconv caveat: KRSC is a dense layout (no offset table); its fingerprint
records the documented [O, kd, kh, kw, I] contract with (kd, kh, kw) taken as
our (x, y, z). A reference-axis swap there is an input-orientation question,
not a kernel-enumeration one — covered instead by the golden-activation
oracle tests.
"""
import json
import sys

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, __file__.rsplit("/tools_dev/", 1)[0])

from eprecon_tpu.tools import fingerprint as fp
from eprecon_tpu.tools import import_reference_weights as irw


def placed_kernel(w: np.ndarray) -> np.ndarray:
    """torchsparse [K, I, O] → dense [kx, ky, kz, I, O] using the library's
    own offset enumeration."""
    from torchsparse.nn import utils as tsu

    k, ci, co = w.shape
    ks = round(k ** (1 / 3))
    offs = tsu.get_kernel_offsets(ks, stride=1).cpu().numpy()  # [K, 3] xyz
    lo = offs.min(axis=0)
    dense = np.zeros((ks, ks, ks, ci, co), np.float32)
    for row, (ox, oy, oz) in enumerate(offs - lo):
        dense[ox, oy, oz] = w[row]
    return dense


def probe_torch(kernel: np.ndarray, transform: str, src_key: str
                ) -> np.ndarray:
    rng = np.random.default_rng(fp.seed_for(src_key))
    ci = kernel.shape[3]
    x = rng.standard_normal((1, 5, 5, 5, ci)).astype(np.float32)
    x_cf = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
    if transform == "ts2T":
        w = torch.from_numpy(kernel.transpose(3, 4, 0, 1, 2))  # [I,O,kx,ky,kz]
        y = F.conv_transpose3d(x_cf, w, stride=2)
    else:
        w = torch.from_numpy(kernel.transpose(4, 3, 0, 1, 2))  # [O,I,kx,ky,kz]
        if transform == "ts2":
            y = F.conv3d(x_cf, w, stride=2)
        else:  # ts3 / ts3_pad3 / spconv: stride-1 SAME
            y = F.conv3d(x_cf, w, padding=kernel.shape[0] // 2)
    flat = y.numpy().transpose(0, 2, 3, 4, 1).astype(np.float64).reshape(-1)
    return np.concatenate([flat[:48], [flat.mean(), flat.std()]])


def main(ckpt_path: str, out_path: str) -> None:
    sd = irw.load_torch_checkpoint(ckpt_path)
    probes = {}
    for e in fp.probe_entries():
        if e.src not in sd:
            print(f"skip (missing): {e.src}")
            continue
        w = np.asarray(sd[e.src], np.float32)
        if e.transform == "spconv":
            dense = np.ascontiguousarray(w.transpose(1, 2, 3, 4, 0))
        else:
            dense = placed_kernel(w)
            if e.transform == "ts3_pad3":
                pad = np.zeros(dense.shape[:3] + (3, dense.shape[4]),
                               dense.dtype)
                dense = np.concatenate([dense, pad], axis=3)
        probes[e.src] = probe_torch(dense, e.transform, e.src).tolist()
        print(f"recorded {e.transform}: {e.src}")
    with open(out_path, "w") as f:
        json.dump({"version": 1, "probes": probes}, f)
    print(f"wrote {out_path} ({len(probes)} probes)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
