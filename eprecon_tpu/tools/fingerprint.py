"""Activation-fingerprint verification for the reference-checkpoint converter.

Closes the offline-closable half of the torchsparse/spconv layout risk
(reference models/modules.py:75-175 torchsparse kernel [K, I, O] offset
enumeration; models/occupancy_initialization.py:30-36 spconv KRSC): the
enumeration ORDER of the K kernel offsets is a shape-invariant permutation,
so a wrong assumption converts silently. The converter's torch oracles
(tests/test_import_reference.py) embed the same assumption they test, so
they cannot catch it either (ADVICE r2).

Protocol
--------
1. In an environment that HAS the real libraries, run
   ``tools_dev/record_reference_fingerprint.py <ckpt> <out.json>``. It builds,
   for one representative kernel per layout-sensitive transform, a dense
   conv kernel by placing each of the K rows at the offset position reported
   by the LIBRARY ITSELF (``torchsparse.nn.utils.get_kernel_offsets`` /
   spconv's KRSC contract) — ground truth independent of any assumption in
   this repo — and records the dense-conv output on a fixed seeded input.
2. Here, ``verify_or_fix_layout(sd, expected)`` converts the same kernels
   under every candidate enumeration order (8 combos over ts-odd / ts-even /
   spconv spatial order), runs the SAME probe convolutions in JAX, and picks
   the layout whose activations match the recording. The converter then uses
   that layout for the full conversion.

A mismatch that NO layout explains raises — that means a converter bug or a
corrupted checkpoint, not an enumeration-order issue.

Probe semantics (must match the recorder exactly):
  * input: standard-normal, ``np.random.default_rng(seed_for(src_key))``,
    shape [1, 5, 5, 5, I] (channels-last; spatial axes in the order of the
    CONVERTED kernel's first three axes).
  * ts3 / ts3_pad3 / spconv: stride-1 SAME conv.
  * ts2: stride-2 VALID conv.  * ts2T: stride-2 VALID conv_transpose
    (flax ConvTranspose semantics: ``lax.conv_transpose`` without kernel
    transposition — the converted kernel already bakes the spatial flip).
  * fingerprint: first 48 values of the flattened output, then mean, std.
"""
from __future__ import annotations

import itertools
import json
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from eprecon_tpu.tools import import_reference_weights as irw

# Layout axes: each is a shape-invariant enumeration ambiguity.
#   ts_odd:  torchsparse ks=3 [27, I, O] — "xfast" (x-fastest, the
#            get_kernel_offsets order for odd kernels; repo default) or
#            "zfast" (z-fastest).
#   ts_even: torchsparse ks=2 [8, I, O] — "zfast" (repo default) or "xfast".
#   spconv:  spconv KRSC [O, kd, kh, kw, I] spatial order — "dhw" (repo
#            default: axes map to our (x, y, z)) or "whd" (reversed).
LAYOUT_AXES = {
    "ts_odd": ("xfast", "zfast"),
    "ts_even": ("zfast", "xfast"),
    "spconv": ("dhw", "whd"),
}
DEFAULT_LAYOUT = {k: v[0] for k, v in LAYOUT_AXES.items()}

# transforms whose enumeration order is at risk → layout axis they follow
SENSITIVE = {"ts3": "ts_odd", "ts3_pad3": "ts_odd",
             "ts2": "ts_even", "ts2T": "ts_even",
             "spconv": "spconv"}


def _ts3_with(order: str) -> Callable[[np.ndarray], np.ndarray]:
    def t(w):
        k, i, o = w.shape
        assert k == 27, w.shape
        cube = w.reshape(3, 3, 3, i, o)
        if order == "xfast":      # flat = z*9 + y*3 + x → (z, y, x, I, O)
            cube = cube.transpose(2, 1, 0, 3, 4)
        return np.ascontiguousarray(cube)  # zfast: flat = x*9+y*3+z → direct
    return t


def _ts2_with(order: str) -> Callable[[np.ndarray], np.ndarray]:
    def t(w):
        k, i, o = w.shape
        assert k == 8, w.shape
        cube = w.reshape(2, 2, 2, i, o)
        if order == "xfast":
            cube = cube.transpose(2, 1, 0, 3, 4)
        return np.ascontiguousarray(cube)
    return t


def _spconv_with(order: str) -> Callable[[np.ndarray], np.ndarray]:
    def t(w):
        v = np.transpose(w, (1, 2, 3, 4, 0))   # KRSC → [kd, kh, kw, I, O]
        if order == "whd":
            v = np.transpose(v, (2, 1, 0, 3, 4))
        return np.ascontiguousarray(v)
    return t


def transforms_for(layout: Dict[str, str]) -> Dict[str, Callable]:
    """TRANSFORMS with the layout-sensitive kernel reshapes overridden."""
    ts3 = _ts3_with(layout["ts_odd"])
    ts2 = _ts2_with(layout["ts_even"])

    def ts3_pad3(w):
        k = ts3(w)
        pad = np.zeros(k.shape[:3] + (3, k.shape[4]), k.dtype)
        return np.concatenate([k, pad], axis=3)

    t = dict(irw.TRANSFORMS)
    t.update({"ts3": ts3, "ts3_pad3": ts3_pad3, "ts2": ts2,
              "ts2T": lambda w: np.ascontiguousarray(
                  ts2(w)[::-1, ::-1, ::-1]),
              "spconv": _spconv_with(layout["spconv"])})
    return t


def layout_name(layout: Dict[str, str]) -> str:
    return ",".join(f"{k}={layout[k]}" for k in sorted(LAYOUT_AXES))


def all_layouts() -> List[Dict[str, str]]:
    keys = sorted(LAYOUT_AXES)
    combos = itertools.product(*(LAYOUT_AXES[k] for k in keys))
    return [dict(zip(keys, c)) for c in combos]


def probe_entries() -> List[irw.Entry]:
    """One representative converter entry per sensitive transform.

    Skips spatially-degenerate kernels (a 1x1x1 spconv kernel is invariant
    under any spatial-order flip, so it cannot identify the layout axis)."""
    entries, _ = irw.all_entries()
    picked: Dict[str, irw.Entry] = {}
    for e in entries:
        if e.transform not in SENSITIVE or e.transform in picked:
            continue
        if e.transform == "spconv" and e.src_shape[1] == 1:  # [O,kd,kh,kw,I]
            continue
        picked[e.transform] = e
    return [picked[k] for k in sorted(picked)]


def seed_for(key: str) -> int:
    """Stable probe-input seed (hash() is salted per process — use crc32)."""
    import zlib
    return zlib.crc32(key.encode()) & 0x7FFFFFFF


def _probe_output(kernel: np.ndarray, transform: str, src_key: str
                  ) -> np.ndarray:
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(seed_for(src_key))
    ci = kernel.shape[3]
    x = rng.standard_normal((1, 5, 5, 5, ci)).astype(np.float32)
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                    ("NDHWC", "DHWIO", "NDHWC"))
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        if transform in ("ts3", "ts3_pad3", "spconv"):
            y = lax.conv_general_dilated(jnp.asarray(x), jnp.asarray(kernel),
                                         (1, 1, 1), "SAME",
                                         dimension_numbers=dn)
        elif transform == "ts2":
            y = lax.conv_general_dilated(jnp.asarray(x), jnp.asarray(kernel),
                                         (2, 2, 2), "VALID",
                                         dimension_numbers=dn)
        elif transform == "ts2T":
            y = lax.conv_transpose(jnp.asarray(x), jnp.asarray(kernel),
                                   (2, 2, 2), "VALID", dimension_numbers=dn)
        else:  # pragma: no cover
            raise ValueError(transform)
    flat = np.asarray(y, np.float64).reshape(-1)
    return np.concatenate([flat[:48], [flat.mean(), flat.std()]])


def fingerprint_state_dict(sd: Dict[str, np.ndarray],
                           layout: Optional[Dict[str, str]] = None
                           ) -> Dict[str, List[float]]:
    """Per-probe activation fingerprints of `sd` under `layout`."""
    layout = layout or DEFAULT_LAYOUT
    t = transforms_for(layout)
    out = {}
    for e in probe_entries():
        if e.src not in sd:
            continue
        w = np.asarray(sd[e.src], np.float32)
        if tuple(w.shape) != e.src_shape:
            raise ValueError(f"{e.src}: shape {w.shape} != {e.src_shape}")
        out[e.src] = _probe_output(t[e.transform](w), e.transform,
                                   e.src).tolist()
    return out


def verify_or_fix_layout(sd: Dict[str, np.ndarray],
                         expected: Dict[str, List[float]],
                         atol: float = 1e-3, rtol: float = 1e-3
                         ) -> Tuple[Dict[str, str], Dict[str, float]]:
    """Find the enumeration layout under which `sd` reproduces the recorded
    activation fingerprints. Returns (layout, max-abs-diff per probe).

    Tries DEFAULT_LAYOUT first; on mismatch searches all combinations and
    returns the first full match (with a printed warning naming the flip).
    Raises ValueError if no layout explains the recording."""
    diags = {}
    for layout in [DEFAULT_LAYOUT] + [l for l in all_layouts()
                                      if l != DEFAULT_LAYOUT]:
        got = fingerprint_state_dict(sd, layout)
        keys = [k for k in expected if k in got]
        if not keys:
            raise ValueError("no probe key of the recording is present in "
                             "the checkpoint")
        diffs = {k: float(np.max(np.abs(np.asarray(got[k]) -
                                        np.asarray(expected[k]))))
                 for k in keys}
        ok = all(np.allclose(got[k], expected[k], atol=atol, rtol=rtol)
                 for k in keys)
        diags[layout_name(layout)] = diffs
        if ok:
            if layout != DEFAULT_LAYOUT:
                print(f"fingerprint: default layout MISMATCHED; "
                      f"auto-flipped to {layout_name(layout)}")
            return layout, diffs
    lines = "\n".join(f"  {n}: {d}" for n, d in diags.items())
    raise ValueError(
        "no kernel-enumeration layout reproduces the recorded activation "
        f"fingerprints — converter bug or corrupt checkpoint:\n{lines}")


def save_fingerprint(fp: Dict[str, List[float]], path: str) -> None:
    with open(path, "w") as f:
        json.dump({"version": 1, "probes": fp}, f)


def load_fingerprint(path: str) -> Dict[str, List[float]]:
    with open(path) as f:
        d = json.load(f)
    return d["probes"] if "probes" in d else d
