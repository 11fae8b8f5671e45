"""Converter activation-fingerprint check: a checkpoint whose kernel-offset
enumeration differs from the converter's default assumption is detected and
the layout auto-flipped (VERDICT r3 #8; risk origin: torchsparse kernel
ordering, reference models/modules.py:75-175)."""
import numpy as np
import pytest

from eprecon_tpu.tools import fingerprint as fp
from eprecon_tpu.tools import import_reference_weights as irw


def _probe_sd(seed=0):
    rng = np.random.default_rng(seed)
    return {e.src: rng.normal(0, 0.1, e.src_shape).astype(np.float32)
            for e in fp.probe_entries()}


def test_probe_entries_cover_every_sensitive_transform():
    kinds = {e.transform for e in fp.probe_entries()}
    assert kinds == set(fp.SENSITIVE)


def test_roundtrip_default_layout():
    sd = _probe_sd()
    expected = fp.fingerprint_state_dict(sd, fp.DEFAULT_LAYOUT)
    layout, diffs = fp.verify_or_fix_layout(sd, expected)
    assert layout == fp.DEFAULT_LAYOUT
    assert max(diffs.values()) < 1e-6


def test_permuted_checkpoint_detected_and_corrected():
    # Simulate: the real library actually enumerates odd kernels z-fastest
    # and even kernels x-fastest (opposite of the converter defaults). The
    # "recording" comes from that true layout; verification must flip to it.
    true_layout = dict(fp.DEFAULT_LAYOUT, ts_odd="zfast", ts_even="xfast")
    sd = _probe_sd(seed=1)
    recorded = fp.fingerprint_state_dict(sd, true_layout)
    layout, diffs = fp.verify_or_fix_layout(sd, recorded)
    assert layout == true_layout
    assert max(diffs.values()) < 1e-6


def test_every_layout_is_identified():
    sd = _probe_sd(seed=2)
    for true_layout in fp.all_layouts():
        recorded = fp.fingerprint_state_dict(sd, true_layout)
        layout, _ = fp.verify_or_fix_layout(sd, recorded)
        # spconv flip is invisible to ts probes and vice versa, so identity
        # must hold per axis as long as each axis has a probe
        assert layout == true_layout, (fp.layout_name(layout),
                                       fp.layout_name(true_layout))


def test_corrupt_checkpoint_raises():
    sd = _probe_sd(seed=3)
    expected = fp.fingerprint_state_dict(sd, fp.DEFAULT_LAYOUT)
    rng = np.random.default_rng(99)
    sd_bad = {k: v + rng.normal(0, 0.05, v.shape).astype(np.float32)
              for k, v in sd.items()}
    with pytest.raises(ValueError, match="no kernel-enumeration layout"):
        fp.verify_or_fix_layout(sd_bad, expected)


def test_transforms_for_default_matches_converter():
    sd = _probe_sd(seed=4)
    t = fp.transforms_for(fp.DEFAULT_LAYOUT)
    for e in fp.probe_entries():
        a = irw.TRANSFORMS[e.transform](sd[e.src])
        b = t[e.transform](sd[e.src])
        np.testing.assert_array_equal(a, b)
