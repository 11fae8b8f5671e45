"""Checkpoint save/restore roundtrip (orbax)."""
import jax.numpy as jnp
import numpy as np

from eprecon_tpu.train import checkpoint as ckpt
from eprecon_tpu.train.state import TrainState


def _state(v):
    return TrainState(
        params={"layer": {"kernel": jnp.full((4, 4), v)}},
        batch_stats={"batch_stats": {"bn": {"mean": jnp.full(4, v)}},
                     "buffers": {}},
        opt_state={"count": jnp.asarray(int(v), jnp.int32)},
        step=jnp.asarray(int(v), jnp.int32),
        epoch=jnp.asarray(int(v), jnp.int32))


def test_save_restore_roundtrip(tmp_path):
    logdir = str(tmp_path)
    s1 = _state(3.0)
    ckpt.save_checkpoint(logdir, 7, s1)
    assert ckpt.latest_checkpoint(logdir).endswith("model_000007")
    restored = ckpt.restore_checkpoint(ckpt.latest_checkpoint(logdir), _state(0.0))
    np.testing.assert_allclose(np.asarray(restored.params["layer"]["kernel"]),
                               np.full((4, 4), 3.0))
    assert int(restored.epoch) == 3


def test_latest_picks_highest(tmp_path):
    logdir = str(tmp_path)
    for e in (1, 12, 3):
        ckpt.save_checkpoint(logdir, e, _state(float(e)))
    assert ckpt.latest_checkpoint(logdir).endswith("model_000012")


def test_restore_submodule(tmp_path):
    logdir = str(tmp_path)
    donor = _state(9.0)
    path = ckpt.save_checkpoint(logdir, 1, donor)
    target = _state(0.0).params
    target["other"] = {"w": jnp.zeros(2)}
    merged = ckpt.restore_submodule(path, target, prefix="layer")
    np.testing.assert_allclose(np.asarray(merged["layer"]["kernel"]),
                               np.full((4, 4), 9.0))
    np.testing.assert_allclose(np.asarray(merged["other"]["w"]), np.zeros(2))
