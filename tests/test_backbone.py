import jax
import jax.numpy as jnp
import numpy as np

from eprecon_tpu.models.backbone import MnasMulti, get_depths


def test_get_depths():
    assert get_depths(1.0) == [32, 16, 24, 40, 80, 96, 192, 320]


def test_backbone_shapes():
    m = MnasMulti(alpha=1.0)
    x = jnp.zeros((2, 480, 640, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    outs, _ = m.apply(variables, x, mutable=["batch_stats"])
    # fine → coarse, matching reference models/backbone.py:77 outputs[::-1]
    assert outs[0].shape == (2, 120, 160, 24)
    assert outs[1].shape == (2, 60, 80, 40)
    assert outs[2].shape == (2, 30, 40, 80)


def test_backbone_finite():
    m = MnasMulti(alpha=1.0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 96, 128, 3)),
                    jnp.float32)
    variables = m.init(jax.random.PRNGKey(1), x)
    outs, _ = m.apply(variables, x, mutable=["batch_stats"])
    for o in outs:
        assert bool(jnp.isfinite(o).all())
