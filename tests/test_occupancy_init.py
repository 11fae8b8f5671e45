import jax
import jax.numpy as jnp
import numpy as np

from eprecon_tpu.models import dense3d
from eprecon_tpu.models.occupancy_init import OccupancyInitialization


def test_erode_dilate():
    m = np.zeros((8, 8, 8), bool)
    m[2:6, 2:6, 2:6] = True
    e = np.asarray(dense3d.erode(jnp.asarray(m)))
    assert e.sum() == 2 ** 3  # 4^3 cube erodes to 2^3
    d = np.asarray(dense3d.dilate(jnp.asarray(m)))
    assert d.sum() == 6 ** 3


def test_maxpool3d():
    v = np.zeros((4, 4, 4), np.float32)
    v[1, 1, 1] = 3.0
    p = np.asarray(dense3d.maxpool3d(jnp.asarray(v), 2))
    assert p.shape == (2, 2, 2)
    assert p[0, 0, 0] == 3.0


def test_subm_dense_masking():
    """Inactive voxels contribute nothing and output nothing."""
    m = dense3d.SubMConv3dDense(4, 3)
    x = jnp.ones((6, 6, 6, 2))
    mask = jnp.zeros((6, 6, 6), bool).at[2:4, 2:4, 2:4].set(True)
    vs = m.init(jax.random.PRNGKey(0), x, mask)
    # corrupt inactive inputs wildly — output at active sites must not change
    x2 = x.at[0, 0, 0].set(1e6)
    y1 = m.apply(vs, x, mask)
    y2 = m.apply(vs, x2, mask)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))
    assert (np.asarray(y1)[~np.asarray(mask)] == 0).all()


def test_occupancy_init_forward():
    v, bs = 3, 1
    feats = [jnp.asarray(np.random.default_rng(0).standard_normal(s).astype(np.float32))
             for s in [(v, bs, 32, 40, 24), (v, bs, 16, 20, 40), (v, bs, 8, 10, 80)]]
    # cameras looking at the grid center
    k = np.array([[10.0, 0, 10], [0, 10.0, 8], [0, 0, 1]], np.float32)
    pm = np.eye(4, dtype=np.float32)
    pm[:3, :3] = k
    proj = jnp.asarray(np.stack([np.stack([pm] * bs)] * v))  # [V,B,4,4]
    origin = jnp.asarray(np.array([[-0.5, -0.5, 0.5]], np.float32))

    model = OccupancyInitialization()
    grid_shape = (12, 12, 12)
    variables = model.init(jax.random.PRNGKey(0), feats, origin, 0.08, proj,
                           grid_shape, 2)
    (occ, mask, count), _ = model.apply(variables, feats, origin, 0.08, proj,
                                        grid_shape, 2, mutable=["batch_stats"])
    assert occ.shape == (bs, 12, 12, 12)
    assert mask.shape == (bs, 12, 12, 12)
    assert bool(jnp.isfinite(occ).all())
    assert bool(mask.any())  # some voxels visible from >=2 views
    # occ is zero outside the mask
    assert (np.asarray(occ)[~np.asarray(mask)] == 0).all()
