import jax
import jax.numpy as jnp
import numpy as np

from eprecon_tpu.models import spvcnn
from eprecon_tpu.ops import sparse as sp


def make_points(rng, n, cap, c, span=3.0):
    xyz = rng.uniform(0, span, (n, 3)).astype(np.float32)
    feats = rng.standard_normal((n, c)).astype(np.float32)
    pad = cap - n
    return sp.PointSet(
        jnp.asarray(np.concatenate([xyz, np.zeros((pad, 3), np.float32)])),
        jnp.zeros(cap, jnp.int32),
        jnp.asarray(np.concatenate([feats, np.zeros((pad, c), np.float32)])),
        jnp.asarray(np.arange(cap) < n),
    ), xyz, feats


def test_plan_levels(rng):
    pts, xyz, _ = make_points(rng, 200, 256, 4)
    plan = spvcnn.build_plan(pts, vres=0.2)
    assert len(plan.levels) == 3
    n0 = int(plan.levels[0].grid.voxels.num_valid())
    n1 = int(plan.levels[1].grid.voxels.num_valid())
    n2 = int(plan.levels[2].grid.voxels.num_valid())
    assert n0 >= n1 >= n2 > 0
    # L0 voxel count matches oracle
    expect = len({tuple(v) for v in np.floor(xyz / 0.2).astype(int)})
    assert n0 == expect


def test_spvcnn_forward(rng):
    pts, _, _ = make_points(rng, 300, 512, 8)
    plan = spvcnn.build_plan(pts, vres=0.2)
    m = spvcnn.SPVCNN(cr=0.5)
    vs = m.init(jax.random.PRNGKey(0), pts.feats, plan)
    out, _ = m.apply(vs, pts.feats, plan, mutable=["batch_stats"])
    assert out.shape == (512, 48)
    assert bool(jnp.isfinite(out).all())
    # padding rows are zeroed
    assert (np.asarray(out)[300:] == 0).all()


def test_spvcnn_padding_invariance(rng):
    """Garbage in padding slots must not change valid outputs."""
    pts, _, _ = make_points(rng, 100, 128, 8)
    plan = spvcnn.build_plan(pts, vres=0.25)
    m = spvcnn.SPVCNN(cr=0.25)
    vs = m.init(jax.random.PRNGKey(0), pts.feats, plan)
    out1, _ = m.apply(vs, pts.feats, plan, mutable=["batch_stats"])
    corrupted = pts.feats.at[100:].set(1e3)
    out2, _ = m.apply(vs, corrupted, plan, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out1)[:100], np.asarray(out2)[:100],
                               rtol=1e-5, atol=1e-5)


def test_sconv3d_and_gru(rng):
    pts, _, _ = make_points(rng, 150, 256, 6)
    plan = spvcnn.build_sconv_plan(pts, vres=0.2)
    gru = spvcnn.ConvGRU(hidden_dim=6)
    h = jnp.asarray(rng.standard_normal((256, 6)).astype(np.float32))
    x = pts.feats
    vs = gru.init(jax.random.PRNGKey(1), h, x, plan)
    out = gru.apply(vs, h, x, plan)
    assert out.shape == (256, 6)
    assert bool(jnp.isfinite(out).all())
    # GRU interpolates between h and q: output bounded by gates
    # z=0 would give h exactly; check it's not wildly off-scale
    assert float(jnp.abs(out).max()) < 100


def test_up_down_conv_consistency(rng):
    """Down then up preserves coordinate sets (cached-cmap semantics)."""
    pts, _, _ = make_points(rng, 120, 128, 4)
    plan = spvcnn.build_plan(pts, vres=0.2)
    l1 = plan.levels[1]
    # every valid fine voxel has a valid parent
    fine_valid = np.asarray(plan.levels[0].grid.voxels.valid)
    parent = np.asarray(l1.parent_of_fine)
    assert (parent[fine_valid] >= 0).all()
    # parent coords = floor(fine/2)
    fc = np.asarray(plan.levels[0].grid.voxels.coords)
    cc = np.asarray(l1.grid.voxels.coords)
    for i in np.where(fine_valid)[0][:20]:
        assert (cc[parent[i], 1:] == fc[i, 1:] // 2).all()
