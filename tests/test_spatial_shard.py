"""Spatial (X-axis) sharding of the dense-window U-Net via GSPMD.

The scaling path for window compute is the XLA SPMD partitioner: shard the
window's X axis over the mesh and let GSPMD insert halo exchanges for the
3x3x3 convs, collectives for the masked-BN reductions, and resharding
around the shifted-conv reshapes (the "annotate shardings, let XLA insert
collectives" recipe). This proves the production conv stack
(ShiftedConv3d's [1,X,..]->[X,..] batch-merge reshape, strided ConvDown,
trilinear upsample, maxpool_mean, masked BN) partitions correctly on an
8-way mesh.

Measured while writing this test: with TRAIN-mode BN the sharded batch
statistics differ from single-device by ~5e-5 (partial-sum reassociation
across shards), which relu boundary flips then amplify layer-over-layer to
O(0.1) on ~10% of outputs — chaotic divergence, not a partitioning bug
(the same thing happens comparing any two reduction orders). So the
assertions are split: eval-mode BN (pure elementwise normalization) must
match to bf16 rounding, and train-mode BN statistics themselves must match
to reassociation tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eprecon_tpu.models.unet_dense import DenseUNet


def _setup(rng):
    dim, c = (32, 32, 32), 16
    feats = rng.standard_normal((*dim, c)).astype(np.float32)
    mask = rng.random(dim) < 0.5
    # keep activity in every X slab so per-shard masked stats are
    # non-degenerate
    mask[::4] |= rng.random((8, *dim[1:])) < 0.5
    variables = jax.jit(DenseUNet(cr=0.5).init)(
        jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(mask))
    mesh = Mesh(np.array(jax.devices()[:8]), ("x",))
    return feats, mask, variables, mesh


@pytest.mark.slow
def test_unet_x_sharded_matches_single_device(rng):
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    feats, mask, variables, mesh = _setup(rng)
    xs = NamedSharding(mesh, P("x"))
    repl = NamedSharding(mesh, P())
    f_s = jax.device_put(jnp.asarray(feats), xs)
    m_s = jax.device_put(jnp.asarray(mask), xs)
    v_s = jax.device_put(variables, repl)

    # 1. eval-mode BN: elementwise normalization — sharded forward must
    # match to bf16 conv rounding
    model_e = DenseUNet(cr=0.5, use_running_average=True)
    fwd_e = lambda v, f, m: model_e.apply(v, f, m, train=False)
    out_ref = jax.jit(fwd_e)(variables, jnp.asarray(feats),
                             jnp.asarray(mask))
    out_s = jax.jit(fwd_e, out_shardings=xs)(v_s, f_s, m_s)
    assert out_s.sharding.is_equivalent_to(xs, out_s.ndim)
    np.testing.assert_allclose(np.asarray(out_ref, np.float32),
                               np.asarray(out_s, np.float32),
                               rtol=2e-2, atol=2e-2)

    # 2. train-mode BN: the masked statistics are global reductions over the
    # sharded axis — they must agree to partial-sum reassociation tolerance
    model_t = DenseUNet(cr=0.5, use_running_average=False)
    fwd_t = lambda v, f, m: model_t.apply(v, f, m, train=False,
                                          mutable=["batch_stats"])[1]
    stats_ref = jax.jit(fwd_t)(variables, jnp.asarray(feats),
                               jnp.asarray(mask))
    stats_s = jax.jit(fwd_t)(v_s, f_s, m_s)
    for a, b in zip(jax.tree_util.tree_leaves(stats_ref),
                    jax.tree_util.tree_leaves(stats_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)
