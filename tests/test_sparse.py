"""Sparse voxel engine vs dense NumPy oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eprecon_tpu.ops import sparse as sp


def make_voxels(rng, n_active, capacity, span=20, channels=8, batch=0):
    # unique random coords
    coords = rng.choice(span ** 3, size=n_active, replace=False)
    x, y, z = coords // (span * span), (coords // span) % span, coords % span
    c = np.stack([np.full(n_active, batch), x, y, z], axis=1).astype(np.int32)
    feats = rng.standard_normal((n_active, channels)).astype(np.float32)
    pad = capacity - n_active
    coords4 = np.concatenate([c, np.zeros((pad, 4), np.int32)])
    feats_p = np.concatenate([feats, np.zeros((pad, channels), np.float32)])
    valid = np.concatenate([np.ones(n_active, bool), np.zeros(pad, bool)])
    return sp.SparseVoxels(jnp.asarray(coords4), jnp.asarray(feats_p), jnp.asarray(valid)), c, feats


def test_build_hash_and_lookup(rng):
    sv, coords, feats = make_voxels(rng, 100, 128)
    grid = sp.build_hash(sv, (64, 64, 64))
    idx = sp.lookup(grid, jnp.asarray(coords))
    assert (np.asarray(idx) >= 0).all()
    got = np.asarray(grid.voxels.feats)[np.asarray(idx)]
    np.testing.assert_allclose(got, feats, rtol=1e-6)
    # absent coords → -1
    miss = coords.copy()
    miss[:, 1] += 1000
    idx2 = sp.lookup(grid, jnp.asarray(miss))
    assert (np.asarray(idx2) == -1).all()


def test_subm_conv_matches_dense(rng):
    """Submanifold sparse conv == dense conv with zeros at inactive sites."""
    span, cin, cout = 10, 4, 6
    sv, coords, feats = make_voxels(rng, 60, 64, span=span, channels=cin)
    grid = sp.build_hash(sv, (span, span, span))
    offsets = sp.kernel_offsets(3)
    nmap = sp.neighbor_map(grid, grid.voxels.coords, grid.voxels.valid, offsets)
    w = rng.standard_normal((27, cin, cout)).astype(np.float32)
    out = sp.sparse_conv_apply(grid.voxels.feats, nmap, jnp.asarray(w),
                               out_valid=grid.voxels.valid)
    out = np.asarray(out)

    # dense oracle
    dense = np.zeros((span + 2, span + 2, span + 2, cin), np.float32)
    dense[coords[:, 1] + 1, coords[:, 2] + 1, coords[:, 3] + 1] = feats
    dense_out = np.zeros((span + 2, span + 2, span + 2, cout), np.float32)
    for o, (dx, dy, dz) in enumerate(offsets):
        shifted = np.roll(dense, (-dx, -dy, -dz), axis=(0, 1, 2))
        dense_out += shifted @ w[o]
    gcoords = np.asarray(grid.voxels.coords)
    gvalid = np.asarray(grid.voxels.valid)
    expected = dense_out[gcoords[gvalid, 1] + 1, gcoords[gvalid, 2] + 1, gcoords[gvalid, 3] + 1]
    np.testing.assert_allclose(out[gvalid], expected, rtol=1e-4, atol=1e-5)


def test_voxelize_mean_pooling(rng):
    n, cap, c = 50, 64, 3
    xyz = rng.uniform(0, 5, size=(n, 3)).astype(np.float32)
    feats = rng.standard_normal((n, c)).astype(np.float32)
    pts = sp.PointSet(
        jnp.asarray(np.concatenate([xyz, np.zeros((cap - n, 3), np.float32)])),
        jnp.zeros(cap, jnp.int32),
        jnp.asarray(np.concatenate([feats, np.zeros((cap - n, c), np.float32)])),
        jnp.asarray(np.arange(cap) < n),
    )
    grid, idx_query = sp.voxelize(pts, res=1.0, window=(8, 8, 8))
    vox = np.floor(xyz).astype(np.int32)
    # oracle: group by voxel
    keys = [tuple(v) for v in vox]
    uniq = sorted(set(keys))
    assert int(grid.voxels.num_valid()) == len(uniq)
    gcoords = np.asarray(grid.voxels.coords)
    gfeats = np.asarray(grid.voxels.feats)
    gvalid = np.asarray(grid.voxels.valid)
    for u in uniq:
        mask = np.all(vox == np.array(u), axis=1)
        expect = feats[mask].mean(0)
        rows = np.where(gvalid & (gcoords[:, 1] == u[0]) & (gcoords[:, 2] == u[1])
                        & (gcoords[:, 3] == u[2]))[0]
        assert len(rows) == 1
        np.testing.assert_allclose(gfeats[rows[0]], expect, rtol=1e-5)
    # idx_query maps each point to its voxel row
    iq = np.asarray(idx_query)[:n]
    for i in range(n):
        assert tuple(gcoords[iq[i], 1:]) == keys[i]


def test_devoxelize_trilinear(rng):
    """Interpolating a linear field reproduces it exactly (interior points)."""
    span, cap = 8, 512
    coords = np.stack(np.meshgrid(*[np.arange(span)] * 3, indexing="ij"), -1).reshape(-1, 3)
    n = coords.shape[0]
    # linear feature field f(x,y,z) = [x, y+2z]
    feats = np.stack([coords[:, 0], coords[:, 1] + 2.0 * coords[:, 2]], axis=1).astype(np.float32)
    coords4 = np.concatenate([np.zeros((n, 1), np.int32), coords.astype(np.int32)], axis=1)
    sv = sp.SparseVoxels(jnp.asarray(coords4), jnp.asarray(feats), jnp.ones(n, bool))
    grid = sp.build_hash(sv, (span, span, span))

    m = 40
    xyz = rng.uniform(1.0, span - 2.0, size=(m, 3)).astype(np.float32)
    pts = sp.PointSet(jnp.asarray(np.concatenate([xyz, np.zeros((cap - m, 3), np.float32)])),
                      jnp.zeros(cap, jnp.int32),
                      jnp.zeros((cap, 2), jnp.float32),
                      jnp.asarray(np.arange(cap) < m))
    out = np.asarray(sp.devoxelize_trilinear(grid, pts, res=1.0))[:m]
    expect = np.stack([xyz[:, 0], xyz[:, 1] + 2 * xyz[:, 2]], axis=1)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


def test_compact_preserves_order(rng):
    n = 100
    coords = np.concatenate([np.zeros((n, 1)), rng.integers(0, 50, (n, 3))], axis=1).astype(np.int32)
    feats = rng.standard_normal((n, 4)).astype(np.float32)
    mask = rng.random(n) < 0.4
    sv, (packed,), overflow = sp.compact(jnp.asarray(mask), jnp.asarray(coords), 64,
                                         jnp.asarray(feats))
    k = mask.sum()
    assert int(overflow) == 0
    assert int(sv.num_valid()) == k
    np.testing.assert_array_equal(np.asarray(sv.coords)[:k], coords[mask])
    np.testing.assert_allclose(np.asarray(packed)[:k], feats[mask])


def test_compact_overflow():
    coords = jnp.zeros((100, 4), jnp.int32)
    mask = jnp.ones(100, bool)
    sv, _, overflow = sp.compact(mask, coords, 32)
    assert int(overflow) == 68
    assert int(sv.num_valid()) == 32


def test_compact_score_keeps_best(rng):
    """Score-ordered overflow keeps the highest-scoring rows, emitted in
    original grid order (VERDICT r4 #4: grid-order truncation dropped whole
    spatial regions during epoch 0)."""
    n, cap = 200, 32
    coords = np.concatenate([np.zeros((n, 1)),
                             np.arange(n)[:, None].repeat(3, 1)],
                            axis=1).astype(np.int32)
    score = rng.permutation(n).astype(np.float32)
    mask = np.ones(n, bool)
    mask[::7] = False
    sv, _, overflow = sp.compact(jnp.asarray(mask), jnp.asarray(coords), cap,
                                 score=jnp.asarray(score))
    assert int(overflow) == mask.sum() - cap
    kept = np.asarray(sv.coords)[np.asarray(sv.valid), 1]
    expect = np.sort(np.argsort(np.where(mask, score, -np.inf))[-cap:])
    np.testing.assert_array_equal(kept, expect)          # best rows kept
    np.testing.assert_array_equal(kept, np.sort(kept))   # original order


def test_compact_score_no_overflow_matches_default(rng):
    """Under capacity, score ordering must be a no-op (same packing as the
    default path), so converged-model behavior is unchanged."""
    n = 100
    coords = np.concatenate([np.zeros((n, 1)),
                             rng.integers(0, 50, (n, 3))], 1).astype(np.int32)
    feats = rng.standard_normal((n, 4)).astype(np.float32)
    mask = rng.random(n) < 0.4
    score = rng.standard_normal(n).astype(np.float32)
    a = sp.compact(jnp.asarray(mask), jnp.asarray(coords), 64,
                   jnp.asarray(feats))
    b = sp.compact(jnp.asarray(mask), jnp.asarray(coords), 64,
                   jnp.asarray(feats), score=jnp.asarray(score))
    np.testing.assert_array_equal(np.asarray(a[0].coords), np.asarray(b[0].coords))
    np.testing.assert_array_equal(np.asarray(a[0].valid), np.asarray(b[0].valid))
    np.testing.assert_allclose(np.asarray(a[1][0]), np.asarray(b[1][0]))


def test_sparse_to_dense_roundtrip(rng):
    sv, coords, feats = make_voxels(rng, 30, 32, span=6, channels=5)
    dense = sp.sparse_to_dense(sv.coords[:, 1:], sv.feats, sv.valid, (6, 6, 6))
    assert dense.shape == (6, 6, 6, 5)
    got = np.asarray(dense)[coords[:, 1], coords[:, 2], coords[:, 3]]
    np.testing.assert_allclose(got, feats)
    mask = (np.abs(np.asarray(dense)).sum(-1) > 0)
    sv2, overflow = sp.dense_to_sparse(dense, jnp.asarray(mask), 64)
    assert int(overflow) == 0
    grid2 = sp.build_hash(sv2, (6, 6, 6))
    idx = sp.lookup(grid2, sv.coords, sv.valid)
    assert (np.asarray(idx)[np.asarray(sv.valid)] >= 0).all()


def test_downsample_coords(rng):
    sv, coords, _ = make_voxels(rng, 40, 64, span=16, channels=2)
    grid, parent = sp.downsample_coords(sv, (10, 10, 10))
    expect = {tuple(c // np.array([1, 2, 2, 2])) for c in coords}
    assert int(grid.voxels.num_valid()) == len(expect)
    gc = np.asarray(grid.voxels.coords)[np.asarray(grid.voxels.valid)]
    assert {tuple(c) for c in gc} == expect
    # parent map consistent
    p = np.asarray(parent)[:40]
    gcoords = np.asarray(grid.voxels.coords)
    for i in range(40):
        assert tuple(gcoords[p[i]]) == tuple(coords[i] // np.array([1, 2, 2, 2]))


def test_jit_compiles():
    """The whole engine composes under jit with static shapes."""
    @jax.jit
    def f(coords, feats, valid):
        sv = sp.SparseVoxels(coords, feats, valid)
        grid = sp.build_hash(sv, (16, 16, 16))
        nmap = sp.neighbor_map(grid, grid.voxels.coords, grid.voxels.valid,
                               sp.kernel_offsets(3))
        w = jnp.ones((27, feats.shape[1], 4))
        return sp.sparse_conv_apply(grid.voxels.feats, nmap, w,
                                    out_valid=grid.voxels.valid)

    out = f(jnp.zeros((16, 4), jnp.int32), jnp.ones((16, 3)), jnp.ones(16, bool))
    assert out.shape == (16, 4)
