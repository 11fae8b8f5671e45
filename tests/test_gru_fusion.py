"""Dense GRU fusion + direct-substitute panoptic fusion tests."""
import jax
import jax.numpy as jnp
import numpy as np

from eprecon_tpu.models import gru_fusion as gf


def test_dense_fusion_union_and_state(rng):
    extent, window = (16, 16, 16), (8, 8, 8)
    fusion = gf.DenseGRUFusion(ch_voxel=4, ch_img=2)
    gmap = gf.DenseGlobalLevel.empty(extent, 6)

    cur_mask = jnp.asarray(rng.random(window) < 0.3)
    cur_feats = jnp.asarray(rng.standard_normal((*window, 6)).astype(np.float32))
    rel = jnp.zeros(3, jnp.int32)

    params = fusion.init(jax.random.PRNGKey(0), cur_feats, cur_mask, gmap, rel)
    fused, union, new_gmap = fusion.apply(params, cur_feats, cur_mask, gmap, rel)
    # empty global → union == current
    np.testing.assert_array_equal(np.asarray(union), np.asarray(cur_mask))
    assert int(new_gmap.mask.sum()) == int(cur_mask.sum())
    # outside window untouched
    assert not np.asarray(new_gmap.mask)[8:].any()

    # second fragment in a shifted window: union includes old in-window voxels
    rel2 = jnp.asarray([4, 0, 0], jnp.int32)
    cur2_mask = jnp.asarray(rng.random(window) < 0.2)
    fused2, union2, gmap2 = fusion.apply(params, cur_feats, cur2_mask,
                                         new_gmap, rel2)
    g_in_win = np.asarray(new_gmap.mask)[4:12, 0:8, 0:8]
    expect = g_in_win | np.asarray(cur2_mask)
    np.testing.assert_array_equal(np.asarray(union2), expect)
    # out-of-window global rows kept
    assert np.asarray(gmap2.mask)[:4].sum() == np.asarray(new_gmap.mask)[:4].sum()


def test_target_fusion(rng):
    extent, window = (16, 16, 16), (8, 8, 8)
    tmap = gf.DenseTargetLevel.empty(extent)
    tsdf_w = jnp.asarray(rng.uniform(-0.5, 0.5, window).astype(np.float32))
    occ_w = jnp.asarray(rng.random(window) < 0.4)
    rel = jnp.zeros(3, jnp.int32)
    fused, fused_occ, tmap2 = gf.fuse_target_window(tmap, tsdf_w, occ_w, rel)
    np.testing.assert_array_equal(np.asarray(fused_occ), np.asarray(occ_w))
    # unobserved stays at +1
    f = np.asarray(fused)
    assert (f[~np.asarray(occ_w)] == 1.0).all()
    # second fragment at the same window with different occ overrides
    occ2 = jnp.asarray(rng.random(window) < 0.4)
    tsdf2 = jnp.zeros(window) + 0.25
    fused2, fo2, _ = gf.fuse_target_window(tmap2, tsdf2, occ2, rel)
    f2 = np.asarray(fused2)
    assert (f2[np.asarray(occ2)] == 0.25).all()
    old_only = np.asarray(occ_w) & ~np.asarray(occ2)
    np.testing.assert_allclose(f2[old_only], np.asarray(tsdf_w)[old_only])


def _segment_windows(window, coords, seg_id):
    seg = np.zeros(window, np.int32)
    seg[tuple(coords.T)] = seg_id
    return seg


def test_direct_fusion_and_instance_matching(rng):
    extent = (16, 16, 16)
    window = (8, 8, 8)
    gmap = gf.PanopticGlobalDense.empty(extent)

    coords = np.unique(rng.integers(0, 6, (40, 3)).astype(np.int32), axis=0)
    cur_mask = np.zeros(window, bool)
    cur_mask[tuple(coords.T)] = True
    tsdf_w = np.where(cur_mask, 0.0, 1.0).astype(np.float32)
    seg_w = _segment_windows(window, coords, 1)
    seg_class = np.zeros(8, np.int32); seg_class[1] = 5
    seg_isthing = np.zeros(8, bool); seg_isthing[1] = True
    seg_valid = np.zeros(8, bool); seg_valid[1] = True
    args = (jnp.asarray(tsdf_w), jnp.asarray(cur_mask), jnp.asarray(seg_w),
            jnp.asarray(seg_class), jnp.asarray(seg_isthing),
            jnp.asarray(seg_valid))

    m1 = gf.fuse_tsdf_direct(gmap, *args, jnp.zeros(3, jnp.int32))
    inst = np.asarray(m1.instance)[np.asarray(m1.mask)]
    assert set(inst.tolist()) == {3}  # first thing id = max_stuff + 1
    assert int(m1.next_instance_id) == 3

    # same voxels again → inherits id 3
    m2 = gf.fuse_tsdf_direct(m1, *args, jnp.zeros(3, jnp.int32))
    inst2 = np.asarray(m2.instance)[np.asarray(m2.mask)]
    assert set(inst2.tolist()) == {3}
    assert int(m2.next_instance_id) == 3

    # same class, disjoint region (shifted window) → fresh id 4
    m3 = gf.fuse_tsdf_direct(m2, *args, jnp.asarray([8, 8, 8], jnp.int32))
    ids = set(np.asarray(m3.instance)[np.asarray(m3.mask)].tolist())
    assert ids == {3, 4}
    assert int(m3.next_instance_id) == 4


def test_stuff_keeps_class_id(rng):
    extent, window = (16, 16, 16), (8, 8, 8)
    gmap = gf.PanopticGlobalDense.empty(extent)
    cur_mask = np.zeros(window, bool)
    cur_mask[0, :5, 0] = True
    seg_w = np.where(cur_mask, 1, 0).astype(np.int32)
    seg_class = np.zeros(4, np.int32); seg_class[1] = 2  # floor
    seg_isthing = np.zeros(4, bool)
    seg_valid = np.zeros(4, bool); seg_valid[1] = True
    m = gf.fuse_tsdf_direct(
        gmap, jnp.where(jnp.asarray(cur_mask), 0.0, 1.0), jnp.asarray(cur_mask),
        jnp.asarray(seg_w), jnp.asarray(seg_class), jnp.asarray(seg_isthing),
        jnp.asarray(seg_valid), jnp.zeros(3, jnp.int32))
    inst = np.asarray(m.instance)[np.asarray(m.mask)]
    assert set(inst.tolist()) == {2}
    assert int(m.next_instance_id) == 2  # unchanged


def test_window_slices():
    vol = jnp.arange(4 * 4 * 4, dtype=jnp.float32).reshape(4, 4, 4)[..., None]
    win = gf.slice_window(vol, jnp.asarray([1, 1, 1], jnp.int32), (2, 2, 2))
    assert win.shape == (2, 2, 2, 1)
    assert float(win[0, 0, 0, 0]) == float(vol[1, 1, 1, 0])
    vol2 = gf.update_window(vol, jnp.zeros((2, 2, 2, 1)),
                            jnp.asarray([1, 1, 1], jnp.int32))
    assert float(vol2[1, 1, 1, 0]) == 0.0
    assert float(vol2[0, 0, 0, 0]) == float(vol[0, 0, 0, 0])
    # clamped at the boundary
    win2 = gf.slice_window(vol, jnp.asarray([3, 3, 3], jnp.int32), (2, 2, 2))
    assert win2.shape == (2, 2, 2, 1)
