import jax
import jax.numpy as jnp
import numpy as np

from eprecon_tpu.models import gru_fusion as gf


def _frag(rng, n, k, dim, interval=1, c=6):
    coords3 = rng.integers(0, dim[0], (n, 3)).astype(np.int32) * interval
    coords = np.concatenate([np.zeros((n, 1), np.int32), coords3], axis=1)
    coords = np.concatenate([coords, np.zeros((k - n, 4), np.int32)])
    feats = np.concatenate([rng.standard_normal((n, c)).astype(np.float32) + 1.0,
                            np.zeros((k - n, c), np.float32)])
    valid = np.arange(k) < n
    return jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid)


def test_fusion_step_union_and_state(rng):
    dim = (8, 8, 8)
    k = 128
    step = gf.GRUFusionStep(ch_voxel=4, ch_img=2, interval=1, voxel_size=0.1,
                            dim=dim, capacity=k)
    gmap = gf.GlobalMapLevel.empty(256, 6)
    tmap = gf.GlobalMapLevel.empty(256, 1)
    fin = gf.FusionInputs(jnp.zeros(3, jnp.int32), jnp.zeros(3),
                          jnp.eye(4))
    coords, feats, valid = _frag(rng, 50, k, dim)
    tsdf_w = jnp.asarray(rng.uniform(-0.5, 0.5, dim).astype(np.float32))
    occ_w = jnp.asarray(rng.random(dim) < 0.3)

    params = step.init(jax.random.PRNGKey(0), coords, feats, valid, gmap, tmap,
                       tsdf_w, occ_w, fin)
    out = step.apply(params, coords, feats, valid, gmap, tmap, tsdf_w, occ_w, fin)

    n_unique = len({tuple(c) for c in np.asarray(coords)[np.asarray(valid)].tolist()})
    assert int(out["valid"].sum()) == n_unique  # empty global → union = current
    assert int(out["gmap"].valid.sum()) == n_unique
    assert int(out["overflow"]) == 0
    # target occupancy matches the occ window at union coords
    uc = np.asarray(out["coords"])[:, 1:]
    uv = np.asarray(out["valid"])
    occ_t = np.asarray(out["occ_target"])
    ow = np.asarray(occ_w)
    for i in np.where(uv)[0][:30]:
        assert occ_t[i] == ow[uc[i, 0], uc[i, 1], uc[i, 2]]

    # --- second fragment in a shifted window: union includes old voxels ---
    fin2 = gf.FusionInputs(jnp.asarray([2, 0, 0], jnp.int32), jnp.asarray([0.2, 0, 0]),
                           jnp.eye(4))
    coords2, feats2, valid2 = _frag(rng, 20, k, dim)
    out2 = step.apply(params, coords2, feats2, valid2, out["gmap"], out["target_map"],
                      tsdf_w, occ_w, fin2)
    # union must cover current coords plus in-window global coords
    gc = np.asarray(out["gmap"].coords)[np.asarray(out["gmap"].valid)]
    in_win = ((gc - np.array([2, 0, 0])) >= 0).all(1) & ((gc - np.array([2, 0, 0])) < 8).all(1)
    cur_unique = {tuple(c) for c in (np.asarray(coords2)[np.asarray(valid2)][:, 1:]).tolist()}
    win_unique = {tuple(c) for c in (gc[in_win] - np.array([2, 0, 0])).tolist()}
    assert int(out2["valid"].sum()) == len(cur_unique | win_unique)
    # global map keeps out-of-window rows
    assert int(out2["gmap"].valid.sum()) == (~in_win).sum() + len(cur_unique | win_unique)


def test_direct_fusion_and_instance_matching(rng):
    dim = (8, 8, 8)
    k = 128
    gmap = gf.PanopticGlobalMap.empty(256)

    # fragment 1: a blob of class 5 (thing), segment 1
    n = 30
    coords3 = np.unique(rng.integers(0, 6, (n, 3)).astype(np.int32), axis=0)
    n = len(coords3)
    coords = np.zeros((k, 4), np.int32)
    coords[:n, 1:] = coords3
    valid = np.arange(k) < n
    tsdf = np.zeros(k, np.float32)
    seg_ids = np.where(valid, 1, 0).astype(np.int32)
    seg_class = np.zeros(8, np.int32); seg_class[1] = 5
    seg_isthing = np.zeros(8, bool); seg_isthing[1] = True
    seg_valid = np.zeros(8, bool); seg_valid[1] = True

    new_map, ovf = gf.fuse_tsdf_direct(
        gmap, jnp.asarray(coords), jnp.asarray(tsdf), jnp.asarray(valid),
        jnp.asarray(seg_ids), jnp.asarray(seg_class), jnp.asarray(seg_isthing),
        jnp.asarray(seg_valid), jnp.zeros(3, jnp.int32), dim, k)
    assert int(ovf) == 0
    inst = np.asarray(new_map.instance)[np.asarray(new_map.valid)]
    assert set(inst.tolist()) == {3}  # first thing id = max_stuff + 1
    assert int(new_map.next_instance_id) == 3

    # fragment 2: mostly same voxels, same class → inherits id 3
    new_map2, _ = gf.fuse_tsdf_direct(
        new_map, jnp.asarray(coords), jnp.asarray(tsdf), jnp.asarray(valid),
        jnp.asarray(seg_ids), jnp.asarray(seg_class), jnp.asarray(seg_isthing),
        jnp.asarray(seg_valid), jnp.zeros(3, jnp.int32), dim, k)
    inst2 = np.asarray(new_map2.instance)[np.asarray(new_map2.valid)]
    assert set(inst2.tolist()) == {3}
    assert int(new_map2.next_instance_id) == 3

    # fragment 3: different region, same class, no overlap → new id 4
    coords_b = coords.copy()
    coords_b[:n, 1:] = coords3 + np.array([0, 0, 2])  # shift breaks overlap?
    # ensure disjoint: use z+7 out of old range but in window? shift window instead
    new_map3, _ = gf.fuse_tsdf_direct(
        new_map2, jnp.asarray(coords), jnp.asarray(tsdf), jnp.asarray(valid),
        jnp.asarray(seg_ids), jnp.asarray(seg_class), jnp.asarray(seg_isthing),
        jnp.asarray(seg_valid), jnp.asarray([100, 0, 0], jnp.int32), dim, k)
    inst3 = np.asarray(new_map3.instance)
    ids = set(inst3[np.asarray(new_map3.valid)].tolist())
    assert 4 in ids and 3 in ids
    assert int(new_map3.next_instance_id) == 4


def test_stuff_keeps_class_id(rng):
    dim = (8, 8, 8)
    k = 64
    gmap = gf.PanopticGlobalMap.empty(128)
    coords = np.zeros((k, 4), np.int32)
    coords[:10, 1:] = np.stack([np.arange(10), np.zeros(10), np.zeros(10)], 1)
    valid = np.arange(k) < 10
    seg_ids = np.where(valid, 1, 0).astype(np.int32)
    seg_class = np.zeros(4, np.int32); seg_class[1] = 2  # floor
    seg_isthing = np.zeros(4, bool)
    seg_valid = np.zeros(4, bool); seg_valid[1] = True
    new_map, _ = gf.fuse_tsdf_direct(
        gmap, jnp.asarray(coords), jnp.zeros(k), jnp.asarray(valid),
        jnp.asarray(seg_ids), jnp.asarray(seg_class), jnp.asarray(seg_isthing),
        jnp.asarray(seg_valid), jnp.zeros(3, jnp.int32), dim, k)
    inst = np.asarray(new_map.instance)[np.asarray(new_map.valid)]
    assert set(inst.tolist()) == {2}
    assert int(new_map.next_instance_id) == 2  # unchanged
