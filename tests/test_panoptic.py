"""Panoptic decoder, criterion, and post-processing tests."""
import jax
import jax.numpy as jnp
import numpy as np

from eprecon_tpu.models.panoptic import criterion as crit
from eprecon_tpu.models.panoptic import post
from eprecon_tpu.models.panoptic.decoder import MaskedTransformerDecoder, nearest_fine_index


def test_nearest_fine_index(rng):
    fine = rng.integers(0, 50, (200, 3)).astype(np.int32)
    coarse = rng.integers(0, 50, (40, 3)).astype(np.int32)
    fv = np.ones(200, bool); fv[150:] = False
    cv = np.ones(40, bool)
    idx = np.asarray(nearest_fine_index(jnp.asarray(coarse), jnp.asarray(cv),
                                        jnp.asarray(fine), jnp.asarray(fv),
                                        chunk=64))
    d = ((coarse[:, None, :] - fine[None, :, :]) ** 2).sum(-1).astype(np.float32)
    d[:, ~fv] = np.inf
    expect_d = d.min(1)
    got_d = d[np.arange(40), idx]
    np.testing.assert_allclose(got_d, expect_d)


def test_decoder_shapes(rng):
    caps = [64, 128, 256]
    feats = [jnp.asarray(rng.standard_normal((k, 48)).astype(np.float32)) for k in caps]
    coords = [jnp.asarray(rng.integers(0, 96, (k, 3)).astype(np.int32)) for k in caps]
    valid = [jnp.asarray(np.arange(k) < k - 10) for k in caps]
    mask_feats = feats[2]
    dec = MaskedTransformerDecoder()
    vs = dec.init(jax.random.PRNGKey(0), feats, coords, valid, mask_feats, (96, 96, 96))
    out = dec.apply(vs, feats, coords, valid, mask_feats, (96, 96, 96))
    assert out.pred_logits.shape == (7, 80, 21)
    assert out.pred_masks.shape == (7, 80, 256)
    assert bool(jnp.isfinite(out.pred_logits).all())
    assert bool(jnp.isfinite(out.pred_masks).all())


def test_build_targets(rng):
    k = 500
    semantic = np.zeros(k, np.int32)
    instance = np.zeros(k, np.int32)
    # instance 7 → class 5 (valid, chair), 200 voxels
    instance[:200] = 7; semantic[:200] = 5
    # instance 9 → class 13 (nyu 13 not in VALID_CLASSES), 150 voxels
    instance[200:350] = 9; semantic[200:350] = 13
    # instance 11 → class 4, only 50 voxels (< 100 → dropped)
    instance[350:400] = 11; semantic[350:400] = 4
    valid = np.ones(k, bool)
    t = crit.build_targets(jnp.asarray(semantic), jnp.asarray(instance),
                           jnp.asarray(valid), max_instances=8)
    tv = np.asarray(t.valid)
    assert tv.sum() == 1
    slot = np.where(tv)[0][0]
    assert int(t.labels[slot]) == 5  # chair: nyu 5 → 20-class id 5
    assert int(t.masks[slot].sum()) == 200
    assert int(t.voxel_mask.sum()) == 200


def test_criterion_perfect_prediction_low_loss(rng):
    """A perfect prediction should have much lower loss than a random one."""
    k, q, nc, t_max = 300, 16, 20, 8
    semantic = np.zeros(k, np.int32); instance = np.zeros(k, np.int32)
    instance[:150] = 3; semantic[:150] = 4   # bed
    instance[150:300] = 4; semantic[150:300] = 6  # sofa
    targets = crit.build_targets(jnp.asarray(semantic), jnp.asarray(instance),
                                 jnp.ones(k, bool), t_max)
    # perfect: query 0 → instance 3 (class 4), query 1 → instance 4 (class 6)
    logits = np.full((q, nc + 1), -5.0, np.float32); logits[:, 0] = 5.0
    logits[0, 0] = -5; logits[0, 4] = 5.0
    logits[1, 0] = -5; logits[1, 6] = 5.0
    masks = np.full((q, k), -8.0, np.float32)
    masks[0, :150] = 8.0
    masks[1, 150:] = 8.0
    l_good = float(crit.set_criterion(jnp.asarray(logits)[None],
                                      jnp.asarray(masks)[None], targets))
    rng_l = np.random.default_rng(1)
    l_rand = float(crit.set_criterion(
        jnp.asarray(rng_l.standard_normal((1, q, nc + 1)).astype(np.float32)),
        jnp.asarray(rng_l.standard_normal((1, q, k)).astype(np.float32)), targets))
    assert l_good < 0.1 * l_rand
    assert l_good < 0.1


def test_criterion_no_targets_zero():
    k, q = 100, 8
    targets = crit.build_targets(jnp.zeros(k, jnp.int32), jnp.zeros(k, jnp.int32),
                                 jnp.ones(k, bool), 4)
    loss = crit.set_criterion(jnp.zeros((1, q, 21)), jnp.zeros((1, q, k)), targets)
    assert float(loss) == 0.0


def test_panoptic_inference(rng):
    q, k = 8, 200
    voxel_valid = np.ones(k, bool)
    mask_cls = np.full((q, 21), -5.0, np.float32)
    mask_cls[:, 0] = 5.0
    mask_pred = np.full((q, k), -8.0, np.float32)
    # query 0: thing class 5 over voxels 0:80
    mask_cls[0, 0] = -5; mask_cls[0, 5] = 6.0
    mask_pred[0, :80] = 8.0
    # query 1: stuff class 2 (floor) over voxels 80:160
    mask_cls[1, 0] = -5; mask_cls[1, 2] = 6.0
    mask_pred[1, 80:160] = 8.0
    # query 2: also floor, voxels 160:200 → merged into query 1's segment id
    mask_cls[2, 0] = -5; mask_cls[2, 2] = 6.0
    mask_pred[2, 160:] = 8.0

    seg = post.panoptic_inference(jnp.asarray(mask_cls), jnp.asarray(mask_pred),
                                  jnp.asarray(voxel_valid))
    vs = np.asarray(seg.voxel_seg)
    assert set(vs[:80]) == {1}
    assert set(vs[80:]) == {2}  # both floor queries share segment 2
    assert bool(seg.seg_isthing[1]) and int(seg.seg_class[1]) == 5
    assert not bool(seg.seg_isthing[2]) and int(seg.seg_class[2]) == 2
    assert np.asarray(seg.seg_valid).sum() == 2


def test_panoptic_inference_nothing_kept():
    q, k = 4, 50
    mask_cls = np.full((q, 21), 0.0, np.float32)
    mask_cls[:, 0] = 10.0  # all no-object
    seg = post.panoptic_inference(jnp.asarray(mask_cls),
                                  jnp.zeros((q, k), jnp.float32),
                                  jnp.ones(k, bool))
    assert (np.asarray(seg.voxel_seg) == 0).all()
    assert not np.asarray(seg.seg_valid).any()
