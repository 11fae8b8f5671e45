"""Panoptic / semantic / instance inference post-processing.

TPU-native equivalent of reference models/mask3dformer.py:462-625
(panoptic_post, panoptic_inference, semantic_inference, instance_inference).
The reference's sequential python loop over queries (stuff merging, segment
id allocation) becomes a static unrolled loop over the fixed query count —
jit-safe and exact.

Outputs use static segment tables sized [Q+1]:
  seg id s in 1..Q; seg_class / seg_isthing / seg_valid indexed by s.
These plug directly into the cross-fragment instance matcher
(models/gru_fusion.py panoptic_instance_match).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

THING_ID_START = 3  # ids 1..2 = wall/floor (stuff), 3..20 things
                    # (reference mask3dformer.py:519)


class PanopticSeg(NamedTuple):
    voxel_seg: jnp.ndarray   # int32 [K] — segment id per voxel (0 = none)
    seg_class: jnp.ndarray   # int32 [Q+1] — class per segment id
    seg_isthing: jnp.ndarray  # bool [Q+1]
    seg_valid: jnp.ndarray   # bool [Q+1]


def panoptic_inference(mask_cls: jnp.ndarray, mask_pred: jnp.ndarray,
                       voxel_valid: jnp.ndarray,
                       object_mask_threshold: float = 0.3,
                       overlap_threshold: float = 0.5,
                       num_classes: int = 20) -> PanopticSeg:
    """reference mask3dformer.py:516-581 for one fragment.

    mask_cls: [Q, nc+1] logits; mask_pred: [Q, K] mask logits;
    voxel_valid: [K].
    """
    q, k = mask_pred.shape
    probs = jax.nn.softmax(mask_cls, axis=-1)
    scores = jnp.max(probs, axis=-1)
    labels = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    keep = (labels != 0) & (scores > object_mask_threshold)

    mprob = jax.nn.sigmoid(mask_pred)
    # per-voxel argmax of score * mask over kept queries (reference :531,545)
    weighted = jnp.where(keep[:, None], scores[:, None] * mprob, -jnp.inf)
    vox_best = jnp.argmax(weighted, axis=0).astype(jnp.int32)  # [K]
    any_kept = jnp.any(keep)

    def body(carry, xs):
        voxel_seg, seg_class, seg_isthing, seg_valid, stuff_memory, current_id = carry
        qi, cls, kp, mp = xs  # query index, label, keep flag, mask probs [K]
        isthing = cls >= THING_ID_START
        own = (vox_best == qi) & (mp >= 0.5) & voxel_valid
        mask_area = jnp.sum(((vox_best == qi) & voxel_valid).astype(jnp.int32))
        original_area = jnp.sum(((mp >= 0.5) & voxel_valid).astype(jnp.int32))
        own_n = jnp.sum(own.astype(jnp.int32))
        ok = kp & (mask_area > 0) & (original_area > 0) & (own_n > 0)
        ok = ok & (mask_area.astype(jnp.float32)
                   >= overlap_threshold * original_area.astype(jnp.float32))

        stuff_existing = stuff_memory[jnp.clip(cls, 0, num_classes)]
        reuse_stuff = ok & ~isthing & (stuff_existing > 0)
        make_new = ok & (isthing | (stuff_existing == 0))

        new_id = current_id + 1
        seg_id = jnp.where(reuse_stuff, stuff_existing,
                           jnp.where(make_new, new_id, 0))
        voxel_seg = jnp.where(own & (seg_id > 0), seg_id, voxel_seg)
        # conditional scatter: slot 0 is scratch when the condition is False
        widx = jnp.where(make_new, new_id, 0)
        seg_class = seg_class.at[widx].set(jnp.where(make_new, cls, seg_class[0]))
        seg_isthing = seg_isthing.at[widx].set(
            jnp.where(make_new, isthing, seg_isthing[0]))
        seg_valid = seg_valid.at[widx].set(
            jnp.where(make_new, True, seg_valid[0]))
        sidx = jnp.where(make_new & ~isthing, jnp.clip(cls, 0, num_classes), 0)
        stuff_memory = stuff_memory.at[sidx].set(
            jnp.where(make_new & ~isthing, new_id, stuff_memory[0]))
        current_id = jnp.where(make_new, new_id, current_id)
        return (voxel_seg, seg_class, seg_isthing, seg_valid, stuff_memory,
                current_id), None

    init = (jnp.zeros(k, jnp.int32), jnp.zeros(q + 1, jnp.int32),
            jnp.zeros(q + 1, bool), jnp.zeros(q + 1, bool),
            jnp.zeros(num_classes + 1, jnp.int32), jnp.asarray(0, jnp.int32))
    xs = (jnp.arange(q, dtype=jnp.int32), labels, keep, mprob)
    (voxel_seg, seg_class, seg_isthing, seg_valid, _, _), _ = jax.lax.scan(
        body, init, xs)

    # slot 0 is scratch for dropped writes — force it inert
    seg_class = seg_class.at[0].set(0)
    seg_isthing = seg_isthing.at[0].set(False)
    seg_valid = seg_valid.at[0].set(False)
    voxel_seg = jnp.where(any_kept, voxel_seg, 0)
    return PanopticSeg(voxel_seg, seg_class, seg_isthing, seg_valid)


def semantic_inference(mask_cls: jnp.ndarray, mask_pred: jnp.ndarray) -> jnp.ndarray:
    """[Q, nc+1] x [Q, K] → [nc, K] per-class scores
    (reference mask3dformer.py:506-510)."""
    probs = jax.nn.softmax(mask_cls, axis=-1)[:, 1:]
    return jnp.einsum("qc,qk->ck", probs, jax.nn.sigmoid(mask_pred))


class InstancePreds(NamedTuple):
    pred_masks: jnp.ndarray    # bool [N, K]
    scores: jnp.ndarray        # f32 [N]
    pred_classes: jnp.ndarray  # int32 [N]
    valid: jnp.ndarray         # bool [N]


def instance_inference(mask_cls: jnp.ndarray, mask_pred: jnp.ndarray,
                       voxel_valid: jnp.ndarray, num_classes: int = 20,
                       panoptic_on: bool = True) -> InstancePreds:
    """Top-k instance extraction (reference mask3dformer.py:583-625)."""
    q, k = mask_pred.shape
    topk = q // 2
    scores = jax.nn.softmax(mask_cls, axis=-1)[:, 1:]  # [Q, nc]
    flat = scores.reshape(-1)
    vals, idx = jax.lax.top_k(flat, topk)
    labels = (idx % num_classes + 1).astype(jnp.int32)
    qidx = idx // num_classes
    masks = mask_pred[qidx]  # [topk, K]
    keep = jnp.ones(topk, bool)
    if panoptic_on:
        keep = labels >= THING_ID_START
    bin_masks = (masks > 0) & voxel_valid[None, :]
    mask_probs = jax.nn.sigmoid(masks) * bin_masks
    mask_score = jnp.sum(mask_probs, axis=1) / (jnp.sum(bin_masks, axis=1) + 1e-6)
    return InstancePreds(bin_masks, vals * mask_score, labels, keep)
