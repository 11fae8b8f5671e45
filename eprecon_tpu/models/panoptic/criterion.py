"""Mask2Former-style set criterion with static-shape targets.

TPU-native re-design of reference models/criterion.py:85-296 (SetCriterion)
and the target construction in models/neucon_network.py:155-191
(get_panoptic_targets). The reference's dynamic per-fragment python lists
(variable instance counts, boolean voxel subsetting) become fixed
`max_instances` target slots with validity flags and an explicit supervised
voxel mask.

ScanNet class handling (reference models/criterion.py:112-113, :207-250):
  - GT semantic labels are nyu40 ids; only VALID_CLASSES are kept and are
    remapped to 1..20 (0 = no-object).
  - instances smaller than MIN_INSTANCE_VOXELS voxels are dropped.
  - mask losses are restricted to the union of surviving target masks.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eprecon_tpu.models.panoptic.matcher import hungarian_match

VALID_CLASSES = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24,
                          28, 33, 34, 36, 39], np.int32)
MIN_INSTANCE_VOXELS = 100
MAX_SEMANTIC_ID = 41          # nyu40 ids
MAX_INSTANCE_ID = 4096        # GT instance id bound for bucketing


class PanopticTargets(NamedTuple):
    labels: jnp.ndarray   # int32 [T] — classes remapped to 1..20 (0 invalid)
    masks: jnp.ndarray    # bool [T, K]
    valid: jnp.ndarray    # bool [T]
    voxel_mask: jnp.ndarray  # bool [K] — union of valid masks ∩ input mask


def nyu40_to_20(labels: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map nyu40 ids → 1..20; returns (mapped, is_valid)."""
    table = np.zeros(MAX_SEMANTIC_ID, np.int32)
    table[VALID_CLASSES] = np.arange(1, 21, dtype=np.int32)
    t = jnp.asarray(table)
    idx = jnp.clip(labels, 0, MAX_SEMANTIC_ID - 1)
    mapped = t[idx]
    return mapped, (mapped > 0) & (labels < MAX_SEMANTIC_ID)


def build_targets(semantic: jnp.ndarray, instance: jnp.ndarray,
                  voxel_valid: jnp.ndarray, max_instances: int,
                  min_instance_voxels: int = MIN_INSTANCE_VOXELS
                  ) -> PanopticTargets:
    """Per-voxel GT labels → fixed-slot instance targets.

    semantic: int32 [K] nyu40 class per voxel; instance: int32 [K] GT
    instance id per voxel (0 = none); voxel_valid: [K] supervised voxels.
    Equivalent of reference get_panoptic_targets + criterion preamble
    filtering, with majority-vote class per instance
    (neucon_network.py:180-186).
    """
    k = semantic.shape[0]
    inst = jnp.clip(instance, 0, MAX_INSTANCE_ID - 1)
    live = voxel_valid & (inst > 0)

    # unique instance ids → slots (sort + head flags, as in sparse.voxelize)
    keys = jnp.where(live, inst, MAX_INSTANCE_ID)
    skeys = jnp.sort(keys)
    head = jnp.concatenate([(skeys[:1] < MAX_INSTANCE_ID),
                            (skeys[1:] != skeys[:-1]) & (skeys[1:] < MAX_INSTANCE_ID)])
    n_inst = jnp.sum(head.astype(jnp.int32))
    # slot table: first max_instances unique ids
    slot_ids = jnp.sort(jnp.where(head, skeys, MAX_INSTANCE_ID))[:max_instances]
    slot_valid = slot_ids < MAX_INSTANCE_ID

    # per-voxel slot index
    pos = jnp.searchsorted(slot_ids, inst)
    pos = jnp.clip(pos, 0, max_instances - 1)
    hit = live & (slot_ids[pos] == inst)
    vox_slot = jnp.where(hit, pos, max_instances)

    # majority class per slot over nyu40 ids
    sem = jnp.clip(semantic, 0, MAX_SEMANTIC_ID - 1)
    pair = vox_slot * MAX_SEMANTIC_ID + jnp.where(hit, sem, 0)
    counts = jax.ops.segment_sum(hit.astype(jnp.int32), pair,
                                 num_segments=(max_instances + 1) * MAX_SEMANTIC_ID)
    counts = counts.reshape(max_instances + 1, MAX_SEMANTIC_ID)[:max_instances]
    maj_class = jnp.argmax(counts, axis=1).astype(jnp.int32)

    mapped, cls_ok = nyu40_to_20(maj_class)
    size = jnp.sum(counts, axis=1)
    keep = slot_valid & cls_ok & (size > min_instance_voxels)

    masks = (vox_slot[None, :] == jnp.arange(max_instances)[:, None]) & hit[None, :]
    masks = masks & keep[:, None]
    voxel_mask = jnp.any(masks, axis=0) & voxel_valid
    return PanopticTargets(jnp.where(keep, mapped, 0), masks, keep, voxel_mask)


def loss_labels(pred_logits: jnp.ndarray, targets: PanopticTargets,
                assign: jnp.ndarray, eos_coef: float = 0.1) -> jnp.ndarray:
    """Weighted CE over queries (reference criterion.py:120-142)."""
    q, nc1 = pred_logits.shape
    target_classes = jnp.zeros(q, jnp.int32)
    ok = targets.valid & (assign >= 0)
    target_classes = target_classes.at[jnp.where(ok, assign, q)].set(
        jnp.where(ok, targets.labels, 0), mode="drop")
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target_classes[:, None], axis=1)[:, 0]
    w_table = jnp.concatenate([jnp.asarray([eos_coef]), jnp.ones(nc1 - 1)])
    w = w_table[target_classes]
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-6)


def loss_masks(pred_masks: jnp.ndarray, targets: PanopticTargets,
               assign: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pos-weighted sigmoid BCE + dice over matched pairs
    (reference criterion.py:41-65, :20-39, :144-174).
    Returns (loss_mask, loss_dice)."""
    vm = targets.voxel_mask.astype(jnp.float32)  # [K]
    n_vox = jnp.maximum(jnp.sum(vm), 1.0)
    ok = targets.valid & (assign >= 0)
    n_masks = jnp.maximum(jnp.sum(ok.astype(jnp.float32)), 1.0)

    src = pred_masks[jnp.maximum(assign, 0)]  # [T, K]
    tgt = targets.masks.astype(jnp.float32) * vm[None, :]

    # per-pair pos weight, clamped at 30 (reference criterion.py:58-60)
    n_p = jnp.sum(tgt, axis=1)
    pw = jnp.clip((n_vox - n_p) / jnp.maximum(n_p, 1.0), None, 30.0)
    pos = jax.nn.softplus(-src) * tgt * pw[:, None]
    neg = jax.nn.softplus(src) * (1.0 - tgt) * vm[None, :]
    bce = jnp.sum((pos + neg), axis=1) / n_vox  # mean per voxel per pair
    l_mask = jnp.sum(jnp.where(ok, bce, 0.0)) / n_masks

    probs = jax.nn.sigmoid(src) * vm[None, :]
    num = 2.0 * jnp.sum(probs * tgt, axis=1)
    den = jnp.sum(probs, axis=1) + n_p
    dice = 1.0 - (num + 1.0) / (den + 1.0)
    l_dice = jnp.sum(jnp.where(ok, dice, 0.0)) / n_masks
    return l_mask, l_dice


def set_criterion(pred_logits_layers: jnp.ndarray, pred_masks_layers: jnp.ndarray,
                  targets: PanopticTargets,
                  class_weight: float = 0.2, mask_weight: float = 0.8,
                  dice_weight: float = 0.8, eos_coef: float = 0.1
                  ) -> jnp.ndarray:
    """Total panoptic loss over the final + auxiliary decoder layers
    (reference criterion.py:196-280; weighting and /3 as in
    neucon_network.py:605-611). Re-matches per layer.

    pred_logits_layers: [L+1, Q, nc+1]; pred_masks_layers: [L+1, Q, K].
    """
    any_target = jnp.any(targets.valid)

    # all layers matched in ONE batched auction: vmapping the while_loop runs
    # the (L+1) independent assignment problems in lockstep (iteration count =
    # max over layers) instead of (L+1) sequential device loops — the auction
    # body is a no-op once a layer's targets are all assigned, so extra
    # iterations don't perturb converged layers
    assigns = jax.vmap(
        lambda lg, mk: hungarian_match(lg, mk, targets.labels,
                                       targets.masks.astype(jnp.float32),
                                       targets.valid, targets.voxel_mask,
                                       class_weight, mask_weight, dice_weight)
    )(pred_logits_layers, pred_masks_layers)

    def layer_loss(carry, xs):
        logits, masks, assign = xs
        lc = loss_labels(logits, targets, assign, eos_coef)
        lm, ld = loss_masks(masks, targets, assign)
        return carry + class_weight * lc + mask_weight * lm + dice_weight * ld, None

    total, _ = jax.lax.scan(layer_loss, jnp.asarray(0.0),
                            (pred_logits_layers, pred_masks_layers, assigns))
    total = total / 3.0
    # no valid targets → zero loss, keeping the graph alive
    return jnp.where(any_target, total, 0.0 * pred_masks_layers.sum())
