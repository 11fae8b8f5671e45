"""TSDF / occupancy losses.

Reference: models/neucon_network.py:627-699 (compute_loss_init, compute_loss)
and utils.py apply_log_transform. All losses are masked-static: padding rows
never contribute, and the degenerate no-positive case returns a zero that
keeps the graph alive (reference's `torch.Tensor([0.0]).cuda()[0] * x.sum()`
trick is just `0.0 * x.sum()` here — JAX grads are zeros, not missing).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def apply_log_transform(x: jnp.ndarray) -> jnp.ndarray:
    """sign(x) * log(|x| + 1) (reference utils.py:156-160)."""
    return jnp.sign(x) * jnp.log(jnp.abs(x) + 1.0)


def masked_bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray,
                           mask: jnp.ndarray, pos_weight: jnp.ndarray) -> jnp.ndarray:
    """Mean BCE over mask with positive-class weighting
    (torch F.binary_cross_entropy_with_logits(pos_weight=...) semantics:
    loss = -[pw * y * log σ(x) + (1-y) * log(1-σ(x))])."""
    m = mask.astype(logits.dtype)
    pos = jax.nn.softplus(-logits) * targets * pos_weight
    neg = jax.nn.softplus(logits) * (1.0 - targets)
    return jnp.sum((pos + neg) * m) / jnp.maximum(jnp.sum(m), 1.0)


def compute_pos_weight(targets: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(n_neg / n_pos) over the masked set (reference neucon_network.py:785-795)."""
    m = mask.astype(jnp.float32)
    n_all = jnp.sum(m)
    n_p = jnp.sum(targets * m)
    return (n_all - n_p) / jnp.maximum(n_p, 1.0)


def occupancy_init_loss(occ_logits: jnp.ndarray, tsdf_target: jnp.ndarray,
                        occ_target: jnp.ndarray, valid: jnp.ndarray
                        ) -> jnp.ndarray:
    """Occupancy-initialization BCE (reference compute_loss_init,
    neucon_network.py:627-662, '{0,1}' branch).

    tsdf_target here is the init-style target: 1 - |tsdf| clamped to [0, 1]
    (reference get_target_init :126-141); supervision is restricted to
    voxels where (tsdf_target == 0) | (occ_target == 1).
    """
    sup = valid & ((tsdf_target == 0.0) | occ_target)
    binary = (tsdf_target > 0.0).astype(jnp.float32)
    n_p = jnp.sum(binary * sup.astype(jnp.float32))
    pw = compute_pos_weight(binary, sup)
    loss = masked_bce_with_logits(occ_logits, binary, sup, pw)
    return jnp.where(n_p > 0, loss, 0.0 * occ_logits.sum())


def tsdf_occ_loss(tsdf_pred: jnp.ndarray, occ_logits: jnp.ndarray,
                  tsdf_target: jnp.ndarray, occ_target: jnp.ndarray,
                  mask: jnp.ndarray, pos_weight: float = 1.0,
                  loss_weight: Tuple[float, float] = (1.0, 1.0)) -> jnp.ndarray:
    """Per-level occ BCE + log-transformed TSDF L1
    (reference compute_loss, neucon_network.py:665-699)."""
    occ_t = occ_target.astype(jnp.float32)
    n_p = jnp.sum(occ_t * mask.astype(jnp.float32))
    w1 = compute_pos_weight(occ_t, mask) * pos_weight
    occ_loss = masked_bce_with_logits(occ_logits, occ_t, mask, w1)

    sup = mask & occ_target
    diff = jnp.abs(apply_log_transform(tsdf_pred) - apply_log_transform(tsdf_target))
    tsdf_loss = jnp.sum(diff * sup.astype(jnp.float32)) / jnp.maximum(
        jnp.sum(sup.astype(jnp.float32)), 1.0)

    loss = loss_weight[0] * occ_loss + loss_weight[1] * tsdf_loss
    return jnp.where(n_p > 0, loss, 0.0 * (tsdf_pred.sum() + occ_logits.sum()))
