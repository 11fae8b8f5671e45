"""Mask2Former-style masked transformer decoder over sparse voxels.

TPU-native re-design of reference models/mask3dformer.py:202-458
(MultiScaleMaskedTransformerDecoder): 80 learned queries, 6 decoder layers
cycling over 3 voxel scales, each layer = masked cross-attention →
self-attention → FFN, with prediction heads (class linear + mask MLP +
einsum mask logits) after every layer. Capacity padding is handled with key
masks; the per-scale attention mask is gathered through nearest-fine-voxel
indices (reference :359-369) computed by a memory-bounded chunked argmin.
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from eprecon_tpu.models.blocks import MLP
from eprecon_tpu.models.panoptic.position_encoding import FourierPositionEncoding

NEG_INF = -1e9


def nearest_fine_index(coords_p: jnp.ndarray, valid_p: jnp.ndarray,
                       coords_fine: jnp.ndarray, valid_fine: jnp.ndarray,
                       chunk: int = 2048) -> jnp.ndarray:
    """For each level-p voxel, index of the nearest valid fine voxel.

    Equivalent of the reference's torch.cdist + argmin (mask3dformer.py:359-367)
    but streamed over fine-voxel chunks so the [K_p, K_fine] distance matrix is
    never materialized. Distances via |a|^2 + |b|^2 - 2ab (MXU matmul).
    """
    a = coords_p.astype(jnp.float32)            # [Kp, 3]
    b = coords_fine.astype(jnp.float32)         # [Kf, 3]
    kf = b.shape[0]
    pad = (-kf) % chunk
    if pad:
        b = jnp.concatenate([b, jnp.zeros((pad, 3), b.dtype)])
        valid_fine = jnp.concatenate([valid_fine, jnp.zeros(pad, bool)])
    n_chunks = b.shape[0] // chunk
    b = b.reshape(n_chunks, chunk, 3)
    vf = valid_fine.reshape(n_chunks, chunk)
    a_sq = jnp.sum(a * a, axis=1, keepdims=True)  # [Kp, 1]

    def body(carry, xs):
        best_d, best_i = carry
        bc, vc, base = xs
        d = a_sq + jnp.sum(bc * bc, axis=1)[None, :] - 2.0 * (a @ bc.T)
        d = jnp.where(vc[None, :], d, jnp.inf)
        ci = jnp.argmin(d, axis=1)
        cd = jnp.take_along_axis(d, ci[:, None], axis=1)[:, 0]
        upd = cd < best_d
        return (jnp.where(upd, cd, best_d),
                jnp.where(upd, base + ci.astype(jnp.int32), best_i)), None

    init = (jnp.full((a.shape[0],), jnp.inf), jnp.zeros(a.shape[0], jnp.int32))
    bases = (jnp.arange(n_chunks) * chunk).astype(jnp.int32)
    (best_d, best_i), _ = jax.lax.scan(body, init, (b, vf, bases))
    return jnp.where(valid_p, best_i, 0)


class MultiHeadAttention(nn.Module):
    """Standard MHA with additive mask support (torch MultiheadAttention
    equivalent, reference mask3dformer.py:12-130)."""
    num_heads: int

    @nn.compact
    def __call__(self, q, k, v, attn_mask: Optional[jnp.ndarray] = None,
                 key_padding: Optional[jnp.ndarray] = None):
        """q: [Q, C]; k/v: [L, C]; attn_mask: bool [H, Q, L] or [Q, L]
        (True = do NOT attend); key_padding: bool [L] (True = ignore key)."""
        c = q.shape[-1]
        h = self.num_heads
        hd = c // h
        xavier = nn.initializers.xavier_uniform()
        dt = jnp.bfloat16
        wq = nn.Dense(c, kernel_init=xavier, dtype=dt, name="q")(q).reshape(-1, h, hd)
        wk = nn.Dense(c, kernel_init=xavier, dtype=dt, name="k")(k).reshape(-1, h, hd)
        wv = nn.Dense(c, kernel_init=xavier, dtype=dt, name="v")(v).reshape(-1, h, hd)
        logits = (jnp.einsum("qhd,lhd->hql", wq, wk) / np.sqrt(hd)).astype(jnp.float32)
        if attn_mask is not None:
            if attn_mask.ndim == 2:
                attn_mask = attn_mask[None]
            logits = jnp.where(attn_mask, NEG_INF, logits)
        if key_padding is not None:
            logits = jnp.where(key_padding[None, None, :], NEG_INF, logits)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("hql,lhd->qhd", w, wv).reshape(-1, c)
        return nn.Dense(c, kernel_init=xavier, name="out")(out)


class DecoderOutputs(NamedTuple):
    pred_logits: jnp.ndarray   # [layers+1, Q, num_classes+1]
    pred_masks: jnp.ndarray    # [layers+1, Q, K_fine] (mask logits)


class MaskedTransformerDecoder(nn.Module):
    """reference models/mask3dformer.py:202-458 for a single fragment (bs=1)."""
    num_classes: int = 20
    hidden_dim: int = 48
    num_queries: int = 80
    num_heads: int = 8
    dim_feedforward: int = 192
    dec_layers: int = 6
    num_levels: int = 3

    @nn.compact
    def __call__(self, level_feats: Sequence[jnp.ndarray],
                 level_coords: Sequence[jnp.ndarray],
                 level_valid: Sequence[jnp.ndarray],
                 mask_features: jnp.ndarray,
                 spatial_shape: Tuple[int, int, int],
                 mask_idx: Optional[Sequence[jnp.ndarray]] = None) -> DecoderOutputs:
        """
        Args:
          level_feats: per level [K_p, C] voxel features (coarse→fine order
            p=0,1,2 like the reference's panoptic_feats list).
          level_coords: per level [K_p, 3] fine-unit voxel coords.
          level_valid: per level [K_p] bool.
          mask_features: [K_fine, C] (fine level).
          mask_idx: optional precomputed nearest-fine-voxel row per level
            (see eprecon.nearest_fine_in_cell — O(1) when levels are
            cell-aligned); falls back to exact chunked NN otherwise.
        """
        c = self.hidden_dim
        q = self.num_queries
        query_feat = self.param("query_feat", nn.initializers.normal(1.0), (q, c))
        query_embed = self.param("query_embed", nn.initializers.normal(1.0), (q, c))
        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (self.num_levels, c))
        pos_enc = FourierPositionEncoding(c)
        smin = jnp.zeros(3)
        smax = jnp.asarray(spatial_shape, jnp.float32)

        src, pos = [], []
        for p in range(self.num_levels):
            src.append(level_feats[p] + level_embed[p][None, :])
            pos.append(pos_enc(level_coords[p].astype(jnp.float32), smin, smax))

        # nearest-fine-voxel gather indices per level (reference :358-369)
        fine_c, fine_v = level_coords[-1], level_valid[-1]
        if mask_idx is None:
            mask_idx = [
                nearest_fine_index(level_coords[0], level_valid[0], fine_c, fine_v),
                nearest_fine_index(level_coords[1], level_valid[1], fine_c, fine_v),
                jnp.arange(fine_c.shape[0], dtype=jnp.int32),
            ]

        decoder_norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")
        class_embed = nn.Dense(self.num_classes + 1, name="class_embed")
        mask_embed = MLP(c * 4, c, 3, name="mask_embed")

        def prediction_heads(output, level):
            d = decoder_norm(output)
            ocls = class_embed(d)                      # [Q, nc+1]
            memb = mask_embed(d)                       # [Q, C]
            omask = jnp.einsum("qc,lc->ql", memb, mask_features)  # [Q, K_fine]
            # attention mask for the NEXT level: gather mask logits at the
            # nearest fine voxel of each level voxel; True = don't attend
            gath = omask[:, mask_idx[level]]           # [Q, K_level]
            amask = jax.nn.sigmoid(gath) < 0.5
            amask = amask | ~level_valid[level][None, :]
            # un-mask queries whose mask is empty (reference :388)
            all_masked = jnp.sum((~amask) & level_valid[level][None, :],
                                 axis=1) == 0
            amask = jnp.where(all_masked[:, None], ~level_valid[level][None, :],
                              amask)
            amask = jax.lax.stop_gradient(amask)
            return ocls, omask, amask

        output = query_feat
        logits_all, masks_all = [], []
        ocls, omask, amask = prediction_heads(output, 0)
        logits_all.append(ocls)
        masks_all.append(omask)

        for j in range(self.dec_layers):
            lvl = j % self.num_levels
            # cross-attention (post-norm, reference :93-105)
            att = MultiHeadAttention(self.num_heads, name=f"cross_{j}")(
                output + query_embed, src[lvl] + pos[lvl], src[lvl],
                attn_mask=amask, key_padding=~level_valid[lvl])
            output = nn.LayerNorm(epsilon=1e-5, name=f"cross_norm_{j}")(output + att)
            # self-attention (reference :35-45)
            att = MultiHeadAttention(self.num_heads, name=f"self_{j}")(
                output + query_embed, output + query_embed, output)
            output = nn.LayerNorm(epsilon=1e-5, name=f"self_norm_{j}")(output + att)
            # FFN (reference :158-162)
            ff = nn.Dense(self.dim_feedforward, name=f"ffn1_{j}")(output)
            ff = nn.Dense(self.hidden_dim, name=f"ffn2_{j}")(nn.relu(ff))
            output = nn.LayerNorm(epsilon=1e-5, name=f"ffn_norm_{j}")(output + ff)

            ocls, omask, amask = prediction_heads(output, (j + 1) % self.num_levels)
            logits_all.append(ocls)
            masks_all.append(omask)

        return DecoderOutputs(jnp.stack(logits_all), jnp.stack(masks_all))
