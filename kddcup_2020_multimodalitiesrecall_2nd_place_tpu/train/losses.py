"""Training losses: Multi-Similarity and the word-match auxiliary.

NSP / AM-softmax / MLM losses live next to their heads in ``models.heads``.

``ms_loss`` follows ``imagebert_lds/src/msloss.py:6-50`` (CVPR'19
Multi-Similarity, alpha=2, beta=50, lambda=1) -- used for the
ModelCheckPointGPUSATTLOSS fine-tune stage of ImageBERT-A.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ms_loss(
    labels: jax.Array,  # [B] int
    embeddings: jax.Array,  # [B, D]
    alpha: float = 2.0,
    beta: float = 50.0,
    lamb: float = 1.0,
    eps: float = 0.1,
    ms_mining: bool = False,
) -> jax.Array:
    x = embeddings.astype(jnp.float32)
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    batch = x.shape[0]
    labels = labels.reshape(-1, 1)

    adjacency = labels == labels.T
    mask_pos = adjacency.astype(jnp.float32) - jnp.eye(batch, dtype=jnp.float32)
    mask_neg = (~adjacency).astype(jnp.float32)

    sim = jnp.maximum(x @ x.T, 0.0)
    pos_mat = sim * mask_pos
    neg_mat = sim * mask_neg

    if ms_mining:
        max_val = jnp.max(neg_mat, axis=1, keepdims=True)
        tmp_max = jnp.max(pos_mat, axis=1, keepdims=True)
        min_val = jnp.min((sim - tmp_max) * mask_pos, axis=1, keepdims=True) + tmp_max
        mask_pos = jnp.where(pos_mat < max_val + eps, mask_pos, 0.0)
        mask_neg = jnp.where(neg_mat > min_val - eps, mask_neg, 0.0)

    pos_exp = jnp.where(mask_pos > 0.0, jnp.exp(-alpha * (pos_mat - lamb)), 0.0)
    neg_exp = jnp.where(mask_neg > 0.0, jnp.exp(beta * (neg_mat - lamb)), 0.0)
    pos_term = jnp.log1p(jnp.sum(pos_exp, axis=1)) / alpha
    neg_term = jnp.log1p(jnp.sum(neg_exp, axis=1)) / beta
    return jnp.mean(pos_term + neg_term)


def word_match_loss(
    logits: jax.Array,  # [B, T, 2] per-token match logits
    labels: jax.Array,  # [B, T] {0,1}
    weights: jax.Array,  # [B, T] {0,1}
) -> jax.Array:
    """Per-token query-word match auxiliary (model_triple.py:108-130; the
    head exists in the B checkpoint's lineage though its loss term is
    commented out of the final fine-tune)."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    one_hot = jax.nn.one_hot(labels, 2, dtype=jnp.float32)
    per_token = -jnp.sum(one_hot * log_probs, axis=-1) * weights
    return jnp.mean(per_token)
