"""Classification heads shared across the model family.

* NSP-style binary softmax head (ImageBERT-A, score = probs[:, 1]):
  ``run_pretraining_predict_score.py:479-501``.
* AM-softmax head (ImageBERT-B/C): L2-normalised pooled output against an
  L2-normalised [768, 2] kernel with margin 0.35 / scale 30. The margin is
  applied to the *fed label's* class (the reference feeds label=1 on testB),
  and only where cos > margin -- ``model_triple.py:56-106``. That quirk is
  load-bearing: scores change if you drop it.
* Tied-embedding MLM head: ``run_pretraining_predict_score.py:433-476``.
* LXMERT 2-layer GeLU/LN classifier ``logit_fc``: ``tasks/kdd_model.py:167-173``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.activations import gelu_erf, gelu_tanh
from .core import (
    BertConfig,
    Params,
    Precision,
    dense,
    dense_init,
    layer_norm,
    layer_norm_init,
    trunc_normal,
)

AM_MARGIN = 0.35
AM_SCALE = 30.0


# ---- NSP binary softmax ----------------------------------------------------


def nsp_head_init(rng, cfg: BertConfig) -> Params:
    return {
        "output_weights": trunc_normal(rng, (2, cfg.hidden_size), cfg.initializer_range),
        "output_bias": jnp.zeros((2,), jnp.float32),
    }


def nsp_logits(p: Params, pooled: jax.Array) -> jax.Array:
    return (
        jnp.dot(
            pooled.astype(jnp.float32),
            p["output_weights"].T.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
        + p["output_bias"]
    )


def nsp_probs(p: Params, pooled: jax.Array) -> jax.Array:
    return jax.nn.softmax(nsp_logits(p, pooled), axis=-1)


def nsp_loss(p: Params, pooled: jax.Array, labels: jax.Array) -> jax.Array:
    log_probs = jax.nn.log_softmax(nsp_logits(p, pooled), axis=-1)
    one_hot = jax.nn.one_hot(labels, 2, dtype=jnp.float32)
    return -jnp.mean(jnp.sum(one_hot * log_probs, axis=-1))


# ---- AM-softmax -------------------------------------------------------------


def am_head_init(rng, cfg: BertConfig) -> Params:
    # xavier_normal over [768, 2] (model_triple.py:62-63)
    fan_in, fan_out = cfg.hidden_size, 2
    std = (2.0 / (fan_in + fan_out)) ** 0.5
    return {"am_kernel": std * jax.random.normal(rng, (fan_in, fan_out), jnp.float32)}


def am_cosines(p: Params, pooled: jax.Array) -> jax.Array:
    """cos(theta) per class, clipped to [-1, 1]."""
    x = pooled.astype(jnp.float32)
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    w = p["am_kernel"].astype(jnp.float32)
    w = w / jnp.maximum(jnp.linalg.norm(w, axis=0, keepdims=True), 1e-10)
    return jnp.clip(jnp.dot(x, w, precision=jax.lax.Precision.HIGHEST), -1.0, 1.0)


def am_margin_logits(cos: jax.Array, labels: jax.Array) -> jax.Array:
    """scale * (cos - margin applied to the label class where cos > margin)."""
    one_hot = jax.nn.one_hot(labels, 2, dtype=jnp.float32)
    gt_score = jnp.sum(cos * one_hot, axis=-1, keepdims=True)
    added_margin = jnp.where(gt_score > AM_MARGIN, AM_MARGIN, 0.0)
    return (cos - one_hot * added_margin) * AM_SCALE


def am_probs(p: Params, pooled: jax.Array, labels: jax.Array) -> jax.Array:
    return jax.nn.softmax(am_margin_logits(am_cosines(p, pooled), labels), axis=-1)


def am_loss(p: Params, pooled: jax.Array, labels: jax.Array) -> jax.Array:
    logits = am_margin_logits(am_cosines(p, pooled), labels)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    one_hot = jax.nn.one_hot(labels, 2, dtype=jnp.float32)
    return -jnp.mean(jnp.sum(one_hot * log_probs, axis=-1))


# ---- B word-match auxiliary head ---------------------------------------------
#
# ``model_triple.py:108-160`` + the per-position query heads of
# ``pixelbert.py:268-278``: a shared tanh projection of sequence positions
# 1..18 and per-position binary classifiers, CE-weighted by which query
# slots are real words. The reference ships this commented out (training
# ran with it off); it is exposed behind a default-off switch
# (``TrainConfig.word_match_loss_weight``).


def word_match_head_init(rng, cfg: BertConfig, n_positions: int = 18) -> Params:
    k1, k2 = jax.random.split(rng)
    return {
        # the shared 'kdd' tanh dense (pixelbert.py:272-277, AUTO_REUSE)
        "kdd": dense_init(k1, cfg.hidden_size, cfg.hidden_size, cfg.initializer_range),
        # per-position output_weights<i>/output_bias<i>, stacked
        "output_weights": trunc_normal(
            k2, (n_positions, 2, cfg.hidden_size), cfg.initializer_range
        ),
        "output_bias": jnp.zeros((n_positions, 2), jnp.float32),
    }


def word_match_loss(
    p: Params,
    seq: jax.Array,
    labels: jax.Array,
    weights: jax.Array,
    prec: Precision,
) -> jax.Array:
    """Sum over positions of batch-mean weighted CE (the reference
    accumulates ``loss += loss_i`` per index: model_triple.py:207-210)."""
    n = p["output_bias"].shape[0]
    h = jnp.tanh(dense(p["kdd"], seq[:, 1 : 1 + n].astype(jnp.float32), prec))
    logits = (
        jnp.einsum(
            "bth,tch->btc",
            h,
            p["output_weights"].astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
        + p["output_bias"]
    )
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    one_hot = jax.nn.one_hot(labels, 2, dtype=jnp.float32)
    per = -jnp.sum(one_hot * log_probs, axis=-1) * weights  # [B, n]
    return jnp.sum(jnp.mean(per, axis=0))


# ---- tied-embedding MLM ------------------------------------------------------


def mlm_head_init(rng, cfg: BertConfig) -> Params:
    return {
        "transform": {
            "dense": dense_init(rng, cfg.hidden_size, cfg.hidden_size, cfg.initializer_range),
            "LayerNorm": layer_norm_init(cfg.hidden_size),
        },
        "output_bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
    }


def mlm_logits(
    p: Params,
    hidden: jax.Array,
    word_embeddings: jax.Array,
    prec: Precision,
    act=gelu_tanh,
) -> jax.Array:
    h = act(dense(p["transform"]["dense"], hidden, prec))
    h = layer_norm(p["transform"]["LayerNorm"], h)
    logits = jnp.dot(
        h.astype(prec.compute_dtype),
        word_embeddings.T.astype(prec.compute_dtype),
        preferred_element_type=jnp.float32,
        precision=prec.matmul,
    )
    return logits + p["output_bias"]


def mlm_loss(
    logits: jax.Array, label_ids: jax.Array, label_weights: jax.Array
) -> jax.Array:
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(log_probs, label_ids[..., None], axis=-1)[..., 0]
    num = jnp.sum(label_weights * (-picked))
    den = jnp.sum(label_weights) + 1e-5
    return num / den


# ---- LXMERT logit_fc ----------------------------------------------------------


def logit_fc_init(rng, cfg: BertConfig, num_answers: int = 2) -> Params:
    h = cfg.hidden_size
    k1, k2 = jax.random.split(rng)
    return {
        "fc1": dense_init(k1, h, 2 * h, cfg.initializer_range),
        "LayerNorm": layer_norm_init(2 * h),
        "fc2": dense_init(k2, 2 * h, num_answers, cfg.initializer_range),
    }


def logit_fc(p: Params, pooled: jax.Array, prec: Precision) -> jax.Array:
    h = gelu_erf(dense(p["fc1"], pooled, prec))
    h = layer_norm(p["LayerNorm"], h)
    return dense(p["fc2"], h, prec)
