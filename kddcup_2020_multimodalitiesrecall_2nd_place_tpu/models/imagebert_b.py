"""ImageBERT-B/C: single-stream 30-token AM-softmax scorer (``imagebert_zk``).

Image token = label path + box path + feature path (``model_triple.py:189-195``):

* label path: shared word-embedding lookup of the [10, 8] label ids
  (``pixelbert.embedding_lookup_label:454-490``), then a SAME-padded
  [1, 8] conv with 768 output channels and **ReLU** (slim.conv2d default
  activation, ``kdd_conv1``), then mean over the 8-token axis;
* box path: 5 -> 768 linear, no activation (``kdd_dense1``);
* feature path: 1x1 conv 2048 -> 768 with **ReLU** (``kdd_conv2``).

The sum passes one more 768 -> 768 linear (``kdd_featureemb``,
``pixelbert.py:449-452``). Text and image embeddings are concatenated BEFORE
postprocessing (``pixelbert.py:580-581``): token-type embeddings cover all
30 positions (segment ids [0]*20+[1]*10) and position ids are
[0..19] + [20]*10 (``pixelbert.py:613-617``) -- every box shares position 20.
Real padding masks from len_query/num_boxes (``model_triple.py:198-201``).
Head: AM-softmax with the fed label (testB feeds label=1), score =
probs[:, 1] (``evaluate_normal.py:240-243``).

ImageBERT-C is this model with the sen2forest query rewrite applied in the
data layer (``zk load_data_v4.py:153-154``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.tsv import MAX_BOXES, MAX_QUERY_LEN_AB
from . import heads
from .core import (
    BertConfig,
    Params,
    Precision,
    dense,
    dense_init,
    dropout,
    embeddings_init,
    encoder,
    encoder_init,
    layer_norm,
    pooler,
    pooler_init,
    trunc_normal,
)

TEXT_LEN = MAX_QUERY_LEN_AB  # 20
SEQ_LEN = TEXT_LEN + MAX_BOXES  # 30
BOX_POSITION_ID = 20

# position id row used for every image token (pixelbert.py:613-617)
_POSITION_IDS = jnp.concatenate(
    [jnp.arange(TEXT_LEN), jnp.full((MAX_BOXES,), BOX_POSITION_ID)]
)


def init_params(rng: jax.Array, cfg: BertConfig) -> Params:
    ks = jax.random.split(rng, 9)
    return {
        "bert": {
            "embeddings": embeddings_init(ks[0], cfg),
            "encoder": encoder_init(ks[1], cfg),
            "pooler": pooler_init(ks[2], cfg),
        },
        "kdd_conv1": {
            "weights": trunc_normal(ks[3], (8, cfg.hidden_size, cfg.hidden_size), 0.02),
            "biases": jnp.zeros((cfg.hidden_size,), jnp.float32),
        },
        "kdd_dense1": dense_init(ks[4], 5, cfg.hidden_size, cfg.initializer_range),
        "kdd_conv2": dense_init(ks[5], 2048, cfg.hidden_size, cfg.initializer_range),
        "kdd_featureemb": dense_init(ks[6], cfg.hidden_size, cfg.hidden_size, cfg.initializer_range),
        "cls": {"seq_relationship": heads.am_head_init(ks[7], cfg)},
    }


def _label_conv(p: Params, emb: jax.Array, prec: Precision) -> jax.Array:
    """SAME-padded width-8 conv over the label-token axis, ReLU, then mean.

    emb: [B, 10, 8, H] -> [B, 10, H]. TF SAME for kernel 8 over width 8
    pads 3 left / 4 right; output position w sees tokens [w-3, w+4]
    (``model_triple.py:189-190``, slim.conv2d ``kdd_conv1``).

    Computed as ONE banded [8H, 8H] matmul instead of 8 shifted einsums:
    out[..., w, :] = sum_t emb[..., t, :] @ W[t - w + 3], so flattening the
    token axis into the contraction gives a single well-tiled MXU matmul and
    no per-tap [B, 10, 8, H] float32 accumulation temporaries in HBM. The
    ~19% zero blocks (|t - w + 3| out of range) are cheaper than the eight
    extra HBM round-trips they replace.
    """
    w = p["weights"].astype(prec.compute_dtype)  # [8(tap), H_in, H_out]
    b, n, t, h = emb.shape  # t == 8
    zero = jnp.zeros_like(w[0])
    cols = []
    for wo in range(t):
        taps = [
            w[ti - wo + 3] if 0 <= ti - wo + 3 < w.shape[0] else zero
            for ti in range(t)
        ]
        cols.append(jnp.stack(taps, 0))  # [t_in, H_in, H_out]
    wband = jnp.stack(cols, 2).reshape(t * h, t * w.shape[-1])  # [(t,h_in),(w,h_out)]
    x2 = emb.astype(prec.compute_dtype).reshape(b * n, t * h)
    out = jnp.dot(
        x2, wband, preferred_element_type=jnp.float32, precision=prec.matmul
    ).reshape(b, n, t, w.shape[-1])
    out = jax.nn.relu(out + p["biases"])
    return jnp.mean(out, axis=2)


def image_tokens(p: Params, batch: dict, prec: Precision) -> jax.Array:
    """-> [B, 10, H] image token embeddings before kdd_featureemb."""
    emb_table = p["bert"]["embeddings"]["word_embeddings"]
    lab = _label_conv(p["kdd_conv1"], emb_table[batch["label_ids"]], prec)
    box = dense(p["kdd_dense1"], batch["boxes"], prec)
    feat = jax.nn.relu(dense(p["kdd_conv2"], batch["features"], prec))
    return lab + box + feat


def input_mask(batch: dict) -> jax.Array:
    """[B, 30] keep-mask: sequence_mask(len_query, 20) ++ sequence_mask(num_boxes, 10)."""
    q = jnp.arange(TEXT_LEN)[None, :] < batch["len_query"][:, None]
    b = jnp.arange(MAX_BOXES)[None, :] < batch["num_boxes"][:, None]
    return jnp.concatenate([q, b], axis=1).astype(jnp.int32)


def embed(
    p: Params,
    batch: dict,
    cfg: BertConfig,
    prec: Precision,
    rng: jax.Array | None = None,
) -> jax.Array:
    emb = p["bert"]["embeddings"]
    img = dense(p["kdd_featureemb"], image_tokens(p, batch, prec), prec)
    text = emb["word_embeddings"][batch["input_ids"]]
    x = jnp.concatenate([text.astype(jnp.float32), img.astype(jnp.float32)], axis=1)
    x = x + emb["token_type_embeddings"][batch["segment_ids"]]
    x = x + emb["position_embeddings"][_POSITION_IDS][None]
    x = layer_norm(emb["LayerNorm"], x)
    if rng is not None:
        x = dropout(x, cfg.hidden_dropout_prob, rng)
    return x


# run the encoder at a sublane-aligned sequence length: S=30 forces a
# 30->32 relayout inside every fused kernel's matmul reshape, measured
# +51% attention-block time on v5e (2.85 ms vs 4.30 ms per 2048x12 heads).
# B's padding is *masked* (unlike A's all-ones quirk), so two extra
# always-masked positions are parity-exact: their keys get the -10000
# bias (softmax weight exactly 0.0 in f32) and nothing downstream reads
# their rows (pooler = token 0, MLM/word-match positions < 30).
PADDED_SEQ_LEN = 32


def apply(
    p: Params,
    batch: dict,
    cfg: BertConfig,
    prec: Precision = Precision.f32(),
    rng: jax.Array | None = None,
) -> dict:
    if rng is not None:
        rng, emb_rng, enc_rng = jax.random.split(rng, 3)
    else:
        emb_rng = enc_rng = None
    x = embed(p, batch, cfg, prec, emb_rng)
    mask = input_mask(batch)
    pad = PADDED_SEQ_LEN - SEQ_LEN
    x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    mask = jnp.pad(mask, ((0, 0), (0, pad)))
    bias = ((1.0 - mask.astype(jnp.float32)) * -10000.0)[:, None, None, :]
    seq = encoder(p["bert"]["encoder"], x, bias, cfg, prec, rng=enc_rng)
    seq = seq[:, :SEQ_LEN]
    pooled = pooler(p["bert"]["pooler"], seq, prec)
    labels = batch["labels"]
    probs = heads.am_probs(p["cls"]["seq_relationship"], pooled, labels)
    return {
        "sequence": seq,
        "pooled": pooled,
        "probs": probs,
        "score": probs[:, 1],
    }


def score(p: Params, batch: dict, cfg: BertConfig, prec: Precision = Precision.f32()) -> jax.Array:
    return apply(p, batch, cfg, prec)["score"]
