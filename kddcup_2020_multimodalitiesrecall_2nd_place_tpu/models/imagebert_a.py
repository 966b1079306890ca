"""ImageBERT-A: single-stream 40-token scorer (reference ``imagebert_lds``).

Sequence layout: [20 query wordpieces | 10 RoI-feature tokens | 10 label
tokens]. Query tokens get word+type+position embeddings then LayerNorm
(+dropout); RoI features pass a 2048->768 linear (``pixelmodel.py:439-442``);
label tokens are mixed 8->1 with a learned vector via the *reshape quirk*
below; the three blocks are concatenated AFTER postprocessing
(``pixelmodel.py:601``) so image/label tokens carry no position/type
embeddings and skip the embedding LayerNorm. The attention mask is all-ones
over all 40 positions -- padding is deliberately NOT masked
(``pixelmodel.py:189-195``). Head: binary NSP softmax, match score =
probs[:, 1] (``run_pretraining_predict_score.py:479-501,573-576``).

The label-mix quirk (``pixelmodel.py:489-498``): the TF code reshapes the
[B,10,8,768] label embeddings to (-1, 8) *in C order*, which groups 8
consecutive **hidden dims of one token**, not the 8 tokens, then matmuls a
learned [8,1] vector. The trained checkpoint bakes this in, so we reproduce
the exact reshape->matmul->reshape rather than a per-token mix.
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
SEQ_LEN = TEXT_LEN + 2 * MAX_BOXES  # 40


def init_params(rng: jax.Array, cfg: BertConfig) -> Params:
    ks = jax.random.split(rng, 7)
    emb = embeddings_init(ks[0], cfg)
    # the 8->1 label mixing vector, named word_embeddings_labelembedding in TF
    emb["word_embeddings_labelembedding"] = trunc_normal(ks[1], (8, 1), cfg.initializer_range)
    return {
        "bert": {
            "embeddings": emb,
            "encoder": encoder_init(ks[2], cfg),
            "pooler": pooler_init(ks[3], cfg),
        },
        "featureemb": dense_init(ks[4], 2048, cfg.hidden_size, cfg.initializer_range),
        "cls": {
            "seq_relationship": heads.nsp_head_init(ks[5], cfg),
            "predictions": heads.mlm_head_init(ks[6], cfg),
        },
    }


def _label_mix(emb_table: jax.Array, mix: jax.Array, label_ids: jax.Array) -> jax.Array:
    """The reshape4D quirk: [B,10,8] ids -> [B,10,768] mixed embeddings.

    TF's ``reshape(-1, 8) @ mix`` groups 8 *consecutive hidden dims* (C
    order), i.e. out[b,n, t*96+g] = sum_j e[b,n,t, g*8+j] * mix[j]. A literal
    thin [.., 8] matmul pads catastrophically on TPU (8 -> 128 lanes, 16x
    HBM blowup), so the same contraction is expressed over the last axis of
    a [B,10,8,96,8] view -- bit-identical math, sane layout.
    """
    e = emb_table[label_ids]  # [B, 10, 8, H]
    b, n, t, h = e.shape
    g = h // t  # 96 groups of 8 consecutive dims per token
    # out[b,n,t,gi] = sum_j e[b,n,t, gi*8+j] * mix[j]  ==  e_t @ kron(I_g, mix)
    # -- a [H, 96] matmul with sane TPU layout (a literal [..., 8] view pads
    # 16x and OOMs at scoring batch sizes).
    mix_mat = jnp.kron(jnp.eye(g, dtype=e.dtype), mix.astype(e.dtype))  # [H, g]
    mixed = jnp.einsum(
        "bnth,hg->bntg", e, mix_mat, precision=jax.lax.Precision.HIGHEST
    )
    return mixed.reshape(b, MAX_BOXES, h)


def embed(
    p: Params,
    batch: dict,
    cfg: BertConfig,
    prec: Precision,
    rng: jax.Array | None = None,
) -> jax.Array:
    """-> [B, 40, H] transformer input."""
    emb = p["bert"]["embeddings"]
    table = emb["word_embeddings"]

    text = table[batch["input_ids"]]  # [B, 20, H]
    text = text + emb["token_type_embeddings"][batch["segment_ids"]]
    text = text + emb["position_embeddings"][:TEXT_LEN][None]
    text = layer_norm(emb["LayerNorm"], text)
    if rng is not None:
        rng, r = jax.random.split(rng)
        text = dropout(text, cfg.hidden_dropout_prob, r)

    feat = dense(p["featureemb"], batch["features"], prec)  # [B, 10, H]
    label = _label_mix(table, emb["word_embeddings_labelembedding"], batch["label_ids"])
    return jnp.concatenate(
        [text.astype(jnp.float32), feat.astype(jnp.float32), label.astype(jnp.float32)],
        axis=1,
    )


def apply(
    p: Params,
    batch: dict,
    cfg: BertConfig,
    prec: Precision = Precision.f32(),
    rng: jax.Array | None = None,
) -> dict:
    """Forward pass. rng=None -> inference (all dropout off, as the reference
    zeroes dropout when not is_training: pixelmodel.py:178-180)."""
    if rng is not None:
        rng, emb_rng, enc_rng = jax.random.split(rng, 3)
    else:
        emb_rng = enc_rng = None
    x = embed(p, batch, cfg, prec, emb_rng)
    # all-ones attention mask over the full 40 tokens => no bias
    seq = encoder(p["bert"]["encoder"], x, None, cfg, prec, rng=enc_rng)
    pooled = pooler(p["bert"]["pooler"], seq, prec)
    probs = heads.nsp_probs(p["cls"]["seq_relationship"], pooled)
    return {
        "sequence": seq,
        "pooled": pooled,
        "probs": probs,
        "score": probs[:, 1],
    }


def score(p: Params, batch: dict, cfg: BertConfig, prec: Precision = Precision.f32()) -> jax.Array:
    return apply(p, batch, cfg, prec)["score"]
