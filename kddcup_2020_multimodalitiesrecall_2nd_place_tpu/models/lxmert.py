"""LXMERT: dual-stream cross-modal scorer (reference ``code/lxmert``).

Architecture (``lxrt/modeling.py:444-608``, defaults ``param.py:79-81``):
9 language layers over the 23-token query, then the visual feature encoder,
5 relational ("r") layers over the 10 visual tokens, then 5 cross ("x")
layers. Each x-layer runs bidirectional cross-attention where **one**
``visual_attention`` module is used for both directions
(``modeling.py:460-464``) followed by per-modality self-attention and FFN.

Visual token = (LN(visn_fc(feats)) + LN(box_fc(boxes4)) + LN(label_fc(z)))/3
where z mixes the 10x8 label-text embeddings over the token axis with a
1x1 Conv2d (8 channels -> 1) (``modeling.py:496-533``). Box-label texts are
embedded with the same BertEmbeddings as the query, with per-box position
ids 0..7 (``modeling.py:913-915``).

Head at inference: 2-layer GeLU/LN classifier ``logit_fc``
(``tasks/kdd_model.py:167-173, 207-213`` -- the AM path needs
--taskMatch --taskAMSloss which default to False), score =
softmax(logit)[:, -1] (``tasks/kdd_model.py:102-112``).

Activation is the erf GELU (HF lineage), unlike the TF stacks' tanh GELU.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..data.tsv import MAX_BOXES, MAX_LABEL_TOKENS, MAX_QUERY_LEN_L
from ..ops.attention import mask_to_bias
from . import heads
from .core import (
    BertConfig,
    Params,
    Precision,
    attention_block,
    attention_block_init,
    dense,
    dense_init,
    dropout,
    dual_cross_attention_blocks,
    embeddings_init,
    encoder,
    encoder_init,
    ffn_block,
    ffn_init,
    fused_encoder_layer,
    layer_norm,
    layer_norm_init,
    pooler,
    pooler_init,
    train_blocks_fused,
)

ACT = "gelu_erf"

# NOTE on sequence padding: imagebert_b pads S 30->32 for +20% whole-model
# (sublane alignment); the same trick measured NEGATIVE here in every
# combination on v5e (23/10 baseline 17.3k pairs/s vs 24/16 16.9k, 23/16
# 16.6k) -- the streams' tile padding is already absorbed by the kernels'
# compact [block*S, H] matmul reshape, and real extra rows only add FLOPs.
# Keep both streams at their natural lengths.


@dataclass(frozen=True)
class LxmertConfig:
    bert: BertConfig = BertConfig()
    l_layers: int = 9
    x_layers: int = 5
    r_layers: int = 5
    visual_feat_dim: int = 2048
    visual_pos_dim: int = 4


def _x_layer_init(rng, cfg: BertConfig) -> Params:
    ks = jax.random.split(rng, 5)
    return {
        "visual_attention": attention_block_init(ks[0], cfg),
        "lang_self_att": attention_block_init(ks[1], cfg),
        "visn_self_att": attention_block_init(ks[2], cfg),
        "lang_ffn": ffn_init(ks[3], cfg),
        "visn_ffn": ffn_init(ks[4], cfg),
    }


def _visn_fc_init(rng, lcfg: LxmertConfig) -> Params:
    cfg = lcfg.bert
    ks = jax.random.split(rng, 4)
    h = cfg.hidden_size
    return {
        "visn_fc": dense_init(ks[0], lcfg.visual_feat_dim, h, cfg.initializer_range),
        "visn_layer_norm": layer_norm_init(h),
        "box_fc": dense_init(ks[1], lcfg.visual_pos_dim, h, cfg.initializer_range),
        "box_layer_norm": layer_norm_init(h),
        "label_conv": {
            "weights": 0.02 * jax.random.normal(ks[2], (MAX_LABEL_TOKENS,), jnp.float32),
            "biases": jnp.zeros((1,), jnp.float32),
        },
        "label_fc": dense_init(ks[3], h, h, cfg.initializer_range),
        "label_layer_norm": layer_norm_init(h),
    }


def init_params(rng: jax.Array, lcfg: LxmertConfig) -> Params:
    cfg = lcfg.bert
    ks = jax.random.split(rng, 10)
    x_layers = [_x_layer_init(k, cfg) for k in jax.random.split(ks[2], lcfg.x_layers)]
    return {
        "bert": {
            "embeddings": embeddings_init(ks[0], cfg),
            "encoder": {
                "layer": encoder_init(ks[1], cfg, lcfg.l_layers),
                "r_layers": encoder_init(ks[3], cfg, lcfg.r_layers),
                "x_layers": jax.tree.map(lambda *xs: jnp.stack(xs), *x_layers),
                "visn_fc": _visn_fc_init(ks[4], lcfg),
            },
            "pooler": pooler_init(ks[5], cfg),
        },
        "cls": {
            "predictions": heads.mlm_head_init(ks[6], cfg),
            "seq_relationship": dense_init(ks[7], cfg.hidden_size, 2, cfg.initializer_range),
        },
        "logit_fc": heads.logit_fc_init(ks[8], cfg),
        "logit_W": jax.random.normal(ks[9], (cfg.hidden_size, 2), jnp.float32)
        * (2.0 / (cfg.hidden_size + 2)) ** 0.5,
    }


def bert_embed(
    emb: Params,
    input_ids: jax.Array,
    cfg: BertConfig,
    token_type_ids: jax.Array | None = None,
    rng: jax.Array | None = None,
    out_dtype=None,
) -> jax.Array:
    """BertEmbeddings (modeling.py:269-297): word + pos(arange) + type, LN.

    ``out_dtype`` narrows the emitted activations (LN math stays float32);
    the label path's [B, 10, 8, H] block is the big win in bf16 mode."""
    seq = input_ids.shape[-1]
    x = emb["word_embeddings"][input_ids]
    x = x + emb["position_embeddings"][:seq]
    if token_type_ids is None:
        x = x + emb["token_type_embeddings"][0]
    else:
        x = x + emb["token_type_embeddings"][token_type_ids]
    x = layer_norm(emb["LayerNorm"], x, out_dtype=out_dtype)
    if rng is not None:
        x = dropout(x, cfg.hidden_dropout_prob, rng)
    return x


def visual_encoder(
    p: Params,
    batch: dict,
    label_emb: jax.Array,
    cfg: BertConfig,
    prec: Precision,
    rng: jax.Array | None = None,
) -> jax.Array:
    """VisualFeatEncoder (modeling.py:519-533): (x + y + z) / 3."""
    x = layer_norm(p["visn_layer_norm"], dense(p["visn_fc"], batch["features"], prec))
    y = layer_norm(p["box_layer_norm"], dense(p["box_fc"], batch["boxes"], prec))
    w = p["label_conv"]["weights"]
    # f32 math regardless of the activation dtype: the 8-tap mix is tiny,
    # and the f32 accumulate keeps bf16-mode drift out of the /3 average
    z = (
        jnp.einsum(
            "bnth,t->bnh",
            label_emb.astype(jnp.float32),
            w,
            precision=jax.lax.Precision.HIGHEST,
        )
        + p["label_conv"]["biases"]
    )
    z = layer_norm(p["label_layer_norm"], dense(p["label_fc"], z, prec))
    out = (x + y + z) / 3.0
    if rng is not None:
        out = dropout(out, cfg.hidden_dropout_prob, rng)
    return out


def _scan_stack(stacked: Params, fn, init, training: bool = False,
                fused: bool = False):
    # per-layer remat, as in core.encoder: on the XLA train path the
    # backward otherwise saves all scan-stacked intermediates (train batch
    # 1024 needs ~39G of 15.75G HBM). On the fused train path every block
    # of every stack (self-attn, cross-attn, FFN) is a custom-VJP Pallas
    # kernel that recomputes its own intermediates in VMEM, so only the
    # [B, S, H] block inputs are saved and an outer remat would just run
    # every forward kernel twice (core.encoder applies the same policy).
    # ``fused`` is the caller's per-block gating result
    # (core.train_blocks_fused), NOT train_fused_mode(): a config the block
    # gates reject falls back to XLA blocks and must keep its remat.
    def body(carry, layer_p):
        return fn(carry, layer_p), None

    if not (training and fused):
        body = jax.checkpoint(body)

    out, _ = jax.lax.scan(body, init, stacked)
    return out


def apply(
    p: Params,
    batch: dict,
    lcfg: LxmertConfig,
    prec: Precision = Precision.f32(),
    rng: jax.Array | None = None,
    use_am_head: bool = False,
) -> dict:
    cfg = lcfg.bert
    enc = p["bert"]["encoder"]
    emb = p["bert"]["embeddings"]

    if rng is not None:
        rngs = list(jax.random.split(rng, 4))
        emb_rng, lab_rng, vis_rng, layer_rng = rngs
    else:
        emb_rng = lab_rng = vis_rng = layer_rng = None

    lang = bert_embed(
        emb, batch["input_ids"], cfg, rng=emb_rng, out_dtype=prec.compute_dtype
    )
    # [B,10,8] label ids embedded with the shared BertEmbeddings, pos ids 0..7
    label_emb = bert_embed(
        emb, batch["label_ids"], cfg, rng=lab_rng, out_dtype=prec.compute_dtype
    )
    visn = visual_encoder(enc["visn_fc"], batch, label_emb, cfg, prec, vis_rng)

    lang_bias = mask_to_bias(batch["input_mask"])[:, None, None, :]
    visn_bias = mask_to_bias(batch["feats_mask"])[:, None, None, :]

    def _rngs3(r):
        """(attn_rng, hidden_rng), ffn_rng for one block, or Nones."""
        if r is None:
            return None, None
        a, h, f = jax.random.split(r, 3)
        return (a, h), f

    def lang_layer(carry, lp):
        h, r = carry
        r, step = jax.random.split(r) if r is not None else (None, None)
        att_rngs, ffn_rng = _rngs3(step)
        h = attention_block(lp["attention"], h, h, lang_bias, cfg, prec, att_rngs)
        h = ffn_block(lp["ffn"], h, cfg, prec, act=ACT, hid_rng=ffn_rng)
        return (h, r)

    def visn_layer(carry, lp):
        h, r = carry
        r, step = jax.random.split(r) if r is not None else (None, None)
        att_rngs, ffn_rng = _rngs3(step)
        h = attention_block(lp["attention"], h, h, visn_bias, cfg, prec, att_rngs)
        h = ffn_block(lp["ffn"], h, cfg, prec, act=ACT, hid_rng=ffn_rng)
        return (h, r)

    if layer_rng is not None:
        l_rng, r_rng, x_rng = jax.random.split(layer_rng, 3)
    else:
        l_rng = r_rng = x_rng = None
    training = rng is not None
    # will the training blocks actually take the fused custom-VJP path?
    # (biases here are always compact [B,1,1,S]; ACT is gelu_erf)
    fused_of = lambda stack: train_blocks_fused(
        stack["attention"], stack["ffn"], lang_bias, ACT
    )
    lang, _ = _scan_stack(
        enc["layer"], lang_layer, (lang.astype(prec.compute_dtype), l_rng),
        training, fused=fused_of(enc["layer"]),
    )
    visn, _ = _scan_stack(
        enc["r_layers"], visn_layer, (visn.astype(prec.compute_dtype), r_rng),
        training, fused=fused_of(enc["r_layers"]),
    )

    # Measured NEGATIVE (v5e, B=8192): merging the two shared-weight cross
    # directions into one self-attention over the concatenated 33-row
    # stream with a block mask (identical math: modeling.py:460-464 shares
    # Q/K/V/output weights, LN is rowwise) scored 17.5k vs 18.3k pairs/s --
    # the per-layer concat+split copies the full [B, 33, H] stream twice
    # (~0.8 GB of HBM traffic per x-layer at B=8192), which outweighs the
    # saved launch + merged matmuls. Streams therefore stay separate.
    def x_layer(carry, lp):
        l, v, r = carry
        if r is not None:
            r, s = jax.random.split(r)
            ks = jax.random.split(s, 6)
            rng_of = lambda i: _rngs3(ks[i])
        else:
            rng_of = lambda i: (None, None)
        # shared cross-attention module, both directions (modeling.py:460-464)
        # -- fused into one dual-direction kernel launch at inference
        l2, v2 = dual_cross_attention_blocks(
            lp["visual_attention"], l, v, lang_bias, visn_bias, cfg, prec,
            rng_of(0)[0], rng_of(1)[0],
        )
        # self-attn + FFN per stream: one fused layer launch at inference
        l4 = v4 = None
        if r is None:
            l4 = fused_encoder_layer(
                lp["lang_self_att"], lp["lang_ffn"], l2, lang_bias, cfg, prec, ACT
            )
            v4 = fused_encoder_layer(
                lp["visn_self_att"], lp["visn_ffn"], v2, visn_bias, cfg, prec, ACT
            )
        if l4 is None:
            l3 = attention_block(lp["lang_self_att"], l2, l2, lang_bias, cfg, prec, rng_of(2)[0])
            l4 = ffn_block(lp["lang_ffn"], l3, cfg, prec, act=ACT, hid_rng=rng_of(4)[1])
        if v4 is None:
            v3 = attention_block(lp["visn_self_att"], v2, v2, visn_bias, cfg, prec, rng_of(3)[0])
            v4 = ffn_block(lp["visn_ffn"], v3, cfg, prec, act=ACT, hid_rng=rng_of(5)[1])
        return (l4, v4, r)

    x_fused = (
        train_blocks_fused(
            enc["x_layers"]["lang_self_att"], enc["x_layers"]["lang_ffn"],
            lang_bias, ACT,
        )
        and "kernel" in enc["x_layers"]["visual_attention"]["query"]
    )
    lang, visn, _ = _scan_stack(
        enc["x_layers"], x_layer, (lang, visn, x_rng), training, fused=x_fused
    )

    pooled = pooler(p["bert"]["pooler"], lang, prec)
    if use_am_head:
        x_n = pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=1, keepdims=True), 1e-12)
        w = p["logit_W"]
        w_n = w / jnp.maximum(jnp.linalg.norm(w, axis=0, keepdims=True), 1e-12)
        logit = jnp.dot(x_n, w_n, precision=jax.lax.Precision.HIGHEST)
    else:
        logit = heads.logit_fc(p["logit_fc"], pooled, prec)
    probs = jax.nn.softmax(logit, axis=-1)
    return {
        "lang": lang,
        "visn": visn,
        "pooled": pooled,
        "logit": logit,
        "probs": probs,
        "score": probs[:, -1],
    }


def score(p, batch, lcfg: LxmertConfig, prec: Precision = Precision.f32()) -> jax.Array:
    return apply(p, batch, lcfg, prec)["score"]
