"""Shared cross-modal transformer core (functional JAX, pytree params).

All four reference scorers are BERT-Base-shaped encoders differing only in
how image tokens are embedded, position/segment layout, mask policy and
head. This module provides the shared pieces:

* ``BertConfig`` (mirrors ``code/user_data/bert_config.json``),
* parameter initialisation (truncated normal, stddev=initializer_range,
  matching ``create_initializer``: ``pixelmodel.py:418-420``),
* layer norm (eps 1e-12, float32 math -- TF contrib layer_norm and torch
  BertLayerNorm both use 1e-12),
* the post-LN encoder stack, run with ``lax.scan`` over stacked per-layer
  parameters (one compiled layer body instead of 12 unrolled ones),
* the tanh pooler.

Precision policy: parameters live in float32; matmul inputs are cast to
``Precision.compute_dtype`` (bfloat16 on TPU for throughput) with float32
accumulation; LayerNorm, softmax and all head math stay float32. ``f32()``
gives the strict-parity configuration.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.activations import ACTIVATIONS
from ..ops.attention import (
    merge_heads,
    mha,
    mha_packed,
    packed_attention_active,
    split_heads,
)

Params = dict[str, Any]


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 21128
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    # per-model defaults for the fused train kernels' batch-block sizes
    # (ops/pallas_train.py). None = the kernels' per-op defaults; the
    # KMR_TRAIN_BLOCK[_FFN|_ATTN] sweep knobs override either way. The
    # optimum is model-shaped: lxmert's short 10/23-token streams want
    # bigger blocks than imagebert_a's 40-token FFN can fit in VMEM.
    train_block_ffn: int | None = None
    train_block_attn: int | None = None

    @classmethod
    def from_json_file(cls, path) -> "BertConfig":
        with open(path, "r", encoding="utf-8") as f:
            raw = json.load(f)
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in fields})

    def replace(self, **kw) -> "BertConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class Precision:
    """Matmul policy.

    On TPU, float32 matmul inputs still run on the MXU in bfloat16 passes
    unless ``jax.lax.Precision.HIGHEST`` is requested -- strict parity mode
    must set it or a 2048-length contraction drifts ~5e-3. bf16 mode uses
    the fast single-pass default.
    """

    compute_dtype: Any = jnp.float32
    matmul: jax.lax.Precision = jax.lax.Precision.HIGHEST

    @classmethod
    def f32(cls) -> "Precision":
        return cls(jnp.float32, jax.lax.Precision.HIGHEST)

    @classmethod
    def bf16(cls) -> "Precision":
        return cls(jnp.bfloat16, jax.lax.Precision.DEFAULT)


# --------------------------------------------------------------------------
# initialisers
# --------------------------------------------------------------------------


def trunc_normal(rng: jax.Array, shape, stddev: float = 0.02) -> jax.Array:
    """tf.truncated_normal_initializer: normal truncated at 2 sigma."""
    return stddev * jax.random.truncated_normal(rng, -2.0, 2.0, shape, jnp.float32)


def dense_init(rng, d_in: int, d_out: int, stddev: float = 0.02) -> Params:
    return {
        "kernel": trunc_normal(rng, (d_in, d_out), stddev),
        "bias": jnp.zeros((d_out,), jnp.float32),
    }


def layer_norm_init(dim: int) -> Params:
    return {"gamma": jnp.ones((dim,), jnp.float32), "beta": jnp.zeros((dim,), jnp.float32)}


# --------------------------------------------------------------------------
# primitive apply fns
# --------------------------------------------------------------------------


def dense(p: Params, x: jax.Array, prec: Precision) -> jax.Array:
    if "kernel_q8" in p:  # int8 serving path (ops/quant.py)
        from ..ops.quant import dense_q8

        return dense_q8(p, x)
    y = jnp.dot(
        x.astype(prec.compute_dtype),
        p["kernel"].astype(prec.compute_dtype),
        preferred_element_type=jnp.float32,
        precision=prec.matmul,
    )
    return y + p["bias"].astype(jnp.float32)


def layer_norm(p: Params, x: jax.Array, eps: float = 1e-12, out_dtype=None) -> jax.Array:
    """LayerNorm with float32 internals; optionally emits a narrower dtype.

    In bf16 mode the residual stream is carried in bf16 (halving activation
    HBM traffic) while mean/var/scale math stays float32.
    """
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["gamma"] + p["beta"]
    return y if out_dtype is None else y.astype(out_dtype)


def dropout(x: jax.Array, rate: float, rng: jax.Array | None) -> jax.Array:
    if rate <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


# --------------------------------------------------------------------------
# attention block (BERT self/cross attention + output projection + LN)
# --------------------------------------------------------------------------


def attention_block_init(rng, cfg: BertConfig, ctx_dim: int | None = None) -> Params:
    h = cfg.hidden_size
    ctx = ctx_dim or h
    ks = jax.random.split(rng, 4)
    return {
        "query": dense_init(ks[0], h, h, cfg.initializer_range),
        "key": dense_init(ks[1], ctx, h, cfg.initializer_range),
        "value": dense_init(ks[2], ctx, h, cfg.initializer_range),
        "output": {
            "dense": dense_init(ks[3], h, h, cfg.initializer_range),
            "LayerNorm": layer_norm_init(h),
        },
    }


def attention_block(
    p: Params,
    x: jax.Array,
    ctx: jax.Array,
    bias: jax.Array | None,
    cfg: BertConfig,
    prec: Precision,
    dropout_rngs: tuple | None = None,
) -> jax.Array:
    """Attend from x to ctx; project; residual + LN (post-LN BERT)."""
    n = cfg.num_attention_heads
    attn_rng, hid_rng = dropout_rngs if dropout_rngs else (None, None)
    if (
        attn_rng is not None
        and x is ctx
        and "kernel" in p["query"]
        and (
            bias is None
            or (bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1)
        )
    ):
        from ..ops.pallas_train import (
            attention_block_train,
            resolve_train_block,
            seed_from_key,
            train_fused_mode,
        )

        mode = train_fused_mode()
        if mode != "off":
            # fused custom-VJP training block: in-kernel dropout, Pallas
            # fwd+bwd, XLA weight-grad matmuls (ops/pallas_train.py)
            qkv_kernel = jnp.concatenate(
                [p["query"]["kernel"], p["key"]["kernel"], p["value"]["kernel"]],
                axis=1,
            )
            qkv_bias = jnp.concatenate(
                [p["query"]["bias"], p["key"]["bias"], p["value"]["bias"]]
            )
            b, s, _ = x.shape
            return attention_block_train(
                x.astype(prec.compute_dtype),
                qkv_kernel,
                qkv_bias,
                p["output"]["dense"]["kernel"],
                p["output"]["dense"]["bias"],
                p["output"]["LayerNorm"]["gamma"],
                p["output"]["LayerNorm"]["beta"],
                n,
                seed_from_key(attn_rng),
                bias=None if bias is None else bias.reshape(b, s),
                attn_dropout_rate=cfg.attention_probs_dropout_prob,
                hidden_dropout_rate=cfg.hidden_dropout_prob,
                block_b=resolve_train_block("attn", cfg),
                interpret=(mode == "interpret"),
            )
    if (
        attn_rng is not None
        and x is not ctx
        and x.shape[-1] == ctx.shape[-1]
        and "kernel" in p["query"]
        and (
            bias is None
            or (bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1)
        )
    ):
        from ..ops.pallas_train import (
            cross_attention_block_train,
            resolve_train_block,
            seed_from_key,
            train_fused_mode,
        )

        mode = train_fused_mode()
        if mode != "off":
            # fused custom-VJP cross-attention training block (LXMERT
            # x-layers: ops/pallas_train.py)
            wkv = jnp.concatenate(
                [p["key"]["kernel"], p["value"]["kernel"]], axis=1
            )
            bkv = jnp.concatenate([p["key"]["bias"], p["value"]["bias"]])
            b, t = ctx.shape[0], ctx.shape[1]
            return cross_attention_block_train(
                x.astype(prec.compute_dtype),
                ctx.astype(prec.compute_dtype),
                p["query"]["kernel"],
                p["query"]["bias"],
                wkv,
                bkv,
                p["output"]["dense"]["kernel"],
                p["output"]["dense"]["bias"],
                p["output"]["LayerNorm"]["gamma"],
                p["output"]["LayerNorm"]["beta"],
                n,
                seed_from_key(attn_rng),
                bias=None if bias is None else bias.reshape(b, t),
                attn_dropout_rate=cfg.attention_probs_dropout_prob,
                hidden_dropout_rate=cfg.hidden_dropout_prob,
                block_b=resolve_train_block("attn", cfg),
                interpret=(mode == "interpret"),
            )
    if (
        packed_attention_active()
        and attn_rng is None
        and hid_rng is None
        and "kernel" in p["query"]  # int8 param dicts use the unfused path
    ):
        # packed path: q/k/v stay [B, S, H]; kernels slice heads along
        # 64-aligned lanes, so no head transposes touch HBM
        if x is ctx and "kernel" in p["query"]:
            # whole self-attention block in one VMEM-resident kernel
            from ..ops.pallas_attention import attention_block_pallas

            qkv_kernel = jnp.concatenate(
                [p["query"]["kernel"], p["key"]["kernel"], p["value"]["kernel"]],
                axis=1,
            )
            qkv_bias = jnp.concatenate(
                [p["query"]["bias"], p["key"]["bias"], p["value"]["bias"]]
            )
            return attention_block_pallas(
                x.astype(prec.compute_dtype),
                qkv_kernel,
                qkv_bias,
                p["output"]["dense"]["kernel"],
                p["output"]["dense"]["bias"],
                p["output"]["LayerNorm"]["gamma"],
                p["output"]["LayerNorm"]["beta"],
                n,
                bias,
            )
        # cross-attention (LXMERT x-layers, F may differ from T): fused
        # cross-attention block kernel
        from ..ops.pallas_attention import cross_attention_block_pallas

        wkv = jnp.concatenate([p["key"]["kernel"], p["value"]["kernel"]], axis=1)
        bkv = jnp.concatenate([p["key"]["bias"], p["value"]["bias"]])
        return cross_attention_block_pallas(
            x.astype(prec.compute_dtype),
            ctx.astype(prec.compute_dtype),
            p["query"]["kernel"],
            p["query"]["bias"],
            wkv,
            bkv,
            p["output"]["dense"]["kernel"],
            p["output"]["dense"]["bias"],
            p["output"]["LayerNorm"]["gamma"],
            p["output"]["LayerNorm"]["beta"],
            n,
            bias,
        )
    if x is ctx and "kernel" in p["query"]:
        # self-attention: one fused [H, 3H] projection instead of three
        qkv_kernel = jnp.concatenate(
            [p["query"]["kernel"], p["key"]["kernel"], p["value"]["kernel"]], axis=1
        )
        qkv_bias = jnp.concatenate(
            [p["query"]["bias"], p["key"]["bias"], p["value"]["bias"]]
        )
        qkv = dense({"kernel": qkv_kernel, "bias": qkv_bias}, x, prec)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = split_heads(q, n), split_heads(k, n), split_heads(v, n)
    else:
        q = split_heads(dense(p["query"], x, prec), n)
        k = split_heads(dense(p["key"], ctx, prec), n)
        v = split_heads(dense(p["value"], ctx, prec), n)
    o = mha(
        q.astype(prec.compute_dtype),
        k.astype(prec.compute_dtype),
        v.astype(prec.compute_dtype),
        bias,
        dropout_rate=cfg.attention_probs_dropout_prob if attn_rng is not None else 0.0,
        dropout_rng=attn_rng,
        precision=prec.matmul,
    )
    o = dense(p["output"]["dense"], merge_heads(o), prec)
    o = dropout(o, cfg.hidden_dropout_prob if hid_rng is not None else 0.0, hid_rng)
    return layer_norm(
        p["output"]["LayerNorm"], o + x.astype(jnp.float32),
        out_dtype=prec.compute_dtype,
    )


def dual_cross_attention_blocks(
    p: Params,
    l: jax.Array,
    v: jax.Array,
    lang_bias: jax.Array | None,
    visn_bias: jax.Array | None,
    cfg: BertConfig,
    prec: Precision,
    l_rngs: tuple | None = None,
    v_rngs: tuple | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Both shared-weight cross directions of an LXMERT x-layer
    (``lxmert/src/lxrt/modeling.py:460-464`` applies ONE visual_attention
    module lang<-visn and visn<-lang). ``KMR_DUAL_CROSS=1`` fuses the two
    directions into one kernel launch on the packed inference backend (each
    stream read from HBM once instead of twice); default is the two
    attention_block calls -- the fused launch measured 0.8% SLOWER
    whole-model on v5e (docs/BENCH.md round-3 fusion table), the halved
    stream reads don't pay for the deeper per-step VMEM working set."""

    def _compact(b):
        return b is None or (b.ndim == 4 and b.shape[1] == 1 and b.shape[2] == 1)

    import os

    if (
        packed_attention_active()
        and os.environ.get("KMR_DUAL_CROSS", "0") == "1"
        and l_rngs is None
        and v_rngs is None
        and "kernel" in p["query"]
        and _compact(lang_bias)
        and _compact(visn_bias)
        and (lang_bias is None) == (visn_bias is None)
    ):
        from ..ops.pallas_attention import dual_cross_attention_block_pallas

        wkv = jnp.concatenate([p["key"]["kernel"], p["value"]["kernel"]], axis=1)
        bkv = jnp.concatenate([p["key"]["bias"], p["value"]["bias"]])
        b = l.shape[0]
        return dual_cross_attention_block_pallas(
            l.astype(prec.compute_dtype),
            v.astype(prec.compute_dtype),
            p["query"]["kernel"],
            p["query"]["bias"],
            wkv,
            bkv,
            p["output"]["dense"]["kernel"],
            p["output"]["dense"]["bias"],
            p["output"]["LayerNorm"]["gamma"],
            p["output"]["LayerNorm"]["beta"],
            cfg.num_attention_heads,
            lang_bias=None if lang_bias is None else lang_bias.reshape(b, l.shape[1]),
            visn_bias=None if visn_bias is None else visn_bias.reshape(b, v.shape[1]),
        )
    return (
        attention_block(p, l, v, visn_bias, cfg, prec, l_rngs),
        attention_block(p, v, l, lang_bias, cfg, prec, v_rngs),
    )


# --------------------------------------------------------------------------
# feed-forward block
# --------------------------------------------------------------------------


def ffn_init(rng, cfg: BertConfig) -> Params:
    k1, k2 = jax.random.split(rng)
    return {
        "intermediate": dense_init(k1, cfg.hidden_size, cfg.intermediate_size, cfg.initializer_range),
        "output": {
            "dense": dense_init(k2, cfg.intermediate_size, cfg.hidden_size, cfg.initializer_range),
            "LayerNorm": layer_norm_init(cfg.hidden_size),
        },
    }


def ffn_block(
    p: Params,
    x: jax.Array,
    cfg: BertConfig,
    prec: Precision,
    act: str | None = None,
    hid_rng: jax.Array | None = None,
) -> jax.Array:
    act_name = act or cfg.hidden_act
    if (
        hid_rng is not None
        and "kernel" in p["intermediate"]
        and act_name in ("gelu", "gelu_erf")
        and x.ndim == 3
    ):
        from ..ops.pallas_train import (
            ffn_block_train,
            resolve_train_block,
            seed_from_key,
            train_fused_mode,
        )

        mode = train_fused_mode()
        if mode != "off":
            return ffn_block_train(
                x.astype(prec.compute_dtype),
                p["intermediate"]["kernel"],
                p["intermediate"]["bias"],
                p["output"]["dense"]["kernel"],
                p["output"]["dense"]["bias"],
                p["output"]["LayerNorm"]["gamma"],
                p["output"]["LayerNorm"]["beta"],
                seed_from_key(hid_rng),
                dropout_rate=cfg.hidden_dropout_prob,
                approximate_gelu=(act_name == "gelu"),
                block_b=resolve_train_block("ffn", cfg),
                interpret=(mode == "interpret"),
            )
    if (
        packed_attention_active()
        and hid_rng is None
        and "kernel" in p["intermediate"]
        and act_name in ("gelu", "gelu_erf")
        and x.ndim == 3
    ):
        from ..ops.pallas_ffn import ffn_block_pallas

        return ffn_block_pallas(
            x.astype(prec.compute_dtype),
            p["intermediate"]["kernel"],
            p["intermediate"]["bias"],
            p["output"]["dense"]["kernel"],
            p["output"]["dense"]["bias"],
            p["output"]["LayerNorm"]["gamma"],
            p["output"]["LayerNorm"]["beta"],
            approximate_gelu=(act_name == "gelu"),
        )
    act_fn = ACTIVATIONS[act_name]
    h = act_fn(dense(p["intermediate"], x, prec)).astype(prec.compute_dtype)
    h = dense(p["output"]["dense"], h, prec)
    h = dropout(h, cfg.hidden_dropout_prob if hid_rng is not None else 0.0, hid_rng)
    return layer_norm(
        p["output"]["LayerNorm"], h + x.astype(jnp.float32),
        out_dtype=prec.compute_dtype,
    )


# --------------------------------------------------------------------------
# encoder stack (scan over stacked layer params)
# --------------------------------------------------------------------------


def bias_compact(bias) -> bool:
    """True for the [B, 1, 1, S] additive key-mask layout the fused kernels
    accept (or no bias at all)."""
    return bias is None or (
        bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1
    )


def train_blocks_fused(att_p: Params, ffn_p: Params, bias, act_name: str) -> bool:
    """True iff attention_block AND ffn_block will take the fused custom-VJP
    train path for these (params, bias, act) -- the mirror of their gating
    above. encoder() / lxmert._scan_stack use this to decide per-layer
    remat: remat is REQUIRED on the XLA fallback (~40G HBM otherwise) and
    HARMFUL on the fused path (every forward kernel would run twice), so
    the decision must track the actual block path, not train_fused_mode()
    alone."""
    from ..ops.pallas_train import train_fused_mode

    if train_fused_mode() == "off":
        return False
    return (
        bias_compact(bias)
        and "kernel" in att_p["query"]
        and "kernel" in ffn_p["intermediate"]
        and act_name in ("gelu", "gelu_erf")
    )


def encoder_layer_init(rng, cfg: BertConfig) -> Params:
    k1, k2 = jax.random.split(rng)
    return {"attention": attention_block_init(k1, cfg), "ffn": ffn_init(k2, cfg)}


def encoder_init(rng, cfg: BertConfig, num_layers: int | None = None) -> Params:
    """Stacked per-layer params: every leaf gets a leading [L] axis."""
    n = num_layers or cfg.num_hidden_layers
    layers = [encoder_layer_init(k, cfg) for k in jax.random.split(rng, n)]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers)


def fused_encoder_layer(
    att_p: Params,
    ffn_p: Params,
    x: jax.Array,
    bias: jax.Array | None,
    cfg: BertConfig,
    prec: Precision,
    act: str | None = None,
) -> jax.Array | None:
    """Whole layer (self-attn block + FFN block) in ONE kernel launch when
    ``KMR_FUSED_LAYER=1`` and the packed inference backend is active; None ->
    caller falls back to the two-kernel path (the default: whole-model the
    fused launch measured 1.4-6.4% SLOWER on v5e -- the FFN half runs at
    81% MFU with its own block size and double-buffering depth, and fusing
    drags it down to the attention half's constraints; docs/BENCH.md)."""
    import os

    act_name = act or cfg.hidden_act
    if not (
        packed_attention_active()
        and os.environ.get("KMR_FUSED_LAYER", "0") == "1"
        and "kernel" in att_p["query"]
        and "kernel" in ffn_p["intermediate"]
        and act_name in ("gelu", "gelu_erf")
        and x.ndim == 3
        and (
            bias is None
            or (bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1)
        )
    ):
        return None
    from ..ops.pallas_layer import encoder_layer_pallas

    qkv_kernel = jnp.concatenate(
        [att_p["query"]["kernel"], att_p["key"]["kernel"], att_p["value"]["kernel"]],
        axis=1,
    )
    qkv_bias = jnp.concatenate(
        [att_p["query"]["bias"], att_p["key"]["bias"], att_p["value"]["bias"]]
    )
    return encoder_layer_pallas(
        x.astype(prec.compute_dtype),
        qkv_kernel,
        qkv_bias,
        att_p["output"]["dense"]["kernel"],
        att_p["output"]["dense"]["bias"],
        att_p["output"]["LayerNorm"]["gamma"],
        att_p["output"]["LayerNorm"]["beta"],
        ffn_p["intermediate"]["kernel"],
        ffn_p["intermediate"]["bias"],
        ffn_p["output"]["dense"]["kernel"],
        ffn_p["output"]["dense"]["bias"],
        ffn_p["output"]["LayerNorm"]["gamma"],
        ffn_p["output"]["LayerNorm"]["beta"],
        cfg.num_attention_heads,
        bias,
        approximate_gelu=(act_name == "gelu"),
    )


def encoder_layer(
    p: Params,
    x: jax.Array,
    bias: jax.Array | None,
    cfg: BertConfig,
    prec: Precision,
    act: str | None = None,
    rngs: tuple | None = None,
) -> jax.Array:
    a_rngs = rngs[:2] if rngs else None
    f_rng = rngs[2] if rngs else None
    if rngs is None:
        fused = fused_encoder_layer(p["attention"], p["ffn"], x, bias, cfg, prec, act)
        if fused is not None:
            return fused
    x = attention_block(p["attention"], x, x, bias, cfg, prec, a_rngs)
    return ffn_block(p["ffn"], x, cfg, prec, act=act, hid_rng=f_rng)


def encoder(
    p: Params,
    x: jax.Array,
    bias: jax.Array | None,
    cfg: BertConfig,
    prec: Precision,
    act: str | None = None,
    rng: jax.Array | None = None,
) -> jax.Array:
    num_layers = jax.tree.leaves(p)[0].shape[0]

    def body(carry, inp):
        h, r = carry
        layer_p = inp
        if r is not None:
            r, step = jax.random.split(r)
            rngs = tuple(jax.random.split(step, 3))
        else:
            rngs = None
        h = encoder_layer(layer_p, h, bias, cfg, prec, act=act, rngs=rngs)
        return (h, r), None

    # remat per layer on the XLA training path: without it the backward
    # saves every scan-stacked intermediate ([L, B, S, 4H] GELU inputs
    # etc.) -- a 1024-pair train step needs 40G HBM on a 15.75G chip.
    # jax.checkpoint is free on the pure forward (no transform -> no
    # recompute). The fused train path (ops/pallas_train.py) skips it: the
    # custom-VJP blocks recompute their own intermediates in VMEM, so the
    # only per-layer residuals are the [B, S, H] block inputs, and an
    # outer remat would just run every forward kernel twice. The decision
    # tracks whether the blocks WILL fuse (train_blocks_fused), not just
    # train_fused_mode(): a config the per-block gates reject (exotic act,
    # non-compact bias, int8 param dicts) falls back to XLA blocks and
    # must keep its remat.
    if rng is not None:
        if not train_blocks_fused(
            p["attention"], p["ffn"], bias, act or cfg.hidden_act
        ):
            body = jax.checkpoint(body)
    else:
        body = jax.checkpoint(body)

    (x, _), _ = jax.lax.scan(body, (x.astype(prec.compute_dtype), rng), p, length=num_layers)
    return x


# --------------------------------------------------------------------------
# embeddings & pooler
# --------------------------------------------------------------------------


def embeddings_init(rng, cfg: BertConfig) -> Params:
    ks = jax.random.split(rng, 3)
    return {
        "word_embeddings": trunc_normal(
            ks[0], (cfg.vocab_size, cfg.hidden_size), cfg.initializer_range
        ),
        "token_type_embeddings": trunc_normal(
            ks[1], (cfg.type_vocab_size, cfg.hidden_size), cfg.initializer_range
        ),
        "position_embeddings": trunc_normal(
            ks[2], (cfg.max_position_embeddings, cfg.hidden_size), cfg.initializer_range
        ),
        "LayerNorm": layer_norm_init(cfg.hidden_size),
    }


def pooler_init(rng, cfg: BertConfig) -> Params:
    return {"dense": dense_init(rng, cfg.hidden_size, cfg.hidden_size, cfg.initializer_range)}


def pooler(p: Params, seq: jax.Array, prec: Precision) -> jax.Array:
    """tanh(dense(first token)) -- pixelmodel.py:262-270."""
    return jnp.tanh(dense(p["dense"], seq[:, 0, :], prec))


def num_params(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
