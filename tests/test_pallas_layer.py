"""Fused encoder-layer kernel (self-attn block + FFN block in one launch)
vs the two-kernel reference path, in Pallas interpreter mode on CPU.

Reference behavior: one BertLayer = attention + intermediate + output
(`/root/reference/code/imagebert_lds/src/pixelmodel.py` TF,
`lxmert/src/lxrt/modeling.py:407-427` torch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models.core import (
    BertConfig,
    Precision,
    attention_block,
    encoder_layer_init,
    ffn_block,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.pallas_layer import (
    encoder_layer_pallas,
)


def _cfg(act="gelu"):
    return BertConfig(
        vocab_size=50,
        hidden_size=64,
        num_hidden_layers=1,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=64,
        hidden_act=act,
    )


@pytest.mark.parametrize("variant", ["loop", "headpack"])
@pytest.mark.parametrize("with_bias", [False, True])
@pytest.mark.parametrize("act", ["gelu", "gelu_erf"])
def test_fused_encoder_layer_matches_two_blocks(with_bias, variant, act):
    cfg = _cfg(act)
    p = encoder_layer_init(jax.random.key(3), cfg)
    b, s = 4, 12
    ks = jax.random.split(jax.random.key(4), 2)
    x = jax.random.normal(ks[0], (b, s, cfg.hidden_size), jnp.float32)
    bias = None
    if with_bias:
        mask = (jax.random.uniform(ks[1], (b, 1, 1, s)) > 0.3).astype(jnp.float32)
        bias = (1.0 - mask) * -10000.0
    prec = Precision.f32()
    ref = ffn_block(
        p["ffn"],
        attention_block(p["attention"], x, x, bias, cfg, prec),
        cfg,
        prec,
        act=act,
    )
    att, ffn = p["attention"], p["ffn"]
    qkv_kernel = jnp.concatenate(
        [att["query"]["kernel"], att["key"]["kernel"], att["value"]["kernel"]],
        axis=1,
    )
    qkv_bias = jnp.concatenate(
        [att["query"]["bias"], att["key"]["bias"], att["value"]["bias"]]
    )
    got = encoder_layer_pallas(
        x,
        qkv_kernel,
        qkv_bias,
        att["output"]["dense"]["kernel"],
        att["output"]["dense"]["bias"],
        att["output"]["LayerNorm"]["gamma"],
        att["output"]["LayerNorm"]["beta"],
        ffn["intermediate"]["kernel"],
        ffn["intermediate"]["bias"],
        ffn["output"]["dense"]["kernel"],
        ffn["output"]["dense"]["bias"],
        ffn["output"]["LayerNorm"]["gamma"],
        ffn["output"]["LayerNorm"]["beta"],
        cfg.num_attention_heads,
        bias,
        approximate_gelu=(act == "gelu"),
        block_b=2,
        variant=variant,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-3)


def test_fused_encoder_layer_ragged_batch():
    """B not divisible by block_b: the grid's last block is padded."""
    cfg = _cfg()
    p = encoder_layer_init(jax.random.key(5), cfg)
    b, s = 5, 8
    x = jax.random.normal(jax.random.key(6), (b, s, cfg.hidden_size), jnp.float32)
    prec = Precision.f32()
    ref = ffn_block(
        p["ffn"], attention_block(p["attention"], x, x, None, cfg, prec), cfg, prec
    )
    att, ffn = p["attention"], p["ffn"]
    qkv_kernel = jnp.concatenate(
        [att["query"]["kernel"], att["key"]["kernel"], att["value"]["kernel"]],
        axis=1,
    )
    qkv_bias = jnp.concatenate(
        [att["query"]["bias"], att["key"]["bias"], att["value"]["bias"]]
    )
    got = encoder_layer_pallas(
        x,
        qkv_kernel,
        qkv_bias,
        att["output"]["dense"]["kernel"],
        att["output"]["dense"]["bias"],
        att["output"]["LayerNorm"]["gamma"],
        att["output"]["LayerNorm"]["beta"],
        ffn["intermediate"]["kernel"],
        ffn["intermediate"]["bias"],
        ffn["output"]["dense"]["kernel"],
        ffn["output"]["dense"]["bias"],
        ffn["output"]["LayerNorm"]["gamma"],
        ffn["output"]["LayerNorm"]["beta"],
        cfg.num_attention_heads,
        None,
        block_b=2,
        variant="loop",
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-3)
