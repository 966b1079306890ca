"""Pallas fused attention vs the XLA reference (interpreter mode on CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.attention import mha_xla
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.pallas_attention import (
    mha_pallas,
)


@pytest.mark.parametrize("seq", [30, 40])
@pytest.mark.parametrize("with_bias", [False, True])
def test_pallas_matches_xla(seq, with_bias):
    b, n, dh = 4, 4, 32
    ks = jax.random.split(jax.random.key(0), 4)
    q = jax.random.normal(ks[0], (b, n, seq, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, n, seq, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, n, seq, dh), jnp.float32)
    bias = None
    if with_bias:
        mask = (jax.random.uniform(ks[3], (b, 1, 1, seq)) > 0.3).astype(jnp.float32)
        bias = (1.0 - mask) * -10000.0
    ref = mha_xla(q, k, v, bias)
    got = mha_pallas(q, k, v, bias, block_bn=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_pallas_ragged_batch_blocks():
    # b*n not divisible by block: grid must cover the remainder
    b, n, seq, dh = 3, 2, 30, 16
    ks = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(ks[0], (b, n, seq, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, n, seq, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, n, seq, dh), jnp.float32)
    ref = mha_xla(q, k, v, None)
    got = mha_pallas(q, k, v, None, block_bn=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("with_bias", [False, True])
def test_packed_matches_xla(with_bias):
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.attention import (
        split_heads,
        merge_heads,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.pallas_attention import (
        mha_pallas_packed,
    )

    b, s, h, n = 5, 40, 128, 4
    ks = jax.random.split(jax.random.key(2), 4)
    q = jax.random.normal(ks[0], (b, s, h), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, h), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, h), jnp.float32)
    bias = None
    if with_bias:
        mask = (jax.random.uniform(ks[3], (b, 1, 1, s)) > 0.3).astype(jnp.float32)
        bias = (1.0 - mask) * -10000.0
    ref = merge_heads(mha_xla(split_heads(q, n), split_heads(k, n), split_heads(v, n), bias))
    got = mha_pallas_packed(q, k, v, n, bias, block_b=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.fixture
def ffn_fold_enabled(monkeypatch):
    """Force the (default-off) 128-row fold on, resetting its cache around
    the test so the patched threshold can't leak."""
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops import pallas_ffn

    monkeypatch.setenv("KMR_FFN_FOLD_MIN_WASTE", "0.1")
    pallas_ffn._fold_min_waste.cache_clear()
    yield
    pallas_ffn._fold_min_waste.cache_clear()


@pytest.mark.parametrize("b,s", [(5, 40), (16, 8), (32, 12)])
def test_ffn_pallas_matches_reference(b, s, ffn_fold_enabled):
    # (16, 8) and (32, 12) hit the lane-tile flat layout ((b*s) % 128 == 0,
    # forced on via the env threshold); (5, 40) keeps [B, S, H] blocking
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.pallas_ffn import (
        ffn_block_pallas,
    )

    h, inter = 64, 96
    ks = jax.random.split(jax.random.key(3), 6)
    x = jax.random.normal(ks[0], (b, s, h), jnp.float32)
    w1 = 0.1 * jax.random.normal(ks[1], (h, inter), jnp.float32)
    b1 = 0.1 * jax.random.normal(ks[2], (inter,), jnp.float32)
    w2 = 0.1 * jax.random.normal(ks[3], (inter, h), jnp.float32)
    b2 = 0.1 * jax.random.normal(ks[4], (h,), jnp.float32)
    gamma = 1.0 + 0.1 * jax.random.normal(ks[5], (h,), jnp.float32)
    beta = jnp.zeros((h,))

    def ref(x):
        hmid = jax.nn.gelu(x @ w1 + b1, approximate=True)
        y = hmid @ w2 + b2 + x
        mean = y.mean(-1, keepdims=True)
        var = ((y - mean) ** 2).mean(-1, keepdims=True)
        return (y - mean) * jax.lax.rsqrt(var + 1e-12) * gamma + beta

    got = ffn_block_pallas(x, w1, b1, w2, b2, gamma, beta, block_b=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(x)), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("variant", ["loop", "headmajor", "headpack"])
@pytest.mark.parametrize("with_bias", [False, True])
def test_fused_attention_block_matches_unfused(with_bias, variant):
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models.core import (
        BertConfig,
        Precision,
        attention_block,
        attention_block_init,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.pallas_attention import (
        attention_block_pallas,
    )

    cfg = BertConfig(vocab_size=50, hidden_size=64, num_hidden_layers=1,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64)
    p = attention_block_init(jax.random.key(0), cfg)
    b, s = 5, 30
    ks = jax.random.split(jax.random.key(1), 2)
    x = jax.random.normal(ks[0], (b, s, cfg.hidden_size), jnp.float32)
    bias = None
    if with_bias:
        mask = (jax.random.uniform(ks[1], (b, 1, 1, s)) > 0.3).astype(jnp.float32)
        bias = (1.0 - mask) * -10000.0
    ref = attention_block(p, x, x, bias, cfg, Precision.f32())
    wqkv = jnp.concatenate([p["query"]["kernel"], p["key"]["kernel"], p["value"]["kernel"]], axis=1)
    bqkv = jnp.concatenate([p["query"]["bias"], p["key"]["bias"], p["value"]["bias"]])
    got = attention_block_pallas(
        x, wqkv, bqkv, p["output"]["dense"]["kernel"], p["output"]["dense"]["bias"],
        p["output"]["LayerNorm"]["gamma"], p["output"]["LayerNorm"]["beta"],
        cfg.num_attention_heads, bias, block_b=2, variant=variant, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-3)


def test_ffn_pallas_erf_gelu_matches():
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.pallas_ffn import (
        ffn_block_pallas,
    )

    b, s, h, inter = 3, 10, 32, 48
    ks = jax.random.split(jax.random.key(4), 6)
    x = jax.random.normal(ks[0], (b, s, h), jnp.float32)
    w1 = 0.2 * jax.random.normal(ks[1], (h, inter), jnp.float32)
    b1 = jnp.zeros((inter,))
    w2 = 0.2 * jax.random.normal(ks[2], (inter, h), jnp.float32)
    b2 = jnp.zeros((h,))
    gamma = jnp.ones((h,))
    beta = jnp.zeros((h,))

    def ref(x):
        hmid = jax.nn.gelu(x @ w1 + b1, approximate=False)
        y = hmid @ w2 + b2 + x
        mean = y.mean(-1, keepdims=True)
        var = ((y - mean) ** 2).mean(-1, keepdims=True)
        return (y - mean) * jax.lax.rsqrt(var + 1e-12) * gamma + beta

    got = ffn_block_pallas(
        x, w1, b1, w2, b2, gamma, beta,
        approximate_gelu=False, block_b=1, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(x)), atol=5e-5, rtol=1e-3)


@pytest.mark.parametrize("variant", ["loop", "headpack"])
@pytest.mark.parametrize("with_bias", [False, True])
def test_fused_cross_attention_block_matches_unfused(with_bias, variant):
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models.core import (
        BertConfig,
        Precision,
        attention_block,
        attention_block_init,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.pallas_attention import (
        cross_attention_block_pallas,
    )

    cfg = BertConfig(vocab_size=50, hidden_size=64, num_hidden_layers=1,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64)
    p = attention_block_init(jax.random.key(5), cfg)
    b, f, t = 4, 23, 10
    ks = jax.random.split(jax.random.key(6), 3)
    x = jax.random.normal(ks[0], (b, f, cfg.hidden_size), jnp.float32)
    ctx = jax.random.normal(ks[1], (b, t, cfg.hidden_size), jnp.float32)
    bias = None
    if with_bias:
        mask = (jax.random.uniform(ks[2], (b, 1, 1, t)) > 0.3).astype(jnp.float32)
        bias = (1.0 - mask) * -10000.0
    ref = attention_block(p, x, ctx, bias, cfg, Precision.f32())
    wkv = jnp.concatenate([p["key"]["kernel"], p["value"]["kernel"]], axis=1)
    bkv = jnp.concatenate([p["key"]["bias"], p["value"]["bias"]])
    got = cross_attention_block_pallas(
        x, ctx, p["query"]["kernel"], p["query"]["bias"], wkv, bkv,
        p["output"]["dense"]["kernel"], p["output"]["dense"]["bias"],
        p["output"]["LayerNorm"]["gamma"], p["output"]["LayerNorm"]["beta"],
        cfg.num_attention_heads, bias, block_b=2, variant=variant, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-3)


@pytest.mark.parametrize("variant", ["loop", "headpack"])
@pytest.mark.parametrize("with_bias", [False, True])
def test_dual_cross_attention_block_matches_two_unfused(with_bias, variant):
    """One dual-direction launch == two shared-weight attention_blocks
    (the LXMERT x-layer cross pair, modeling.py:460-464)."""
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models.core import (
        BertConfig,
        Precision,
        attention_block,
        attention_block_init,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.pallas_attention import (
        dual_cross_attention_block_pallas,
    )

    cfg = BertConfig(vocab_size=50, hidden_size=64, num_hidden_layers=1,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64)
    p = attention_block_init(jax.random.key(7), cfg)
    b, f, t = 4, 23, 10
    ks = jax.random.split(jax.random.key(8), 4)
    lang = jax.random.normal(ks[0], (b, f, cfg.hidden_size), jnp.float32)
    visn = jax.random.normal(ks[1], (b, t, cfg.hidden_size), jnp.float32)
    lbias = vbias = None
    if with_bias:
        lmask = (jax.random.uniform(ks[2], (b, 1, 1, f)) > 0.3).astype(jnp.float32)
        vmask = (jax.random.uniform(ks[3], (b, 1, 1, t)) > 0.3).astype(jnp.float32)
        lbias = (1.0 - lmask) * -10000.0
        vbias = (1.0 - vmask) * -10000.0
    prec = Precision.f32()
    ref_l = attention_block(p, lang, visn, vbias, cfg, prec)
    ref_v = attention_block(p, visn, lang, lbias, cfg, prec)
    wkv = jnp.concatenate([p["key"]["kernel"], p["value"]["kernel"]], axis=1)
    bkv = jnp.concatenate([p["key"]["bias"], p["value"]["bias"]])
    got_l, got_v = dual_cross_attention_block_pallas(
        lang, visn, p["query"]["kernel"], p["query"]["bias"], wkv, bkv,
        p["output"]["dense"]["kernel"], p["output"]["dense"]["bias"],
        p["output"]["LayerNorm"]["gamma"], p["output"]["LayerNorm"]["beta"],
        cfg.num_attention_heads,
        lang_bias=None if lbias is None else lbias.reshape(b, f),
        visn_bias=None if vbias is None else vbias.reshape(b, t),
        block_b=2, variant=variant, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(ref_l), atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v), atol=5e-5, rtol=1e-3)


def test_packed_softmax_extreme_spread_no_nan():
    """The global-max stabiliser underflows whole segments when one head's
    scores dwarf another's (> ~88 apart in f32): the clamped denominator
    must yield finite probs (0 for the dead segment) instead of the 0/0
    NaN that contaminated every packed head through the 0*NaN PV matmul
    (found on-device with synthetic std-normal weights, scores ~ +-3700)."""
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.pallas_attention import (
        packed_heads_attention,
        packed_softmax,
    )

    g, t, block, f = 2, 8, 2, 4
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.standard_normal((block, f, g * t)), jnp.float32)
    # head 0's segment sits 1000 above head 1's -> head 1 fully underflows
    scores = scores + jnp.concatenate(
        [jnp.full((block, f, t), 1000.0), jnp.zeros((block, f, t))], axis=-1
    )
    probs = packed_softmax(scores, g, t)
    assert bool(jnp.all(jnp.isfinite(probs)))
    # live segment still an exact softmax; dead segment clamps to 0
    ref = jax.nn.softmax(scores[..., :t], axis=-1)
    np.testing.assert_allclose(np.asarray(probs[..., :t]), np.asarray(ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(probs[..., t:]), 0.0, atol=1e-25)

    # end-to-end: huge-magnitude q/k must not NaN any head's context
    n, dh = 4, 16
    h = n * dh
    q = jnp.asarray(100.0 * rng.standard_normal((block, f, h)), jnp.float32)
    k = jnp.asarray(100.0 * rng.standard_normal((block, t, h)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((block, t, h)), jnp.float32)
    ctx = packed_heads_attention(q, k, v, None, n, 1.0 / (dh**0.5), jnp.float32)
    assert bool(jnp.all(jnp.isfinite(ctx)))


def test_headpack_group_selection():
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.pallas_attention import (
        headpack_group,
    )

    assert headpack_group(12, 32) == 4  # 4*32 = 128 exactly
    assert headpack_group(12, 30) == 4
    assert headpack_group(12, 40) == 3  # 3*40 = 120
    assert headpack_group(12, 23) == 4  # 5 doesn't divide 12
    assert headpack_group(12, 10) == 12  # all heads in one pack
    assert headpack_group(12, 129) == 1
