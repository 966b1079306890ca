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
