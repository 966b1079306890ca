"""Custom-VJP fused training blocks (ops/pallas_train.py), interpret mode.

Strategy: the kernels' interpret path draws dropout masks from the exported
counter-hash (`_hash_bits`), so a pure-jnp reference using the *same* masks
is differentiable with ``jax.grad`` -- giving an oracle for both values and
gradients, including through dropout. Shapes are tiny and f32 so CPU
interpret-mode comparisons are tight.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.pallas_train import (
    _hash_bits,
    attention_block_train,
    cross_attention_block_train,
    dropout_cutoff,
    ffn_block_train,
    gelu_fwd,
    seed_from_key,
)

B, S, H, N, I = 4, 8, 16, 4, 32
EPS = 1e-12


def _keep(seed_arr, draw, shape, rate):
    bits = _hash_bits(seed_arr[0], draw, shape)
    return bits >= jnp.uint32(dropout_cutoff(rate))


def _ln(z, gamma, beta):
    mean = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(z - mean), axis=-1, keepdims=True)
    return (z - mean) * jax.lax.rsqrt(var + EPS) * gamma + beta


def ref_ffn(x, w1, b1, w2, b2, gamma, beta, seed, rate, approx=True):
    b, s, h = x.shape
    x2d = x.reshape(b * s, h)
    u = x2d @ w1 + b1
    g = gelu_fwd(u, approx)
    hid = g @ w2 + b2
    if rate > 0:
        keep = _keep(seed, 0, hid.shape, rate)
        hid = jnp.where(keep, hid / (1.0 - rate), 0.0)
    return _ln(hid + x2d, gamma, beta).reshape(b, s, h)


def ref_attn(x, wqkv, bqkv, wo, bo, gamma, beta, seed, arate, hrate, bias=None):
    b, s, h = x.shape
    dh = h // N
    scale = 1.0 / (dh**0.5)
    x2d = x.reshape(b * s, h)
    qkv = (x2d @ wqkv + bqkv).reshape(b, s, 3 * h)
    outs = []
    for i in range(N):
        q = qkv[..., i * dh : (i + 1) * dh]
        k = qkv[..., h + i * dh : h + (i + 1) * dh]
        v = qkv[..., 2 * h + i * dh : 2 * h + (i + 1) * dh]
        scores = jnp.einsum("bfd,btd->bft", q, k) * scale
        if bias is not None:
            scores = scores + bias[:, None, :]
        probs = jax.nn.softmax(scores, axis=-1)
        if arate > 0:
            keep = _keep(seed, 1 + i, probs.shape, arate)
            probs = jnp.where(keep, probs / (1.0 - arate), 0.0)
        outs.append(jnp.einsum("bft,btd->bfd", probs, v))
    ctx = jnp.concatenate(outs, axis=-1).reshape(b * s, h)
    o = ctx @ wo + bo
    if hrate > 0:
        keep = _keep(seed, 0, o.shape, hrate)
        o = jnp.where(keep, o / (1.0 - hrate), 0.0)
    return _ln(o + x2d, gamma, beta).reshape(b, s, h)


@pytest.fixture(scope="module")
def ffn_args():
    r = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(r.standard_normal(s).astype(np.float32) * 0.3)
    return (
        f(B, S, H), f(H, I), f(I), f(I, H), f(H),
        1.0 + 0.1 * f(H), 0.1 * f(H), jnp.array([12345], jnp.int32),
    )


@pytest.fixture(scope="module")
def attn_args():
    r = np.random.default_rng(1)
    f = lambda *s: jnp.asarray(r.standard_normal(s).astype(np.float32) * 0.3)
    bias = jnp.where(jnp.arange(S)[None, :] < 5, 0.0, -10000.0) * jnp.ones((B, 1))
    return (
        f(B, S, H), f(H, 3 * H), f(3 * H), f(H, H), f(H),
        1.0 + 0.1 * f(H), 0.1 * f(H), jnp.array([777], jnp.int32), bias,
    )


@pytest.mark.parametrize("rate", [0.0, 0.25])
@pytest.mark.parametrize("approx", [True, False])
def test_ffn_train_fwd_matches_reference(ffn_args, rate, approx):
    got = ffn_block_train(
        *ffn_args, dropout_rate=rate, approximate_gelu=approx,
        block_b=B, interpret=True,
    )
    want = ref_ffn(*ffn_args, rate=rate, approx=approx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("rate", [0.0, 0.25])
def test_ffn_train_grads_match_reference(ffn_args, rate):
    x, w1, b1, w2, b2, gamma, beta, seed = ffn_args
    cvec = jnp.asarray(
        np.random.default_rng(9).standard_normal((B, S, H)).astype(np.float32)
    )

    def loss_fused(x, w1, b1, w2, b2, gamma, beta):
        y = ffn_block_train(
            x, w1, b1, w2, b2, gamma, beta, seed,
            dropout_rate=rate, block_b=B, interpret=True,
        )
        return jnp.sum(y * cvec)

    def loss_ref(x, w1, b1, w2, b2, gamma, beta):
        return jnp.sum(ref_ffn(x, w1, b1, w2, b2, gamma, beta, seed, rate) * cvec)

    got = jax.grad(loss_fused, argnums=tuple(range(7)))(x, w1, b1, w2, b2, gamma, beta)
    want = jax.grad(loss_ref, argnums=tuple(range(7)))(x, w1, b1, w2, b2, gamma, beta)
    for g, w, name in zip(got, want, ["x", "w1", "b1", "w2", "b2", "gamma", "beta"]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-4, rtol=1e-3,
            err_msg=f"grad mismatch: {name} (rate={rate})",
        )


@pytest.mark.parametrize("headpack", [False, True, "mixed"])
@pytest.mark.parametrize("rates", [(0.0, 0.0), (0.2, 0.1)])
@pytest.mark.parametrize("with_bias", [False, True])
def test_attn_train_fwd_matches_reference(attn_args, rates, with_bias, headpack):
    x, wqkv, bqkv, wo, bo, gamma, beta, seed, bias = attn_args
    arate, hrate = rates
    b = bias if with_bias else None
    got = attention_block_train(
        x, wqkv, bqkv, wo, bo, gamma, beta, N, seed, bias=b,
        attn_dropout_rate=arate, hidden_dropout_rate=hrate,
        block_b=B, interpret=True, headpack=headpack,
    )
    want = ref_attn(x, wqkv, bqkv, wo, bo, gamma, beta, seed, arate, hrate, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("headpack", [False, True, "mixed"])
@pytest.mark.parametrize("rates", [(0.0, 0.0), (0.2, 0.1)])
def test_attn_train_grads_match_reference(attn_args, rates, headpack):
    x, wqkv, bqkv, wo, bo, gamma, beta, seed, bias = attn_args
    arate, hrate = rates
    cvec = jnp.asarray(
        np.random.default_rng(8).standard_normal((B, S, H)).astype(np.float32)
    )

    def loss_fused(x, wqkv, bqkv, wo, bo, gamma, beta):
        y = attention_block_train(
            x, wqkv, bqkv, wo, bo, gamma, beta, N, seed, bias=bias,
            attn_dropout_rate=arate, hidden_dropout_rate=hrate,
            block_b=B, interpret=True, headpack=headpack,
        )
        return jnp.sum(y * cvec)

    def loss_ref(x, wqkv, bqkv, wo, bo, gamma, beta):
        y = ref_attn(x, wqkv, bqkv, wo, bo, gamma, beta, seed, arate, hrate, bias)
        return jnp.sum(y * cvec)

    names = ["x", "wqkv", "bqkv", "wo", "bo", "gamma", "beta"]
    got = jax.grad(loss_fused, argnums=tuple(range(7)))(x, wqkv, bqkv, wo, bo, gamma, beta)
    want = jax.grad(loss_ref, argnums=tuple(range(7)))(x, wqkv, bqkv, wo, bo, gamma, beta)
    for g, w, name in zip(got, want, names):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-4, rtol=1e-3,
            err_msg=f"grad mismatch: {name} (rates={rates})",
        )


T = 5  # ctx length for cross-attention (F = S = 8)


def ref_cross(x, c, wq, bq, wkv, bkv, wo, bo, gamma, beta, seed, arate, hrate,
              bias=None):
    b, f, h = x.shape
    t = c.shape[1]
    dh = h // N
    scale = 1.0 / (dh**0.5)
    x2d = x.reshape(b * f, h)
    q = (x2d @ wq + bq).reshape(b, f, h)
    kv = (c.reshape(b * t, h) @ wkv + bkv).reshape(b, t, 2 * h)
    outs = []
    for i in range(N):
        qh = q[..., i * dh : (i + 1) * dh]
        kh = kv[..., i * dh : (i + 1) * dh]
        vh = kv[..., h + i * dh : h + (i + 1) * dh]
        scores = jnp.einsum("bfd,btd->bft", qh, kh) * scale
        if bias is not None:
            scores = scores + bias[:, None, :]
        probs = jax.nn.softmax(scores, axis=-1)
        if arate > 0:
            keep = _keep(seed, 1 + i, probs.shape, arate)
            probs = jnp.where(keep, probs / (1.0 - arate), 0.0)
        outs.append(jnp.einsum("bft,btd->bfd", probs, vh))
    ctx_out = jnp.concatenate(outs, axis=-1).reshape(b * f, h)
    o = ctx_out @ wo + bo
    if hrate > 0:
        keep = _keep(seed, 0, o.shape, hrate)
        o = jnp.where(keep, o / (1.0 - hrate), 0.0)
    return _ln(o + x2d, gamma, beta).reshape(b, f, h)


@pytest.fixture(scope="module")
def cross_args():
    r = np.random.default_rng(3)
    f = lambda *s: jnp.asarray(r.standard_normal(s).astype(np.float32) * 0.3)
    bias = jnp.where(jnp.arange(T)[None, :] < 3, 0.0, -10000.0) * jnp.ones((B, 1))
    return (
        f(B, S, H), f(B, T, H), f(H, H), f(H), f(H, 2 * H), f(2 * H),
        f(H, H), f(H), 1.0 + 0.1 * f(H), 0.1 * f(H),
        jnp.array([31337], jnp.int32), bias,
    )


@pytest.mark.parametrize("rates", [(0.0, 0.0), (0.2, 0.1)])
@pytest.mark.parametrize("with_bias", [False, True])
def test_cross_train_fwd_matches_reference(cross_args, rates, with_bias):
    (x, c, wq, bq, wkv, bkv, wo, bo, gamma, beta, seed, bias) = cross_args
    arate, hrate = rates
    b = bias if with_bias else None
    got = cross_attention_block_train(
        x, c, wq, bq, wkv, bkv, wo, bo, gamma, beta, N, seed, bias=b,
        attn_dropout_rate=arate, hidden_dropout_rate=hrate,
        block_b=B, interpret=True,
    )
    want = ref_cross(x, c, wq, bq, wkv, bkv, wo, bo, gamma, beta, seed,
                     arate, hrate, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("rates", [(0.0, 0.0), (0.2, 0.1)])
def test_cross_train_grads_match_reference(cross_args, rates):
    (x, c, wq, bq, wkv, bkv, wo, bo, gamma, beta, seed, bias) = cross_args
    arate, hrate = rates
    cvec = jnp.asarray(
        np.random.default_rng(8).standard_normal((B, S, H)).astype(np.float32)
    )

    def loss_fused(x, c, wq, bq, wkv, bkv, wo, bo, gamma, beta):
        y = cross_attention_block_train(
            x, c, wq, bq, wkv, bkv, wo, bo, gamma, beta, N, seed, bias=bias,
            attn_dropout_rate=arate, hidden_dropout_rate=hrate,
            block_b=B, interpret=True,
        )
        return jnp.sum(y * cvec)

    def loss_ref(x, c, wq, bq, wkv, bkv, wo, bo, gamma, beta):
        y = ref_cross(x, c, wq, bq, wkv, bkv, wo, bo, gamma, beta, seed,
                      arate, hrate, bias)
        return jnp.sum(y * cvec)

    names = ["x", "ctx", "wq", "bq", "wkv", "bkv", "wo", "bo", "gamma", "beta"]
    args = (x, c, wq, bq, wkv, bkv, wo, bo, gamma, beta)
    got = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
    want = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
    for g, w, name in zip(got, want, names):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-4, rtol=1e-3,
            err_msg=f"grad mismatch: {name} (rates={rates})",
        )


def test_dropout_masks_deterministic_and_seed_sensitive(ffn_args):
    x, w1, b1, w2, b2, gamma, beta, seed = ffn_args
    mk = lambda s: np.asarray(
        ffn_block_train(
            x, w1, b1, w2, b2, gamma, beta, s,
            dropout_rate=0.4, block_b=B, interpret=True,
        )
    )
    a, b_, c = mk(seed), mk(seed), mk(jnp.array([999], jnp.int32))
    np.testing.assert_array_equal(a, b_)
    assert np.abs(a - c).max() > 1e-3


def test_dropout_rate_is_respected(ffn_args):
    """The post-FFN hidden dropout zeroes ~rate of pre-residual entries;
    check via the mask itself (the output mixes in the residual)."""
    seed = jnp.array([4242], jnp.int32)
    keep = np.asarray(_keep(seed, 0, (4096, 64), 0.3))
    assert abs(keep.mean() - 0.7) < 0.02


def test_multi_block_grid_matches_single_block(ffn_args):
    """Grid decomposition must not change values at rate=0 (per-block PRNG
    streams make dropout outputs differ by block size, but the rate-0 path
    must be block-invariant)."""
    x, w1, b1, w2, b2, gamma, beta, seed = ffn_args
    one = ffn_block_train(
        x, w1, b1, w2, b2, gamma, beta, seed, block_b=B, interpret=True
    )
    two = ffn_block_train(
        x, w1, b1, w2, b2, gamma, beta, seed, block_b=B // 2, interpret=True
    )
    np.testing.assert_allclose(np.asarray(one), np.asarray(two), atol=2e-5)


def test_non_divisible_batch_degrades_block(ffn_args):
    """Batch sizes the default block_b does not divide must still train:
    _pick_block degrades to the largest divisor (a crash here was a
    regression vs the XLA path, which accepts any batch size)."""
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.pallas_train import (
        _pick_block,
    )

    assert _pick_block(100, 8) == 5
    assert _pick_block(7, 8) == 7
    assert _pick_block(13, 4) == 1
    x, w1, b1, w2, b2, gamma, beta, seed = ffn_args
    x6 = jnp.concatenate([x, x[:2]], axis=0)  # b=6, block_b=4 -> block 3
    got = ffn_block_train(
        x6, w1, b1, w2, b2, gamma, beta, seed, block_b=4, interpret=True
    )
    want = ref_ffn(x6, w1, b1, w2, b2, gamma, beta, seed, rate=0.0, approx=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    # gradients go through the bwd kernel's identical block choice
    g = jax.grad(
        lambda xx: ffn_block_train(
            xx, w1, b1, w2, b2, gamma, beta, seed, block_b=4, interpret=True
        ).sum()
    )(x6)
    gref = jax.grad(
        lambda xx: ref_ffn(
            xx, w1, b1, w2, b2, gamma, beta, seed, rate=0.0, approx=True
        ).sum()
    )(x6)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref), atol=2e-4)


def test_seed_from_key_distinct_and_stable():
    k = jax.random.key(3)
    s1, s2 = seed_from_key(k), seed_from_key(jax.random.fold_in(k, 1))
    assert s1.shape == (1,) and s1.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(seed_from_key(jax.random.key(3))))
    assert int(s1[0]) != int(s2[0])


def test_trainer_fused_interpret_step_decreases_loss():
    """End-to-end: tiny ImageBERT-B Trainer on the fused interpret path."""
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import (
        BertConfig,
        Precision,
        imagebert_b,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models.registry import (
        ModelSpec,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.pallas_train import (
        train_fused,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.train import Trainer

    cfg = BertConfig(
        vocab_size=211, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64,
    )
    spec = ModelSpec(
        "imagebert_b", cfg,
        init=lambda rng: imagebert_b.init_params(rng, cfg),
        apply=imagebert_b.apply, featurizer_layout="imagebert_b",
    )
    rng = np.random.default_rng(2)
    B_ = 8
    batch = {
        "input_ids": rng.integers(0, 211, (B_, 20)).astype(np.int32),
        "len_query": rng.integers(3, 21, (B_,)).astype(np.int32),
        "boxes": rng.standard_normal((B_, 10, 5)).astype(np.float32),
        "features": rng.standard_normal((B_, 10, 2048)).astype(np.float32),
        "label_ids": rng.integers(0, 211, (B_, 10, 8)).astype(np.int32),
        "num_boxes": rng.integers(1, 11, (B_,)).astype(np.int32),
        "segment_ids": np.concatenate(
            [np.zeros((B_, 20), np.int32), np.ones((B_, 10), np.int32)], axis=1
        ),
        "labels": (rng.random(B_) < 0.5).astype(np.int32),
    }
    with train_fused("interpret"):
        trainer = Trainer(spec, precision=Precision.f32())
        state = trainer.init_state(jax.random.key(0))
        losses = []
        for i in range(8):
            state, metrics = trainer.train_step(state, batch, jax.random.key(i))
            losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses


def test_fused_and_xla_paths_agree_when_rates_zero():
    """With dropout probabilities zeroed the fused path must reproduce the
    XLA path's gradients (same math, different kernels)."""
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import (
        BertConfig,
        Precision,
        imagebert_b,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models.registry import (
        ModelSpec,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.pallas_train import (
        train_fused,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.train import recipe_for
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.train.trainer import (
        make_loss_fn,
    )

    cfg = BertConfig(
        vocab_size=211, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    spec = ModelSpec(
        "imagebert_b", cfg,
        init=lambda rng: imagebert_b.init_params(rng, cfg),
        apply=imagebert_b.apply, featurizer_layout="imagebert_b",
    )
    params = spec.init_params(jax.random.key(0))
    rng = np.random.default_rng(3)
    B_ = 8
    batch = {
        "input_ids": rng.integers(0, 211, (B_, 20)).astype(np.int32),
        "len_query": rng.integers(3, 21, (B_,)).astype(np.int32),
        "boxes": rng.standard_normal((B_, 10, 5)).astype(np.float32),
        "features": rng.standard_normal((B_, 10, 2048)).astype(np.float32),
        "label_ids": rng.integers(0, 211, (B_, 10, 8)).astype(np.int32),
        "num_boxes": rng.integers(1, 11, (B_,)).astype(np.int32),
        "segment_ids": np.concatenate(
            [np.zeros((B_, 20), np.int32), np.ones((B_, 10), np.int32)], axis=1
        ),
        "labels": (rng.random(B_) < 0.5).astype(np.int32),
    }
    loss_fn = make_loss_fn(spec, recipe_for("imagebert_b"), Precision.f32())
    key = jax.random.key(7)

    def grads(mode):
        with train_fused(mode):
            (_, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, key
            )
        return g

    g_fused, g_xla = grads("interpret"), grads("off")
    flat_f, _ = jax.tree.flatten(g_fused)
    flat_x, _ = jax.tree.flatten(g_xla)
    for a, b in zip(flat_f, flat_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        )


def test_remat_tracks_actual_block_fusion():
    """train_blocks_fused must mirror the block gates: a config the gates
    reject (exotic activation) reports False even when the fused mode is on,
    so encoder() keeps its per-layer remat on the XLA fallback -- and that
    fallback still trains (grads finite) under a non-off fused mode."""
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models.core import (
        BertConfig,
        Precision,
        encoder,
        encoder_init,
        train_blocks_fused,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.pallas_train import (
        train_fused,
    )

    cfg = BertConfig(
        vocab_size=97, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=32,
        max_position_embeddings=32, hidden_act="relu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    p = encoder_init(jax.random.key(0), cfg)
    att = jax.tree.map(lambda x: x[0], p)["attention"]
    ffn = jax.tree.map(lambda x: x[0], p)["ffn"]
    with train_fused("interpret"):
        assert not train_blocks_fused(att, ffn, None, "relu")
        assert train_blocks_fused(att, ffn, None, "gelu")
        bad_bias = jnp.zeros((2, 1, 6, 6))  # not the compact [B,1,1,S] form
        assert not train_blocks_fused(att, ffn, bad_bias, "gelu")

        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 6, 16)), jnp.float32
        )
        g = jax.grad(
            lambda xx: encoder(
                p, xx, None, cfg, Precision.f32(), rng=jax.random.key(1)
            ).sum()
        )(x)
    assert np.isfinite(np.asarray(g)).all()


def test_env_block_per_kind_precedence(monkeypatch):
    """_env_block: explicit block_b > KMR_TRAIN_BLOCK_<KIND> >
    KMR_TRAIN_BLOCK > per-op default (the per-kind knobs isolate which
    kernel family a sweep win comes from)."""
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.pallas_train import (
        _env_block,
    )

    monkeypatch.delenv("KMR_TRAIN_BLOCK", raising=False)
    monkeypatch.delenv("KMR_TRAIN_BLOCK_FFN", raising=False)
    monkeypatch.delenv("KMR_TRAIN_BLOCK_ATTN", raising=False)
    assert _env_block(4, kind="ffn") == 4
    monkeypatch.setenv("KMR_TRAIN_BLOCK", "8")
    assert _env_block(4, kind="ffn") == 8
    assert _env_block(8, kind="attn") == 8
    monkeypatch.setenv("KMR_TRAIN_BLOCK_ATTN", "16")
    assert _env_block(8, kind="attn") == 16
    assert _env_block(4, kind="ffn") == 8  # generic still wins for ffn
    monkeypatch.setenv("KMR_TRAIN_BLOCK_FFN", "2")
    assert _env_block(4, kind="ffn") == 2
    assert _env_block(4) == 8  # kind-less callers see only the generic knob
    with pytest.raises(ValueError):
        monkeypatch.setenv("KMR_TRAIN_BLOCK_FFN", "0")
        _env_block(4, kind="ffn")


def test_resolve_train_block_config_defaults(monkeypatch):
    """resolve_train_block: sweep envs > config field > None (kernel
    default). Per-model defaults (BertConfig.train_block_ffn/_attn) must
    lose to the env knobs or `perf_lab.py train` sweeps would silently
    measure the config value."""
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models.core import (
        BertConfig,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.pallas_train import (
        resolve_train_block,
    )

    monkeypatch.delenv("KMR_TRAIN_BLOCK", raising=False)
    monkeypatch.delenv("KMR_TRAIN_BLOCK_FFN", raising=False)
    monkeypatch.delenv("KMR_TRAIN_BLOCK_ATTN", raising=False)

    plain = BertConfig()
    assert resolve_train_block("ffn", plain) is None
    assert resolve_train_block("attn", plain) is None

    cfg = BertConfig(train_block_ffn=16, train_block_attn=16)
    assert resolve_train_block("ffn", cfg) == 16
    assert resolve_train_block("attn", cfg) == 16

    monkeypatch.setenv("KMR_TRAIN_BLOCK", "8")
    assert resolve_train_block("ffn", cfg) == 8
    monkeypatch.setenv("KMR_TRAIN_BLOCK_FFN", "4")
    assert resolve_train_block("ffn", cfg) == 4
    assert resolve_train_block("attn", cfg) == 8
    with pytest.raises(ValueError):
        monkeypatch.setenv("KMR_TRAIN_BLOCK_ATTN", "-1")
        resolve_train_block("attn", cfg)
    # objects without the fields (e.g. LxmertConfig wrappers) degrade to None
    monkeypatch.delenv("KMR_TRAIN_BLOCK", raising=False)
    monkeypatch.delenv("KMR_TRAIN_BLOCK_ATTN", raising=False)
    monkeypatch.delenv("KMR_TRAIN_BLOCK_FFN", raising=False)
    assert resolve_train_block("ffn", object()) is None


def test_config_train_block_reaches_kernels(monkeypatch):
    """A config-set train block actually changes the fused kernels' grid
    (observed via the dropout masks: draws are per grid block, so with a
    nonzero rate different blockings give different masks) while leaving
    dropout-free values identical."""
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models.core import (
        BertConfig,
        Precision,
        encoder,
        encoder_init,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.pallas_train import (
        train_fused,
    )

    monkeypatch.delenv("KMR_TRAIN_BLOCK", raising=False)
    monkeypatch.delenv("KMR_TRAIN_BLOCK_FFN", raising=False)
    monkeypatch.delenv("KMR_TRAIN_BLOCK_ATTN", raising=False)

    kw = dict(
        vocab_size=97, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=32,
        max_position_embeddings=32,
    )
    drop = dict(hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    cfg_default = BertConfig(**kw, **drop)
    cfg_blocked = cfg_default.replace(train_block_ffn=1, train_block_attn=1)
    p = encoder_init(jax.random.key(0), cfg_default)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 8, 16)), jnp.float32
    )
    with train_fused("interpret"):
        out_default = encoder(
            p, x, None, cfg_default, Precision.f32(), rng=jax.random.key(1)
        )
        out_blocked = encoder(
            p, x, None, cfg_blocked, Precision.f32(), rng=jax.random.key(1)
        )
        # no dropout: block size is pure tiling, values must agree
        np.testing.assert_allclose(
            np.asarray(out_default), np.asarray(out_blocked), atol=1e-5
        )
        # with dropout the per-block draw order makes the masks differ,
        # proving the config block reached the kernels
        cfg_d = BertConfig(**kw, hidden_dropout_prob=0.5,
                           attention_probs_dropout_prob=0.0)
        cfg_d_blocked = cfg_d.replace(train_block_ffn=1, train_block_attn=1)
        out_d = encoder(
            p, x, None, cfg_d, Precision.f32(), rng=jax.random.key(1)
        )
        out_d_blocked = encoder(
            p, x, None, cfg_d_blocked, Precision.f32(), rng=jax.random.key(1)
        )
    assert not np.allclose(np.asarray(out_d), np.asarray(out_d_blocked))
