"""Two-tower dual encoder + exact recall tests (tiny config, CPU mesh)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import BertConfig, Precision
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models.two_tower import (
    TwoTowerConfig,
    contrastive_loss,
    embed_product,
    embed_query,
    init_params,
    recall_sharded,
    top_k_products,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.parallel import make_mesh

TCFG = TwoTowerConfig(
    bert=BertConfig(
        vocab_size=101,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=41,
        max_position_embeddings=64,
    ),
    embed_dim=16,
)


def _batch(rng, B):
    return {
        "input_ids": rng.integers(0, 101, (B, 20)).astype(np.int32),
        "len_query": rng.integers(3, 21, (B,)).astype(np.int32),
        "boxes": rng.standard_normal((B, 10, 5)).astype(np.float32),
        "features": rng.standard_normal((B, 10, 2048)).astype(np.float32),
        "label_ids": rng.integers(0, 101, (B, 10, 8)).astype(np.int32),
        "num_boxes": rng.integers(1, 11, (B,)).astype(np.int32),
    }


def test_towers_emit_unit_embeddings():
    params = jax.jit(lambda r: init_params(r, TCFG))(jax.random.key(0))
    rng = np.random.default_rng(0)
    batch = _batch(rng, 6)
    q = np.asarray(jax.jit(lambda p, b: embed_query(p, b, TCFG))(params, batch))
    pr = np.asarray(jax.jit(lambda p, b: embed_product(p, b, TCFG))(params, batch))
    assert q.shape == (6, 16) and pr.shape == (6, 16)
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(pr, axis=1), 1.0, atol=1e-5)


def test_contrastive_loss_prefers_diagonal():
    e = jnp.eye(4, 16)
    loss_perfect, m = contrastive_loss(e, e, temperature=0.05)
    loss_bad, _ = contrastive_loss(e, jnp.roll(e, 1, axis=0), temperature=0.05)
    assert float(loss_perfect) < float(loss_bad)
    assert float(m["in_batch_accuracy"]) == 1.0


def test_top_k_exact_vs_numpy():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((7, 16)).astype(np.float32)
    cat = rng.standard_normal((1000, 16)).astype(np.float32)
    s, i = jax.jit(lambda q, c: top_k_products(q, c, k=5, chunk=128))(q, cat)
    s, i = np.asarray(s), np.asarray(i)
    ref = q @ cat.T
    ref_idx = np.argsort(-ref, axis=1)[:, :5]
    np.testing.assert_array_equal(np.sort(i, axis=1), np.sort(ref_idx, axis=1))
    np.testing.assert_allclose(
        s, np.take_along_axis(ref, i, axis=1), rtol=1e-5, atol=1e-5
    )


def test_recall_sharded_equals_single_device():
    mesh = make_mesh()
    rng = np.random.default_rng(2)
    q = rng.standard_normal((5, 16)).astype(np.float32)
    cat = rng.standard_normal((999, 16)).astype(np.float32)  # not divisible by 8
    s1, i1 = top_k_products(jnp.asarray(q), jnp.asarray(cat), k=5, chunk=256)
    s2, i2 = recall_sharded(jnp.asarray(q), jnp.asarray(cat), mesh, k=5, chunk=256)
    np.testing.assert_array_equal(np.sort(np.asarray(i1), 1), np.sort(np.asarray(i2), 1))
    np.testing.assert_allclose(
        np.sort(np.asarray(s1), 1), np.sort(np.asarray(s2), 1), rtol=1e-5, atol=1e-5
    )


def test_recall_sharded_all_negative_scores_nondivisible():
    """Device zero-padding must never displace real candidates (advisor r2):
    catalog where every true score is negative and size % n_devices != 0 --
    with unmasked padding the zero rows win the last shard's top-k and get
    dropped to -1 after the merge, returning fewer than k genuine results."""
    mesh = make_mesh()
    rng = np.random.default_rng(4)
    q = np.abs(rng.standard_normal((3, 16))).astype(np.float32)
    cat = -np.abs(rng.standard_normal((13, 16))).astype(np.float32)
    s, i = recall_sharded(jnp.asarray(q), jnp.asarray(cat), mesh, k=5, chunk=8)
    i = np.asarray(i)
    assert (i >= 0).all(), i
    ref = q @ cat.T
    ref_idx = np.argsort(-ref, axis=1)[:, :5]
    np.testing.assert_array_equal(np.sort(i, 1), np.sort(ref_idx, 1))
    np.testing.assert_allclose(
        np.sort(np.asarray(s), 1),
        np.sort(np.take_along_axis(ref, ref_idx, 1), 1),
        rtol=1e-5, atol=1e-5,
    )


def test_contrastive_training_overfits_tiny_batch():
    import optax

    params = jax.jit(lambda r: init_params(r, TCFG))(jax.random.key(1))
    rng = np.random.default_rng(3)
    batch = _batch(rng, 8)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            q = embed_query(p, batch, TCFG)
            pr = embed_product(p, batch, TCFG)
            loss, metrics = contrastive_loss(q, pr, TCFG.temperature)
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, metrics

    losses = []
    for _ in range(30):
        params, opt_state, loss, metrics = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[::10]
    assert float(metrics["in_batch_accuracy"]) >= 0.75


def test_contrastive_group_mask_removes_false_negatives():
    """Two rows sharing a query: without the group mask the duplicate is a
    false negative and inflates the loss; with it, only true negatives
    compete in the softmax."""
    rng = np.random.default_rng(0)
    q = rng.standard_normal((4, 8)).astype(np.float32)
    q[1] = q[0]  # rows 0 and 1 share a query embedding
    p = rng.standard_normal((4, 8)).astype(np.float32)
    q = jnp.asarray(q) / jnp.linalg.norm(q, axis=1, keepdims=True)
    p = jnp.asarray(p) / jnp.linalg.norm(p, axis=1, keepdims=True)
    groups = jnp.asarray([7, 7, 8, 9], jnp.int32)

    plain, _ = contrastive_loss(q, p, temperature=0.1)
    masked, _ = contrastive_loss(q, p, temperature=0.1, group_ids=groups)
    # masking removes probability mass from the duplicate's column/row
    assert float(masked) < float(plain)
    # with all-distinct groups the mask is a no-op
    distinct, _ = contrastive_loss(
        q, p, temperature=0.1, group_ids=jnp.asarray([1, 2, 3, 4], jnp.int32)
    )
    np.testing.assert_allclose(float(distinct), float(plain), rtol=1e-6)
