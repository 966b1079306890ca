"""Int8 serving path (ops/quant.py): kernel quantisation, the dynamic-quant
dense, tree conversion, and whole-model score drift at tiny config.

The int8 mode is serving-only (strict parity stays f32/bf16); measured MXU
rates are in docs/BENCH.md (shape-gated: >=2048-wide layers win, 768-wide
is neutral).
"""

import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.quant import (
    QUANT_KERNEL,
    QUANT_SCALE,
    dense_q8,
    is_quantized,
    quantize_dense_tree,
    quantize_kernel,
)

TINY = {
    "hidden_size": 32,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "intermediate_size": 37,
}


def test_quantize_kernel_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((64, 48)).astype(np.float32))
    q = quantize_kernel(k)
    assert q[QUANT_KERNEL].dtype == jnp.int8
    deq = q[QUANT_KERNEL].astype(np.float32) * q[QUANT_SCALE]
    # symmetric per-channel int8: error <= scale/2 = amax/254 per element
    amax = np.max(np.abs(np.asarray(k)), axis=0)
    assert (np.abs(np.asarray(deq) - np.asarray(k)) <= amax / 254 + 1e-7).all()


def test_dense_q8_close_to_f32_dense():
    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.standard_normal((64, 48)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((48,)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((16, 64)).astype(np.float32))
    got = dense_q8({**quantize_kernel(k), "bias": b}, x)
    want = x @ k + b
    # two int8 roundings over a 64-deep contraction: ~1% relative
    err = np.abs(np.asarray(got - want))
    assert err.max() <= 0.03 * float(jnp.abs(want).max())


def test_quantize_dense_tree_skips_and_marks():
    tree = {
        "enc": {"kernel": jnp.ones((8, 8)), "bias": jnp.zeros(8)},
        "head": {"kernel": jnp.ones((8, 2)), "bias": jnp.zeros(2)},
        "ln": {"gamma": jnp.ones(8), "beta": jnp.zeros(8)},
    }
    q = quantize_dense_tree(tree, skip_paths=("head",))
    assert is_quantized(q["enc"]) and not is_quantized(q["head"])
    assert "kernel" not in q["enc"] and "kernel" in q["head"]
    assert q["ln"]["gamma"].shape == (8,)  # non-dense leaves untouched


@pytest.mark.parametrize("name", ["imagebert_a", "imagebert_b"])
def test_quantized_model_scores_track_f32(name, monkeypatch):
    """Whole-model int8 scoring drifts but must preserve ranking signal:
    scores correlate strongly with the f32 scores at tiny config."""
    monkeypatch.setenv("KMR_CONFIG_OVERRIDES", json.dumps(TINY))
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.batchspec import (
        example_batch,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import (
        Precision,
        get_model,
    )

    spec = get_model(name)
    params = spec.init_params(jax.random.key(0))
    batch = example_batch(name, spec.config, 16, np.random.default_rng(2))
    f32 = np.asarray(
        spec.apply(params, batch, spec.config, Precision.f32())["score"]
    )
    qparams = quantize_dense_tree(params)
    # the scan-STACKED encoder kernels ([L, in, out]) must be quantized too
    # (regression: an ndim==2 gate silently left every encoder layer f32)
    n_int8 = sum(
        1 for x in jax.tree.leaves(qparams) if str(x.dtype) == "int8"
    )
    assert n_int8 >= 8, n_int8
    q = np.asarray(
        spec.apply(qparams, batch, spec.config, Precision.f32())["score"]
    )
    assert np.isfinite(q).all()
    # random-init tiny models give near-uniform scores; demand the int8
    # scores stay within a tight band of f32 rather than rank-correlate
    assert np.abs(q - f32).max() < 0.05


def test_stacked_kernel_quantization_matches_per_layer():
    """Quantizing a stacked [L, in, out] kernel == quantizing each layer's
    [in, out] slice separately (per-(layer, channel) scales)."""
    rng = np.random.default_rng(4)
    k = jnp.asarray(rng.standard_normal((3, 16, 8)).astype(np.float32))
    q = quantize_kernel(k)
    for layer in range(3):
        ql = quantize_kernel(k[layer])
        np.testing.assert_array_equal(
            np.asarray(q[QUANT_KERNEL][layer]), np.asarray(ql[QUANT_KERNEL])
        )
        np.testing.assert_allclose(
            np.asarray(q[QUANT_SCALE][layer]), np.asarray(ql[QUANT_SCALE])
        )


def test_cast_residual_bf16_keeps_scales_f32():
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.quant import (
        cast_residual_bf16,
    )

    tree = quantize_dense_tree(
        {"enc": {"kernel": jnp.ones((4, 8, 8)), "bias": jnp.zeros((4, 8))}}
    )
    tree["emb"] = jnp.ones((10, 8), jnp.float32)
    out = cast_residual_bf16(tree)
    assert out["enc"][QUANT_KERNEL].dtype == jnp.int8
    assert out["enc"][QUANT_SCALE].dtype == jnp.float32
    assert out["enc"]["bias"].dtype == jnp.bfloat16
    assert out["emb"].dtype == jnp.bfloat16


MID = {
    "hidden_size": 128,
    "num_hidden_layers": 4,
    "num_attention_heads": 4,
    "intermediate_size": 512,
}


@pytest.mark.parametrize("mode", ["full", "ffn"])
@pytest.mark.parametrize("name", ["imagebert_a", "imagebert_b"])
def test_int8_rank_fidelity(name, mode, monkeypatch):
    """The product of this pipeline is a RANKING, so int8 serving must
    guarantee rank fidelity, not just a score band (round-3 verdict item 7):
    per-query Kendall tau, top-5 set overlap, and nDCG@5 delta vs f32 over a
    synthetic valid set of 20 queries x 30 products.

    Mid-size config (128-wide, 4 layers): tiny 32-wide configs give
    near-uniform random-init scores where ties dominate; 128-wide gives a
    score spread 30x the measured int8 drift, so rank churn here would be a
    genuine quantisation failure, not tie noise."""
    monkeypatch.setenv("KMR_CONFIG_OVERRIDES", json.dumps(MID))
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.batchspec import (
        example_batch,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.eval.ndcg import (
        evaluate_scores,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import (
        Precision,
        get_model,
    )

    spec = get_model(name)
    params = spec.init_params(jax.random.key(0))
    n_queries, n_products = 20, 30
    batch = example_batch(
        name, spec.config, n_queries * n_products, np.random.default_rng(5)
    )

    def score(p):
        return np.asarray(
            jax.jit(lambda p, b: spec.apply(p, b, spec.config, Precision.f32())["score"])(
                p, batch
            )
        )

    f32 = score(params)
    only = ("ffn",) if mode == "ffn" else None
    q8 = score(quantize_dense_tree(params, only_paths=only))

    taus, overlaps = [], []
    f32_table, q8_table, answers = {}, {}, {}
    for q in range(n_queries):
        a = f32[q * n_products : (q + 1) * n_products]
        b = q8[q * n_products : (q + 1) * n_products]
        ii, jj = np.triu_indices(n_products, 1)
        taus.append(float(np.mean(np.sign(a[ii] - a[jj]) * np.sign(b[ii] - b[jj]))))
        top_a = np.argsort(-a)[:5]
        top_b = np.argsort(-b)[:5]
        overlaps.append(len(set(top_a) & set(top_b)) / 5)
        qid = str(q)
        f32_table[qid] = {str(p): float(a[p]) for p in range(n_products)}
        q8_table[qid] = {str(p): float(b[p]) for p in range(n_products)}
        # ground truth = the f32 ranking's top 5 (what serving must preserve)
        answers[qid] = [str(p) for p in top_a]

    assert np.mean(taus) >= 0.98, f"mean Kendall tau {np.mean(taus):.4f}"
    assert np.min(taus) >= 0.95, f"min Kendall tau {np.min(taus):.4f}"
    assert np.mean(overlaps) >= 0.95, f"mean top-5 overlap {np.mean(overlaps):.3f}"
    assert np.min(overlaps) >= 0.8, f"min top-5 overlap {np.min(overlaps):.3f}"

    ndcg_f32 = evaluate_scores(f32_table, answers)  # == 1.0 by construction
    ndcg_q8 = evaluate_scores(q8_table, answers)
    assert ndcg_f32 == pytest.approx(1.0)
    assert ndcg_f32 - ndcg_q8 <= 0.01, f"nDCG@5 delta {ndcg_f32 - ndcg_q8:.4f}"


def test_quantize_only_paths_ffn():
    """FFN-only mode (only_paths): quantise exactly the ffn denses, leave
    attention projections and heads full precision -- the shape-gated
    serving mode (int8 wins at >=2048-wide contractions only)."""
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import get_model
    import os

    os.environ["KMR_CONFIG_OVERRIDES"] = json.dumps(TINY)
    try:
        spec = get_model("imagebert_a")
        params = spec.init_params(jax.random.key(0))
    finally:
        del os.environ["KMR_CONFIG_OVERRIDES"]
    q = quantize_dense_tree(params, skip_paths=("cls",), only_paths=("ffn",))
    enc = q["bert"]["encoder"]
    assert is_quantized(enc["ffn"]["intermediate"])
    assert is_quantized(enc["ffn"]["output"]["dense"])
    assert not is_quantized(enc["attention"]["query"])
    assert not is_quantized(enc["attention"]["output"]["dense"])
    assert not is_quantized(q["bert"]["pooler"]["dense"])
    assert "output_weights" in q["cls"]["seq_relationship"]

    # ffn-only scores sit strictly closer to f32 than full int8 (it is a
    # subset of the same rounding), and well inside the 0.05 band
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.batchspec import (
        example_batch,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import Precision

    batch = example_batch("imagebert_a", spec.config, 16, np.random.default_rng(6))
    f32 = np.asarray(spec.apply(params, batch, spec.config, Precision.f32())["score"])
    ffn = np.asarray(spec.apply(q, batch, spec.config, Precision.f32())["score"])
    full = np.asarray(
        spec.apply(
            quantize_dense_tree(params, skip_paths=("cls",)),
            batch, spec.config, Precision.f32(),
        )["score"]
    )
    assert np.abs(ffn - f32).max() < 0.05
    assert np.abs(ffn - f32).mean() <= np.abs(full - f32).mean() + 1e-6
