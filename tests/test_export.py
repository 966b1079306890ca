"""AOT serving export (serving/export.py + scripts/export.py).

An exported artifact must reproduce the live model's scores bit-for-bit on
the same platform, survive a serialize -> file -> deserialize roundtrip,
pad tail batches like ScoringEngine, and embed its weights (no params fed
at call time). Reference context: the frozen per-checkpoint scorers the
predict scripts rebuilt inline (run_pretraining_predict_score.py:522-593).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.batchspec import (
    example_batch,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import (
    Precision,
    get_model,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.serving import (
    export_scorer,
    load_scorer,
    save_scorer,
)

REPO = Path(__file__).resolve().parents[1]
TINY = {
    "hidden_size": 32,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "intermediate_size": 37,
}


@pytest.fixture(autouse=True)
def _tiny_models(monkeypatch):
    monkeypatch.setenv("KMR_CONFIG_OVERRIDES", json.dumps(TINY))


@pytest.mark.parametrize("name", ["imagebert_a", "lxmert"])
def test_export_roundtrip_matches_live_model(name, tmp_path):
    spec = get_model(name)
    params = spec.init_params(jax.random.key(0))
    B = 4
    exported = export_scorer(spec, params, B, precision=Precision.f32())
    meta = save_scorer(tmp_path / "art", exported, spec, B, "xla")
    assert meta["model"] == name and meta["batch_size"] == B

    scorer = load_scorer(tmp_path / "art")
    batch = example_batch(name, spec.config, B, np.random.default_rng(1))
    got = scorer(batch)
    want = np.asarray(
        spec.apply(params, batch, spec.config, Precision.f32())["score"]
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("name", ["imagebert_a", "lxmert"])
def test_polymorphic_export_serves_any_batch(name, tmp_path):
    """batch_size=None exports a symbolic leading dim: one artifact, any
    batch size, no tail padding."""
    spec = get_model(name)
    params = spec.init_params(jax.random.key(0))
    exported = export_scorer(spec, params, None, precision=Precision.f32())
    save_scorer(tmp_path / "art", exported, spec, None, "xla")
    scorer = load_scorer(tmp_path / "art")
    assert scorer.batch_size is None
    for B in (3, 7):
        batch = example_batch(name, spec.config, B, np.random.default_rng(B))
        got = scorer(batch)
        want = np.asarray(
            spec.apply(params, batch, spec.config, Precision.f32())["score"]
        )
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_export_pads_tail_batch(tmp_path):
    spec = get_model("imagebert_a")
    params = spec.init_params(jax.random.key(0))
    exported = export_scorer(spec, params, 4, precision=Precision.f32())
    save_scorer(tmp_path / "art", exported, spec, 4, "xla")
    scorer = load_scorer(tmp_path / "art")
    full = example_batch("imagebert_a", spec.config, 4, np.random.default_rng(2))
    tail = {k: v[:3] for k, v in full.items()}
    got = scorer(tail)
    assert got.shape == (3,)
    np.testing.assert_allclose(got, scorer(full)[:3], atol=1e-6)
    too_big = {k: np.concatenate([v, v], axis=0) for k, v in full.items()}
    with pytest.raises(ValueError, match="exceeds artifact batch size"):
        scorer(too_big)
    assert scorer.feature_keys == set(full)
    wrong = dict(full)
    wrong["bogus"] = wrong.pop("boxes")
    with pytest.raises(ValueError, match=r"missing \['boxes'\].*'bogus'"):
        scorer(wrong)


def test_tower_export_matches_live_embedders(tmp_path, monkeypatch):
    """Both cascade recall embedders freeze and reproduce live embeddings
    (polymorphic batch); together with the scorer export this covers the
    full retrieval cascade's serving story."""
    monkeypatch.setenv(
        "KMR_TOWER_CONFIG_OVERRIDES",
        json.dumps({"bert": TINY, "embed_dim": 16, "temperature": 0.1}),
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models.two_tower import (
        embed_product,
        embed_query,
        init_params,
        two_tower_config,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.serving import (
        export_tower,
    )

    tcfg = two_tower_config()
    params = init_params(jax.random.key(0), tcfg)
    rng = np.random.default_rng(5)
    qb = {
        "input_ids": rng.integers(0, tcfg.bert.vocab_size, (3, 20)).astype(np.int32),
        "len_query": rng.integers(3, 21, (3,)).astype(np.int32),
    }
    pb = {
        "boxes": rng.standard_normal((3, 10, 5)).astype(np.float32),
        "features": rng.standard_normal((3, 10, 2048)).astype(np.float32),
        "label_ids": rng.integers(0, tcfg.bert.vocab_size, (3, 10, 8)).astype(np.int32),
        "num_boxes": rng.integers(1, 11, (3,)).astype(np.int32),
    }
    for side, live, batch in (
        ("query", embed_query, qb),
        ("product", embed_product, pb),
    ):
        exported = export_tower(params, tcfg, side, None, precision=Precision.f32())
        save_scorer(tmp_path / side, exported, f"two_tower_{side}", None, "xla")
        scorer = load_scorer(tmp_path / side)
        got = scorer(batch)
        want = np.asarray(live(params, batch, tcfg, Precision.f32()))
        assert got.shape == (3, tcfg.embed_dim)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_export_cli(tmp_path):
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "JAX_PLATFORM_NAME": "cpu",
        "KMR_CONFIG_OVERRIDES": json.dumps(TINY),
    }
    out = tmp_path / "artifact"
    r = subprocess.run(
        [
            sys.executable, "scripts/export.py",
            "--model", "imagebert_b",
            "--batch-size", "4",
            "--precision", "f32",
            "--quantize", "int8",
            "--out", str(out),
        ],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=480,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = json.loads(r.stdout.strip().splitlines()[-1])
    assert line["model"] == "imagebert_b" and line["quantize"] == "int8"
    assert (out / "scorer.jaxexport").exists()
    # the ON-DISK sidecar must record the quantize mode too
    assert json.loads((out / "meta.json").read_text())["quantize"] == "int8"

    # the int8 artifact reproduces a live quantized apply exactly
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.quant import (
        quantize_dense_tree,
    )

    scorer = load_scorer(out)
    spec = get_model("imagebert_b")
    params = quantize_dense_tree(
        spec.init_params(jax.random.key(0)), skip_paths=("cls",)
    )
    batch = example_batch("imagebert_b", spec.config, 4, np.random.default_rng(3))
    got = scorer(batch)
    want = np.asarray(
        spec.apply(params, batch, spec.config, Precision.f32())["score"]
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_export_cli_int8_ffn(tmp_path):
    """--quantize int8-ffn: artifact quantises only FFN denses and
    reproduces the live ffn-only quantized apply exactly."""
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "JAX_PLATFORM_NAME": "cpu",
        "KMR_CONFIG_OVERRIDES": json.dumps(TINY),
    }
    out = tmp_path / "artifact"
    r = subprocess.run(
        [
            sys.executable, "scripts/export.py",
            "--model", "imagebert_a",
            "--batch-size", "4",
            "--precision", "f32",
            "--quantize", "int8-ffn",
            "--out", str(out),
        ],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=480,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = json.loads(r.stdout.strip().splitlines()[-1])
    assert line["quantize"] == "int8-ffn"
    assert json.loads((out / "meta.json").read_text())["quantize"] == "int8-ffn"

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.quant import (
        quantize_dense_tree,
    )

    scorer = load_scorer(out)
    spec = get_model("imagebert_a")
    params = quantize_dense_tree(
        spec.init_params(jax.random.key(0)), skip_paths=("cls",),
        only_paths=("ffn",),
    )
    batch = example_batch("imagebert_a", spec.config, 4, np.random.default_rng(3))
    got = scorer(batch)
    want = np.asarray(
        spec.apply(params, batch, spec.config, Precision.f32())["score"]
    )
    np.testing.assert_allclose(got, want, atol=1e-6)
