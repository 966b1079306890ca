"""Memmapped catalog + chunked recall (data/catalog.py) and the
catalog-scale CLI surfaces (recall.py --packed, bench_recall_3m.py)."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytest.importorskip("jax")

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import (
    CatalogDataset,
    build_catalog,
    recall_at_k,
    recall_chunked,
)

ROOT = Path(__file__).resolve().parents[1]


def _entries(n, d=16, seed=0, with_features=False):
    rng = np.random.default_rng(seed)
    for i in range(n):
        e = {
            "product_id": np.int64(900_000 + i),
            "embedding": rng.standard_normal(d).astype(np.float32),
        }
        if with_features:
            e["features"] = rng.standard_normal((10, 32)).astype(np.float32)
            e["num_boxes"] = np.int32(rng.integers(1, 11))
        yield e


def test_catalog_roundtrip_and_chunks(tmp_path):
    manifest = build_catalog(_entries(23, with_features=True), tmp_path / "cat",
                             shard_size=7)
    assert manifest["num_instances"] == 23
    ds = CatalogDataset(tmp_path / "cat")
    assert len(ds) == 23 and ds.dim == 16
    np.testing.assert_array_equal(ds.product_ids(), 900_000 + np.arange(23))
    # chunks cover every row exactly once, in order, never crossing shards
    rows = []
    for start, slab in ds.embedding_chunks(chunk_rows=5):
        assert slab.shape[0] <= 5
        assert start == len([r for c in rows for r in c]) if not rows else True
        rows.append(slab)
    got = np.concatenate(rows, axis=0)
    want = np.concatenate(
        [np.asarray(e["embedding"], np.float16) for e in _entries(23, with_features=True)]
    ).reshape(23, 16)
    np.testing.assert_array_equal(got, want)
    # arbitrary-row gather (the rerank feature fetch) crosses shard bounds
    batch = ds.rows(np.array([0, 6, 7, 22]))
    assert batch["features"].dtype == np.float32
    np.testing.assert_array_equal(
        batch["product_id"], [900_000, 900_006, 900_007, 900_022]
    )


def test_recall_chunked_matches_oracle(tmp_path):
    """Chunked device recall vs an f32 numpy oracle. The device scores in
    bf16, which can swap near-ties, so compare top-k score values (within
    bf16 tolerance) rather than exact index sets, plus every index whose
    margin over rank k+1 exceeds the bf16 noise."""
    build_catalog(_entries(200, d=16, seed=1), tmp_path / "cat", shard_size=64)
    ds = CatalogDataset(tmp_path / "cat")
    rng = np.random.default_rng(2)
    q = rng.standard_normal((9, 16)).astype(np.float32)
    s, idx = recall_chunked(q, ds, k=7, chunk_rows=50)
    cat = np.concatenate([slab for _, slab in ds.embedding_chunks(1000)]).astype(np.float32)
    ref = np.sort(q @ cat.T, axis=1)[:, ::-1][:, :7]
    assert (np.diff(s, axis=1) <= 1e-6).all()  # descending
    np.testing.assert_allclose(s, ref, atol=0.08, rtol=0.02)
    ref_idx = np.argsort(-(q @ cat.T), axis=1)
    for row in range(9):
        margin_safe = {
            int(i) for r, i in enumerate(ref_idx[row, :7])
            if (q[row] @ cat[i]) - (q[row] @ cat[ref_idx[row, 7]]) > 0.08
        }
        assert margin_safe <= set(int(i) for i in idx[row])


def test_recall_at_k_curve():
    retrieved = np.array([[3, 1, 2, -1], [9, 8, 7, 6]])
    truth = {0: [1, 5], 1: [6]}
    curve = recall_at_k(retrieved, truth, [1, 2, 4])
    assert curve[1] == 0.0
    assert curve[2] == pytest.approx(1 / 3)  # hit product 1 of {1,5,6}
    assert curve[4] == pytest.approx(2 / 3)  # + product 6
    assert list(curve) == [1, 2, 4]


def test_bench_recall_3m_smoke(tmp_path):
    """The 3M driver at toy scale: shards stream, curve is sane, top-K at
    low noise recovers every planted neighbor."""
    r = subprocess.run(
        [sys.executable, "scripts/bench_recall_3m.py",
         "--products", "3000", "--queries", "16", "--dim", "16",
         "--noise", "0.1", "--shard-size", "1024", "--chunk-rows", "700",
         "--ks", "1,5,50", "--out-dir", str(tmp_path / "cat")],
        cwd=ROOT, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["products"] == 3000
    curve = stats["recall_at_k"]
    assert curve["50"] >= curve["5"] >= curve["1"]
    assert curve["50"] == 1.0  # noise 0.1 keeps the planted row in top-50
    assert (tmp_path / "cat" / "manifest.json").exists()


def test_rerank_batch_matches_featurizer(tmp_path):
    """The packed-catalog rerank assembly must reproduce every model's
    Featurizer layout bit-for-bit (features modulo the catalog's float16
    storage) -- this is what makes `cascade.py --catalog <packed dir>`
    score-equivalent to the TSV featurization path."""
    import dataclasses

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu import VOCAB_PATH
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import (
        Featurizer,
        load_multimodal_labels,
        parse_line,
        rerank_batch,
        stack_examples,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.synthetic import (
        SYNTHETIC_LABELS,
        make_row,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import get_model
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.tokenization import (
        FullTokenizer,
    )

    labels_path = tmp_path / "labels.txt"
    labels_path.write_text(
        "\n".join(f"{k}\t{v}" for k, v in SYNTHETIC_LABELS.items()) + "\n"
    )
    labels = load_multimodal_labels(labels_path)
    rng = np.random.default_rng(5)
    product_exs = [
        parse_line(make_row(rng, product_id=700 + i, query_id=0)) for i in range(6)
    ]
    query_exs = [
        parse_line(make_row(
            rng, product_id=0, query_id=40 + i,
            query="sen department of sweet dress" if i == 0 else None,
        ))
        for i in range(3)
    ]

    # the catalog stores what recall.py build --store-features stores: the
    # ImageBERT-B featurization of each product (features halved to f16)
    google = FullTokenizer.google_style(VOCAB_PATH)
    tower_fz = Featurizer(google, labels)
    build_catalog(
        (
            {
                "product_id": np.int64(ex.product_id),
                "embedding": rng.standard_normal(8).astype(np.float32),
                **{
                    f: tower_fz.imagebert_b(ex)[f]
                    for f in ("boxes", "features", "label_ids", "label_lens",
                              "num_boxes")
                },
            }
            for ex in product_exs
        ),
        tmp_path / "cat",
        shard_size=4,
    )
    ds = CatalogDataset(tmp_path / "cat")

    # pairs: every query x products [i, i+1]
    pair_q = [0, 0, 1, 1, 2, 2]
    pair_p = [0, 1, 1, 2, 2, 3]
    rows = ds.rows(np.asarray(pair_p))
    for model_name in ("imagebert_a", "imagebert_b", "imagebert_c", "lxmert"):
        spec = get_model(model_name)
        tok = (
            FullTokenizer.hf_style(VOCAB_PATH)
            if model_name == "lxmert"
            else google
        )
        fz = Featurizer(tok, labels, sen2forest=spec.sen2forest)
        featurize = fz.for_model(model_name)
        want = stack_examples([
            featurize(dataclasses.replace(
                product_exs[p],
                query=query_exs[q].query,
                query_id=query_exs[q].query_id,
            ))
            for q, p in zip(pair_q, pair_p)
        ])
        got = rerank_batch(
            model_name,
            [fz.query_token_ids(query_exs[q]) for q in pair_q],
            np.asarray([query_exs[q].query_id for q in pair_q], np.int64),
            rows,
        )
        assert set(got) == set(want), model_name
        for key in want:
            if key == "features":
                np.testing.assert_array_equal(
                    got[key], want[key].astype(np.float16).astype(np.float32),
                    err_msg=f"{model_name}.{key}",
                )
            else:
                assert got[key].dtype == np.asarray(want[key]).dtype, (
                    model_name, key, got[key].dtype, np.asarray(want[key]).dtype)
                np.testing.assert_array_equal(
                    got[key], want[key], err_msg=f"{model_name}.{key}"
                )


def test_rerank_batch_label_lens_fallback(tmp_path):
    """Catalogs built before label_lens was stored fall back to the id-grid
    mask sum (capped at MAX_LABEL_TOKENS)."""
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import rerank_batch

    rows = {
        "product_id": np.arange(2, dtype=np.int64),
        "num_boxes": np.array([2, 1], np.int32),
        "boxes": np.zeros((2, 10, 5), np.float32),
        "features": np.zeros((2, 10, 16), np.float32),
        "label_ids": np.zeros((2, 10, 8), np.int32),
    }
    rows["label_ids"][0, 0, :3] = [5, 6, 7]
    rows["label_ids"][1, 0, :8] = 9
    got = rerank_batch(
        "imagebert_b", [[101, 102], [101, 103]], np.zeros(2, np.int64), rows
    )
    np.testing.assert_array_equal(got["label_lens"][0], [3] + [0] * 9)
    np.testing.assert_array_equal(got["label_lens"][1], [8] + [0] * 9)


def test_recall_cli_packed_roundtrip(tmp_path):
    """recall.py build --packed -> query + curve from the packed dir."""
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.synthetic import (
        SYNTHETIC_LABELS,
        make_tsv,
    )

    tsv = tmp_path / "pairs.tsv"
    tsv.write_text("\n".join(make_tsv(24, seed=11)) + "\n")
    labels = tmp_path / "labels.txt"
    labels.write_text(
        "\n".join(f"{k}\t{v}" for k, v in SYNTHETIC_LABELS.items()) + "\n"
    )
    env = {"KMR_TOWER_CONFIG_OVERRIDES": json.dumps(
        {"bert": {"vocab_size": 21128, "hidden_size": 32,
                  "num_hidden_layers": 1, "num_attention_heads": 4,
                  "intermediate_size": 37, "max_position_embeddings": 64},
         "embed_dim": 16}
    )}
    import os

    env = {**os.environ, **env, "JAX_PLATFORMS": "cpu"}
    cat = tmp_path / "cat"
    r = subprocess.run(
        [sys.executable, "scripts/recall.py", "build", "--tsv", str(tsv),
         "--labels", str(labels), "--out", str(cat), "--packed",
         "--store-features", "--shard-size", "10"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    ds = CatalogDataset(cat)
    assert "features" in ds.fields  # rerank features stored alongside
    out = tmp_path / "recall.tsv"
    r = subprocess.run(
        [sys.executable, "scripts/recall.py", "query", "--tsv", str(tsv),
         "--labels", str(labels), "--catalog", str(cat), "--out", str(out),
         "--k", "3", "--chunk-rows", "8"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    lines = out.read_text().splitlines()
    assert len(lines) == 24
    pids = set(int(p) for p in ds.product_ids())
    for ln in lines:
        _, tops = ln.split("\t")
        assert all(int(p) in pids for p in tops.split(","))
