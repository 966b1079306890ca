"""Scoring-engine tests on the 8-device CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu import VOCAB_PATH
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import Featurizer
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.synthetic import (
    SYNTHETIC_LABELS,
    make_tsv,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import (
    BertConfig,
    Precision,
    imagebert_a,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models.registry import ModelSpec
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.parallel import (
    ScoringEngine,
    ScoringStats,
    make_mesh,
    write_scores_csv,
    write_scores_tsv,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.tokenization import FullTokenizer

TINY = BertConfig(
    vocab_size=21128,  # real vocab so tokenised ids are valid
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=37,
    max_position_embeddings=64,
)


@pytest.fixture(scope="module")
def spec():
    return ModelSpec(
        "imagebert_a",
        TINY,
        init=lambda rng: imagebert_a.init_params(rng, TINY),
        apply=imagebert_a.apply,
        featurizer_layout="imagebert_a",
    )


@pytest.fixture(scope="module")
def featurizer():
    tok = FullTokenizer.google_style(VOCAB_PATH)
    return Featurizer(tok, SYNTHETIC_LABELS)


def test_engine_scores_all_pairs(spec, featurizer, tmp_path):
    mesh = make_mesh()
    params = spec.init_params(jax.random.key(0))
    engine = ScoringEngine(spec, params, mesh=mesh, precision=Precision.f32())

    n_rows = 21  # not divisible by batch: exercises tail padding
    lines = make_tsv(n_rows, seed=0)
    tsv = tmp_path / "test.tsv"
    tsv.write_text("\n".join(lines) + "\n")

    stats = ScoringStats()
    result = engine.score_files([tsv], featurizer, batch_size=8, stats=stats)
    total = sum(len(v) for v in result.values())
    assert total == n_rows
    assert stats.pairs == n_rows
    assert stats.pipeline.parsed == n_rows

    # scores must match a direct single-batch apply
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import iter_batches

    batch = next(iter_batches(lines, featurizer.imagebert_a, n_rows))
    feats = {
        k: v
        for k, v in batch.items()
        if k not in ("product_id", "query_id", "valid")
    }
    direct = np.asarray(spec.apply(params, feats, TINY, Precision.f32())["score"])
    for i in range(n_rows):
        q = str(batch["query_id"][i])
        p = str(batch["product_id"][i])
        assert result[q][p] == pytest.approx(direct[i], abs=1e-5)


def test_engine_multiworker_loader_same_scores(spec, featurizer, tmp_path):
    """score_files(num_workers=2) == the default in-process pipeline: the
    multi-process loader (data/multiworker.py) changes WHO featurizes,
    never what reaches the device."""
    params = spec.init_params(jax.random.key(0))
    engine = ScoringEngine(spec, params, precision=Precision.f32())
    lines = make_tsv(21, seed=0)
    tsv = tmp_path / "test.tsv"
    tsv.write_text("\n".join(lines) + "\n")

    base = engine.score_files([tsv], featurizer, batch_size=8)
    stats = ScoringStats()
    mw = engine.score_files(
        [tsv], featurizer, batch_size=8, stats=stats, num_workers=2
    )
    assert stats.pipeline.parsed == 21
    assert mw.keys() == base.keys()
    for q in base:
        assert mw[q].keys() == base[q].keys()
        for p in base[q]:
            assert mw[q][p] == pytest.approx(base[q][p], abs=1e-6)


def test_score_file_formats(tmp_path):
    result = {"1": {"101": 0.5, "102": 0.25}, "2": {"103": 1.0}}
    t = tmp_path / "s.tsv"
    c = tmp_path / "s.csv"
    write_scores_tsv(result, t)
    write_scores_csv(result, c)
    lines = t.read_text().splitlines()
    assert lines[0].split("\t") == ["1", "101", "0.5"]
    csv_lines = c.read_text().splitlines()
    assert csv_lines[0] == "query-id,product-id,score"
    assert csv_lines[1] == "1,101,0.5"


def test_score_stacked_matches_per_batch(spec, featurizer, tmp_path):
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import iter_batches

    params = spec.init_params(jax.random.key(1))
    engine = ScoringEngine(spec, params, precision=Precision.f32())
    lines = make_tsv(16, seed=3)
    batches = list(iter_batches(lines, featurizer.imagebert_a, 8))
    per_batch = [np.asarray(engine.score_batch(dict(b))) for b in batches]
    stacked = {
        k: np.stack([b[k] for b in batches])
        for k in batches[0]
        if k not in ("product_id", "query_id")
    }
    all_scores = engine.score_stacked(stacked)
    assert all_scores.shape == (2, 8)
    np.testing.assert_allclose(all_scores, np.stack(per_batch), atol=1e-5)

    # one trace per engine: a second call must reuse the cached executable
    before = engine._score_all._cache_size()
    again = engine.score_stacked(stacked)
    np.testing.assert_allclose(again, all_scores, atol=0)
    assert engine._score_all._cache_size() == before == 1

    # and the stacked batch rides the mesh: inner batch axis sharded over
    # all data-axis devices (8 virtual CPU devices in the suite)
    device_stacked = {
        k: jax.device_put(v, engine._stacked_sharding) for k, v in stacked.items()
    }
    n_data = engine.mesh.shape["data"]
    assert len(device_stacked["input_ids"].sharding.device_set) == n_data
    assert n_data == 8
