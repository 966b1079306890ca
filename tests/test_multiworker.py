"""Multi-process host loader: same batches at EVERY worker count.

The reference's ``GeneratorEnqueuer`` (``imagebert_lds/src/data_util.py:
15-128``) makes the batch stream depend on worker scheduling; the rebuild
chunks the input deterministically instead, so the stream must be
bit-identical for 0 (inline), 1 and 2 workers -- and equal to the
per-example serial pipeline (one global padded tail).
"""

import numpy as np
import pytest

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu import VOCAB_PATH
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import Featurizer
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.multiworker import (
    MultiWorkerLoader,
    chunk_spans,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.pipeline import (
    PipelineStats,
    iter_batches,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.synthetic import (
    SYNTHETIC_LABELS,
    make_tsv,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.tokenization import (
    FullTokenizer,
)

BATCH = 8


@pytest.fixture(scope="module")
def featurizer():
    return Featurizer(
        FullTokenizer.google_style(VOCAB_PATH), dict(SYNTHETIC_LABELS)
    )


@pytest.fixture(scope="module")
def tsv_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("mw")
    p1 = d / "a.tsv"
    p2 = d / "b.tsv"
    p1.write_text("\n".join(make_tsv(37, seed=3, header=False)) + "\n")
    p2.write_text("\n".join(make_tsv(21, seed=4, header=False)) + "\n")
    return [str(p1), str(p2)]


def batches_equal(bs1, bs2):
    assert len(bs1) == len(bs2)
    for b1, b2 in zip(bs1, bs2):
        assert set(b1) == set(b2)
        for k in b1:
            np.testing.assert_array_equal(b1[k], b2[k], err_msg=k)


def test_chunk_spans_cover_exactly(tsv_files):
    import os

    spans = chunk_spans(tsv_files, chunk_bytes=4096)
    assert len(spans) > 4  # small chunks -> real parallelism in the test
    for path in tsv_files:
        mine = [(s, e) for p, s, e in spans if p == path]
        assert mine[0][0] == 0
        assert mine[-1][1] == os.path.getsize(path)
        for (s1, e1), (s2, e2) in zip(mine, mine[1:]):
            assert e1 == s2  # contiguous, no gap/overlap


def _shm_names():
    import os

    try:
        return {n for n in os.listdir("/dev/shm") if n.startswith("psm_")}
    except FileNotFoundError:  # non-POSIX-shm host
        return set()


def test_worker_counts_agree_and_match_serial(tsv_files, featurizer):
    def run(workers, use_native=None, use_shm=True):
        stats = PipelineStats()
        loader = MultiWorkerLoader(
            tsv_files, featurizer, "imagebert_b", BATCH,
            num_workers=workers, chunk_bytes=4096, stats=stats,
            use_native=use_native, use_shm=use_shm,
        )
        return list(loader), stats

    before = _shm_names()
    inline, st0 = run(0)
    one, st1 = run(1)
    two, st2 = run(2)
    batches_equal(inline, one)
    batches_equal(inline, two)
    assert st0.parsed == st1.parsed == st2.parsed == 58
    assert st0.errors == st1.errors == st2.errors == 0

    # the pickling-queue fallback transfer produces the same stream
    pickled, _ = run(2, use_shm=False)
    batches_equal(inline, pickled)

    # every per-span shared-memory block was consumed and removed
    assert _shm_names() - before == set()

    # equal to the per-example serial pipeline: batching crosses file and
    # chunk boundaries with ONE padded tail
    def lines():
        for p in tsv_files:
            with open(p, "r", encoding="utf-8") as f:
                yield from f

    serial = list(
        iter_batches(lines(), featurizer.for_model("imagebert_b"), BATCH)
    )
    batches_equal(inline, serial)

    # python fallback path agrees too (exercises featurize_span's
    # per-example branch through the worker pool)
    py, _ = run(2, use_native=False)
    batches_equal(inline, py)


def test_parse_errors_counted_not_fatal(tmp_path, featurizer):
    rows = make_tsv(10, seed=7, header=False)
    rows.insert(3, "corrupt\tline")
    p = tmp_path / "bad.tsv"
    p.write_text("\n".join(rows) + "\n")
    stats = PipelineStats()
    loader = MultiWorkerLoader(
        [str(p)], featurizer, "imagebert_b", BATCH,
        num_workers=1, chunk_bytes=4096, stats=stats,
    )
    got = sum(int(b["valid"].sum()) for b in loader)
    assert got == 10
    assert stats.parsed == 10
    assert stats.errors == 1


def test_worker_failure_propagates(tmp_path, featurizer):
    p = tmp_path / "gone.tsv"
    p.write_text("\n".join(make_tsv(5, seed=9, header=False)) + "\n")
    loader = MultiWorkerLoader(
        [str(p)], featurizer, "imagebert_b", BATCH, num_workers=1,
    )
    p.unlink()  # spans were not computed yet -> __iter__ fails cleanly
    with pytest.raises((RuntimeError, FileNotFoundError)):
        list(loader)
