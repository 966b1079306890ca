"""Packed training-instance shards: build -> memmap -> multi-epoch batches.

The pretrain-scale data format replacing the reference's TFRecord generator
(``imagebert_zk/generate_data.py``): materialize the online sampler once,
then iterate epochs from memory-mapped per-field .npy shards.
"""

import numpy as np
import pytest

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu import VOCAB_PATH
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import (
    Featurizer,
    HardNegativeSampler,
    PackedDataset,
    QueryLabelIndex,
    SamplerConfig,
    write_packed_shards,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.synthetic import (
    SYNTHETIC_LABELS,
    SYNTHETIC_QUERIES,
    make_tsv,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.tokenization import FullTokenizer


@pytest.fixture(scope="module")
def sampler_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("packed_src")
    (d / "train.tsv").write_text("\n".join(make_tsv(40, seed=3)) + "\n")
    (d / "query_labels.txt").write_text(
        "\n".join(
            f"{700000+i}\t{q}\tdress,others" for i, q in enumerate(SYNTHETIC_QUERIES)
        )
        + "\n"
    )
    tok = FullTokenizer.google_style(VOCAB_PATH)
    fz = Featurizer(tok, dict(SYNTHETIC_LABELS))
    qindex = QueryLabelIndex.load(d / "query_labels.txt")

    def examples():
        sampler = HardNegativeSampler(fz, qindex, SamplerConfig.imagebert_b(seed=5))
        with open(d / "train.tsv", "r", encoding="utf-8") as f:
            return list(sampler.examples(f))

    return examples


def test_roundtrip_bit_faithful(sampler_setup, tmp_path):
    want = sampler_setup()
    manifest = write_packed_shards(
        iter(want), tmp_path / "packed", shard_size=7, feature_dtype=np.float16
    )
    assert manifest["num_instances"] == len(want)
    assert len(manifest["shard_sizes"]) == -(-len(want) // 7)

    ds = PackedDataset(tmp_path / "packed")
    assert len(ds) == len(want)
    # identity order: batches with a permutation-free gather == write order
    got = list(ds.batches(1, epochs=1, seed=0))
    # order is a seeded shuffle; match instances on (features, input_ids) --
    # unique because pos/neg of one product share features but not query
    want_by_key = {
        np.asarray(w["features"], np.float16).tobytes() + w["input_ids"].tobytes(): w
        for w in want
    }
    assert len(want_by_key) == len(want)
    for b in got:
        k = b["features"][0].astype(np.float16).tobytes() + b["input_ids"][0].tobytes()
        w = want_by_key.pop(k)
        for field, arr in b.items():
            if field == "features":
                np.testing.assert_array_equal(
                    arr[0], np.asarray(w[field], np.float16).astype(np.float32)
                )
                assert arr.dtype == np.float32
            else:
                np.testing.assert_array_equal(arr[0], w[field])
    assert not want_by_key


def test_epoch_shuffling_and_coverage(sampler_setup, tmp_path):
    want = sampler_setup()
    write_packed_shards(iter(want), tmp_path / "p", shard_size=8)
    ds = PackedDataset(tmp_path / "p")
    n_batches = len(ds) // 4
    one = list(ds.batches(4, epochs=1, seed=0))
    two = list(ds.batches(4, epochs=2, seed=0))
    assert len(one) == n_batches and len(two) == 2 * n_batches
    # different epochs permute differently but cover the same instances
    e1 = b"".join(b["label_ids"].tobytes() for b in two[:n_batches])
    e2 = b"".join(b["label_ids"].tobytes() for b in two[n_batches:])
    assert e1 != e2
    flat1 = sorted(
        row.tobytes()
        for b in two[:n_batches]
        for row in b["features"].astype(np.float16)
    )
    flat2 = sorted(
        row.tobytes()
        for b in two[n_batches:]
        for row in b["features"].astype(np.float16)
    )
    # drop_remainder drops len(ds) % 4 instances per epoch -> compare counts
    assert len(flat1) == len(flat2) == n_batches * 4


def test_multihost_strides_equal_counts_and_disjoint(sampler_setup, tmp_path):
    """Every process must yield the SAME number of instances per epoch
    (advisor r2: otherwise hosts drift across epoch boundaries) and the
    per-process strides must be disjoint."""
    want = sampler_setup()
    write_packed_shards(iter(want), tmp_path / "p", shard_size=7)
    ds = PackedDataset(tmp_path / "p")
    n_proc = 3  # shard sizes 7 and the tail are NOT divisible by 3
    assert any(s % n_proc for s in ds.shard_sizes)
    keys_per_proc = []
    for pid in range(n_proc):
        keys = []
        for b in ds.batches(1, epochs=1, seed=9, process_id=pid,
                            process_count=n_proc):
            keys.append(
                b["features"][0].astype(np.float16).tobytes()
                + b["input_ids"][0].tobytes()
            )
        keys_per_proc.append(keys)
    counts = [len(k) for k in keys_per_proc]
    assert len(set(counts)) == 1, counts
    flat = [k for keys in keys_per_proc for k in keys]
    assert len(flat) == len(set(flat))  # disjoint
    # truncation drops at most (process_count - 1) instances per shard
    dropped = len(ds) - len(flat)
    assert dropped <= (n_proc - 1) * len(ds.shard_sizes)


def test_batches_refuses_oversized_batch(sampler_setup, tmp_path):
    """epochs=None + drop_remainder would otherwise spin forever when the
    (per-process) instance count is below batch_size."""
    want = sampler_setup()
    write_packed_shards(iter(want), tmp_path / "p", shard_size=16)
    ds = PackedDataset(tmp_path / "p")
    with pytest.raises(ValueError, match="exceeds"):
        next(ds.batches(len(ds) + 1, epochs=None))
    # per-process stride below batch_size must also refuse
    with pytest.raises(ValueError, match="exceeds"):
        next(ds.batches(len(ds) // 2 + 2, epochs=None,
                        process_id=0, process_count=3))


def test_train_step_from_packed(sampler_setup, tmp_path):
    jax = pytest.importorskip("jax")

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import (
        BertConfig,
        Precision,
        imagebert_b,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models.registry import (
        ModelSpec,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.train import (
        TrainConfig,
        Trainer,
    )

    write_packed_shards(iter(sampler_setup()), tmp_path / "p", shard_size=16)
    ds = PackedDataset(tmp_path / "p")
    cfg = BertConfig(
        vocab_size=21128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=41, max_position_embeddings=64,
    )
    spec = ModelSpec(
        "imagebert_b", cfg,
        init=lambda rng: imagebert_b.init_params(rng, cfg),
        apply=imagebert_b.apply, featurizer_layout="imagebert_b",
    )
    trainer = Trainer(
        spec,
        TrainConfig(optimizer="adam_staircase", clip="value", ema_decay=0.997),
        precision=Precision.f32(),
    )
    state = trainer.init_state(jax.random.key(0))
    batch = next(ds.batches(8, epochs=1, seed=1))
    batch = {k: v for k, v in batch.items() if not k.startswith(("masked_lm", "word_match"))}
    state, metrics = trainer.train_step(state, batch, jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))
    assert int(jax.device_get(state.step)) == 1
