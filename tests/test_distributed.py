"""Multi-host helpers: input sharding, local->global batch assembly, and
the packed dataset's per-process stride (single-controller pod semantics,
exercised single-process -- the real pod path reuses exactly these calls)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import (
    PackedDataset,
    write_packed_shards,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.parallel import (
    DATA_AXIS,
    batch_sharding,
    global_batch_from_local,
    local_rows,
    make_mesh,
    process_shard,
)


def test_process_shard_round_robin():
    files = [f"train{i}.tsv" for i in range(10)]
    slices = [process_shard(files, process_id=p, process_count=4) for p in range(4)]
    assert slices[0] == (["train0.tsv", "train4.tsv", "train8.tsv"], False)
    # disjoint cover, no line striding needed
    flat = [f for s, stride in slices for f in s]
    assert sorted(flat) == sorted(files)
    assert not any(stride for _, stride in slices)
    # more hosts than files: everyone reads everything + line striding
    assert process_shard(["a.tsv"], process_id=3, process_count=4) == (
        ["a.tsv"], True
    )


def test_stride_lines_disjoint_cover():
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.parallel.distributed import (
        stride_lines,
    )

    lines = [f"row{i}" for i in range(11)]
    slices = [
        list(stride_lines(iter(lines), process_id=p, process_count=3))
        for p in range(3)
    ]
    assert slices[0] == ["row0", "row3", "row6", "row9"]
    flat = [l for s in slices for l in s]
    assert sorted(flat) == sorted(lines)
    assert len(set(flat)) == len(lines)


def test_local_rows():
    assert local_rows(256, process_id=0, process_count=8) == 32
    with pytest.raises(AssertionError):
        local_rows(100, process_id=0, process_count=8)


def test_global_batch_single_process_identity():
    mesh = make_mesh()
    batch = {"x": np.arange(32, dtype=np.int32).reshape(16, 2)}
    out = global_batch_from_local(mesh, batch)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
    assert out["x"].sharding == batch_sharding(mesh)
    assert mesh.shape[DATA_AXIS] == 8  # the virtual CPU mesh from conftest


def _tiny_examples(n):
    rng = np.random.default_rng(0)
    for i in range(n):
        yield {
            "row_id": np.int64(i),
            "vec": rng.standard_normal(4).astype(np.float32),
        }


def test_packed_process_stride_disjoint_cover(tmp_path):
    write_packed_shards(_tiny_examples(37), tmp_path / "p", shard_size=10,
                        feature_dtype=None)
    ds = PackedDataset(tmp_path / "p")
    seen = []
    for pid in range(3):
        ids = [
            int(r)
            for b in ds.batches(4, epochs=1, seed=9, drop_remainder=False,
                                process_id=pid, process_count=3)
            for r in b["row_id"]
        ]
        seen.append(set(ids))
        assert len(ids) == len(seen[-1])  # no dup within a process
    assert seen[0] | seen[1] | seen[2] == set(range(37))
    assert not (seen[0] & seen[1]) and not (seen[1] & seen[2]) and not (
        seen[0] & seen[2]
    )
