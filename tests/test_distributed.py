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
    counts, seen = [], []
    for pid in range(3):
        ids = [
            int(r)
            for b in ds.batches(4, epochs=1, seed=9, drop_remainder=False,
                                process_id=pid, process_count=3)
            for r in b["row_id"]
        ]
        counts.append(len(ids))
        seen.append(set(ids))
        assert len(ids) == len(seen[-1])  # no dup within a process
    # equal per-process counts (unequal counts desync pod collectives --
    # advisor r2) at the cost of dropping < process_count rows per shard...
    assert len(set(counts)) == 1, counts
    covered = seen[0] | seen[1] | seen[2]
    assert len(covered) >= 37 - 2 * len(ds.shard_sizes)
    assert not (seen[0] & seen[1]) and not (seen[1] & seen[2]) and not (
        seen[0] & seen[2]
    )
    # ...and each epoch's permutation drops a different subset, so a few
    # epochs cover everything
    multi = set()
    for pid in range(3):
        for b in ds.batches(4, epochs=3, seed=9, drop_remainder=False,
                            process_id=pid, process_count=3):
            multi.update(int(r) for r in b["row_id"])
    assert multi == set(range(37))


def test_two_process_distributed_train_step(tmp_path):
    """REAL multi-process jax.distributed on CPU: 2 subprocesses x 4 virtual
    devices, localhost coordinator. Each contributes half the global batch
    via Trainer.train_step -> global_batch_from_local's
    make_array_from_process_local_data branch, which a single process can
    never execute. Losses/params must agree across the two processes and
    match the single-process oracle over the same 8-device global mesh."""
    import json
    import socket
    import subprocess
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    worker = root / "tests" / "distributed_worker.py"
    with socket.socket() as s:  # free localhost port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {
        k: v for k, v in __import__("os").environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port),
             str(tmp_path / f"p{pid}.json")],
            cwd=root, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, err[-3000:]
    r0 = json.loads((tmp_path / "p0.json").read_text())
    r1 = json.loads((tmp_path / "p1.json").read_text())
    assert r0["process_count"] == r1["process_count"] == 2
    # the two processes ran ONE shared computation: results are identical
    assert r0["loss"] == r1["loss"]
    assert r0["checksum"] == r1["checksum"]

    # single-process oracle: same global batch on an 8-device local mesh
    p = subprocess.run(
        [sys.executable, str(worker), "0", "1", "0",
         str(tmp_path / "single.json")],
        cwd=root, env=env, capture_output=True, text=True, timeout=420,
    )
    assert p.returncode == 0, p.stderr[-3000:]
    ref = json.loads((tmp_path / "single.json").read_text())
    assert abs(r0["loss"] - ref["loss"]) < 1e-6, (r0["loss"], ref["loss"])
    assert abs(r0["checksum"] - ref["checksum"]) / max(abs(ref["checksum"]), 1.0) < 1e-7
