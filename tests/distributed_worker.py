"""Worker for the REAL 2-process jax.distributed test (run as a subprocess).

Each process owns 4 virtual CPU devices (8 global), initializes the
localhost coordinator, contributes its half of a deterministic global batch
through ``Trainer.train_step`` -- which routes through
``global_batch_from_local``'s ``make_array_from_process_local_data`` branch
(`parallel/distributed.py:120-122`), the path a single-process suite can
never execute -- and writes loss + a parameter checksum for the test to
compare across processes and against the single-process oracle.

Usage: python tests/distributed_worker.py <pid> <nprocs> <port> <out.json>
(single-process oracle: nprocs=1 with 8 local devices, no coordinator).
"""

import json
import os
import sys


def main() -> None:
    pid, nprocs, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    per_proc = 8 // nprocs
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={per_proc} "
        + os.environ.get("XLA_FLAGS", "")
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")
    if nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs,
            process_id=pid,
        )
        assert jax.process_count() == nprocs
        assert len(jax.devices()) == 8  # global view

    import numpy as np

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import (
        BertConfig,
        Precision,
        imagebert_b,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models.registry import (
        ModelSpec,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.parallel import make_mesh
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.parallel.distributed import (
        local_rows,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.train import Trainer

    cfg = BertConfig(
        vocab_size=211, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=41,
        max_position_embeddings=64,
    )
    spec = ModelSpec(
        "imagebert_b", cfg,
        init=lambda rng: imagebert_b.init_params(rng, cfg),
        apply=imagebert_b.apply, featurizer_layout="imagebert_b",
    )

    global_b = 16
    rng = np.random.default_rng(7)  # same stream on every process
    full = {
        "input_ids": rng.integers(0, 211, (global_b, 20)).astype(np.int32),
        "len_query": rng.integers(3, 21, (global_b,)).astype(np.int32),
        "boxes": rng.standard_normal((global_b, 10, 5)).astype(np.float32),
        "features": rng.standard_normal((global_b, 10, 2048)).astype(np.float32),
        "label_ids": rng.integers(0, 211, (global_b, 10, 8)).astype(np.int32),
        "num_boxes": rng.integers(1, 11, (global_b,)).astype(np.int32),
        "segment_ids": np.concatenate(
            [np.zeros((global_b, 20), np.int32), np.ones((global_b, 10), np.int32)],
            axis=1,
        ),
        "labels": (rng.random(global_b) < 0.5).astype(np.int32),
    }
    rows = local_rows(global_b, process_id=pid, process_count=nprocs)
    local = {k: v[pid * rows : (pid + 1) * rows] for k, v in full.items()}

    mesh = make_mesh()
    trainer = Trainer(spec, precision=Precision.f32(), mesh=mesh)
    state = trainer.init_state(jax.random.key(0))
    for step in range(2):
        state, metrics = trainer.train_step(state, local, jax.random.key(step))
    # fully-replicated params: every process can read its local copy
    checksum = float(
        sum(float(jax.numpy.sum(jax.numpy.abs(x))) for x in jax.tree.leaves(state.params))
    )
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(
            {
                "pid": pid,
                "process_count": jax.process_count(),
                "loss": float(metrics["loss"]),
                "accuracy": float(metrics["accuracy"]),
                "checksum": checksum,
            },
            f,
        )


if __name__ == "__main__":
    main()
