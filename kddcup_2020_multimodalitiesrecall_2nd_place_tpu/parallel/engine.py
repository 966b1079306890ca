"""The pjit scoring engine: streams TSV pairs through a sharded jitted model.

Replaces the reference's per-batch ``sess.run`` feed-dict loops
(``run_pretraining_predict_score.py:566-576``, ``evaluate_normal.py:222-249``)
with one compiled XLA program per model: fixed batch shape (tail padded +
valid mask), params resident in HBM, batches device_put with a ``data``-axis
sharding so the same code runs 1-chip or N-chip. The host pipeline
(tokenize/decode) runs ahead on a prefetch thread; device dispatch is async
so host and TPU overlap.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Iterable, Iterator

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data import Featurizer, PipelineStats, batches_from_files
from ..models import ModelSpec, Precision
from .mesh import DATA_AXIS, batch_sharding, make_mesh, replicated

META_KEYS = ("product_id", "query_id", "valid")


@dataclass
class ScoringStats:
    pairs: int = 0
    batches: int = 0
    seconds: float = 0.0
    pipeline: PipelineStats = field(default_factory=PipelineStats)

    @property
    def pairs_per_second(self) -> float:
        return self.pairs / self.seconds if self.seconds > 0 else 0.0


import warnings
from contextlib import contextmanager


@contextmanager
def _quiet_partial_donation():
    # batch donation hands XLA the big f32 feature buffers for reuse; the
    # int32 token-id leaves can never alias an f32 output, and jax warns
    # about each. That mixed-dtype donation is deliberate -- silence exactly
    # that warning, scoped to THIS engine's dispatch (a process-wide filter
    # installed at import would also hide genuine donation failures in
    # unrelated jit call sites, e.g. a sharding mismatch silently doubling
    # a training step's memory).
    with warnings.catch_warnings():
        warnings.filterwarnings(
            "ignore", message="Some donated buffers were not usable"
        )
        yield


class ScoringEngine:
    """Compiled pairwise scorer for one model over a device mesh."""

    def __init__(
        self,
        model: ModelSpec,
        params,
        mesh: Mesh | None = None,
        precision: Precision = Precision.bf16(),
        donate_batch: bool = True,
        attention_backend: str | None = None,
    ):
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh()
        self.precision = precision
        if attention_backend is None:
            # the Pallas batch-blocked kernel wins ~20% whole-model on TPU in
            # bf16; strict-parity f32 and non-TPU backends stay on XLA
            on_tpu = self.mesh.devices.flat[0].platform == "tpu"
            attention_backend = (
                "pallas_packed" if on_tpu and precision.compute_dtype != jnp.float32 else "xla"
            )
        from ..ops.attention import attention_backend as backend_ctx

        self._backend_ctx = backend_ctx
        self.attention_backend = attention_backend
        self.params = jax.device_put(params, replicated(self.mesh))
        self._batch_sharding = batch_sharding(self.mesh)

        out_sharding = NamedSharding(self.mesh, P(DATA_AXIS))

        @partial(
            jax.jit,
            out_shardings=out_sharding,
            donate_argnums=(1,) if donate_batch else (),
        )
        def _score(params, batch):
            feats = {k: v for k, v in batch.items() if k not in META_KEYS}
            return model.apply(params, feats, model.config, precision)["score"]

        self._score = _score

        # whole-dataset path: [n_batches, batch_size, ...] stacks, lax.map
        # over the leading axis, each inner batch split over the data axis.
        # Defined once here so repeat calls hit the same jit cache entry.
        stacked_sharding = NamedSharding(self.mesh, P(None, DATA_AXIS))
        self._stacked_sharding = stacked_sharding

        @partial(jax.jit, out_shardings=stacked_sharding)
        def _score_all(params, stacked):
            return jax.lax.map(
                lambda b: model.apply(params, b, model.config, precision)["score"],
                stacked,
            )

        self._score_all = _score_all

    def update_params(self, params) -> None:
        """Swap in new weights (e.g. EMA shadows during a training run's
        valid loop) without retracing: shapes unchanged -> same executable."""
        self.params = jax.device_put(params, replicated(self.mesh))

    def score_batch(self, batch: dict) -> jax.Array:
        device_batch = {
            k: jax.device_put(v, self._batch_sharding)
            for k, v in batch.items()
            if k not in ("product_id", "query_id")
        }
        # the backend global is read at trace time; scope it so engines with
        # different backends can coexist (traces are cached afterwards)
        with self._backend_ctx(self.attention_backend), _quiet_partial_donation():
            return self._score(self.params, device_batch)

    def score_stream(
        self, batches: Iterable[dict], stats: ScoringStats | None = None
    ) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """-> (query_ids, product_ids, scores) per batch, valid rows only.

        Keeps one batch in flight: batch N+1 is dispatched before batch N's
        scores are pulled back to the host, overlapping host transfer,
        device compute and the D2H copy.
        """
        stats = stats if stats is not None else ScoringStats()
        pending = None  # (qid, pid, valid, device_scores)
        t0 = time.perf_counter()
        for batch in batches:
            qid, pid, valid = batch["query_id"], batch["product_id"], batch["valid"]
            scores = self.score_batch(batch)
            if pending is not None:
                yield self._finish(pending, stats)
            pending = (qid, pid, valid, scores)
        if pending is not None:
            yield self._finish(pending, stats)
        stats.seconds = time.perf_counter() - t0

    @staticmethod
    def _finish(pending, stats: ScoringStats):
        qid, pid, valid, scores = pending
        scores = np.asarray(scores)[valid]
        stats.pairs += int(valid.sum())
        stats.batches += 1
        return qid[valid], pid[valid], scores

    def score_stacked(self, stacked_batches: dict) -> np.ndarray:
        """Score many batches in ONE device dispatch (lax.map over the
        leading batch-of-batches axis). Amortises per-dispatch latency --
        the right shape for bulk jobs where the whole dataset is staged in
        HBM (testB is ~1.2 GB of bf16 features).

        stacked_batches: dict of [n_batches, batch_size, ...] arrays
        (meta keys excluded). -> scores [n_batches, batch_size].
        """
        with self._backend_ctx(self.attention_backend):
            device_batches = {
                k: jax.device_put(v, self._stacked_sharding)
                for k, v in stacked_batches.items()
                if k not in META_KEYS
            }
            return np.asarray(self._score_all(self.params, device_batches))

    def score_files(
        self,
        paths,
        featurizer: Featurizer,
        batch_size: int,
        stats: ScoringStats | None = None,
        use_native: bool | None = None,
        num_workers: int = 0,
    ) -> dict[str, dict[str, float]]:
        """Full scorer run: files -> {query_id: {product_id: score}}.

        ``use_native=None`` tries the C++ fused parser and falls back to the
        per-example python pipeline if the library cannot build.
        ``num_workers > 0`` parses+featurizes in that many worker PROCESSES
        (``data/multiworker.py``; the reference's ``GeneratorEnqueuer``
        role) -- needed when one core's ~4k rows/s cannot feed the chip.
        """
        stats = stats if stats is not None else ScoringStats()
        batches = None
        if num_workers:
            from ..data.multiworker import MultiWorkerLoader
            from ..data.pipeline import PrefetchIterator

            batches = PrefetchIterator(
                iter(MultiWorkerLoader(
                    paths, featurizer, self.model.featurizer_layout,
                    batch_size, num_workers=num_workers,
                    stats=stats.pipeline, use_native=use_native,
                )),
                prefetch=4,
            )
        elif use_native or use_native is None:
            try:
                # probe eagerly: generators/prefetch threads surface failures
                # only at iteration time, too late to fall back
                from ..data.native import get_lib

                get_lib()
                from ..data.fast_pipeline import native_batches_from_files
                from ..data.pipeline import PrefetchIterator

                # key batch assembly on the LAYOUT, not the model name:
                # two_tower scores with imagebert_b-layout batches and has
                # no entry of its own (C maps to b the same way)
                batches = PrefetchIterator(
                    native_batches_from_files(
                        paths, featurizer, self.model.featurizer_layout,
                        batch_size, stats=stats.pipeline,
                    ),
                    prefetch=4,
                )
            except Exception:
                if use_native:
                    raise
        if batches is None:
            fz = featurizer.for_model(self.model.featurizer_layout)
            batches = batches_from_files(paths, fz, batch_size, stats=stats.pipeline)
        result: dict[str, dict[str, float]] = {}
        t0 = time.perf_counter()
        for qids, pids, scores in self.score_stream(batches, stats):
            for q, p, s in zip(qids, pids, scores):
                result.setdefault(str(q), {})[str(p)] = float(s)
        stats.seconds = time.perf_counter() - t0
        return result


def write_scores_tsv(result: dict[str, dict[str, float]], path) -> None:
    """qid\\tpid\\tscore rows (the ImageBERT score-file format)."""
    with open(path, "w", encoding="utf-8") as f:
        for qid, row in result.items():
            for pid, s in row.items():
                f.write(f"{qid}\t{pid}\t{s}\n")


def write_scores_csv(result: dict[str, dict[str, float]], path) -> None:
    """LXMERT score-file format with header."""
    with open(path, "w", encoding="utf-8") as f:
        f.write("query-id,product-id,score\n")
        for qid, row in result.items():
            for pid, s in row.items():
                f.write(f"{qid},{pid},{s}\n")
