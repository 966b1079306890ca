"""Multi-process host input pipeline: N worker processes feed one chip.

TPU-native equivalent of the reference's ``GeneratorEnqueuer``
(``imagebert_lds/src/data_util.py:15-128``, byte-identical copy in
``imagebert_zk``): there, N worker processes run the SAME python
generator with a per-worker seed bump and push finished batches into a
bounded ``multiprocessing.Queue`` (consumed via ``get_batch``,
``load_data_pred.py:265-282``), so the batch stream depends on worker
count and scheduling. Here the input is deterministically CHUNKED
instead: workers parse+featurize fixed byte-spans (split at line
boundaries), the consumer reassembles spans in order and slices batches
-- so the batch stream is bit-identical for EVERY worker count,
including 0 (inline, no processes).

Why processes and not threads: the hot work is base64/geometry decode
(native, GIL-releasing) plus WordPiece tokenization and numpy assembly
(GIL-bound). The repo's own measurement (docs/BENCH.md host table) pins
the full pipeline at ~3.5-4.4k rows/s/core against ~25k pairs/s/chip of
device capacity -- one chip needs ~6 loader cores, which a single
prefetch thread (``pipeline.PrefetchIterator``) cannot deliver.

Workers spawn with a sanitized environment (``PYTHONPATH`` cleared,
``JAX_PLATFORMS=cpu``): they import only numpy + the jax-free ``data``
modules, never initialise a TPU backend, and bypass any site hook that
would (this rig's axon sitecustomize can hang interpreter start while a
TPU job is wedged -- ROADMAP.md "Known quirks").

Span hand-off rides POSIX shared memory by default (``use_shm``): one
memcpy into a per-span block in the worker, one out in the consumer,
instead of pickling ~82 KB/row of RoI features through a pipe both ways
(the reference's ``GeneratorEnqueuer`` pays that pickle for every batch).
Falls back to the pickling queue per span if /dev/shm is unavailable.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import traceback
from pathlib import Path
from typing import Iterator

import numpy as np

from .featurize import Featurizer, pad_batch, stack_examples
from .pipeline import PipelineStats, iter_examples

DEFAULT_CHUNK_BYTES = 32 << 20  # ~500 rows of testB-sized pairs


# ------------------------------------------------------------- shm transfer
# A featurized span is ~82 KB/row (RoI features dominate); pickling that
# through a ``mp.Queue`` pipe costs a serialize + two pipe syscall copies +
# a deserialize per span. Packing the arrays into one POSIX shared-memory
# block instead makes the hand-off one memcpy in (worker) and one out
# (consumer). Lifecycle on 3.12 (no ``track=`` until 3.13): BOTH opener
# sides auto-register with the resource tracker, so the worker unregisters
# after filling (the consumer owns the block from then on) and the
# consumer's ``unlink()`` unregisters its own registration. A hard-killed
# consumer can leak blocks in /dev/shm; ``_spans_pooled``'s cleanup drains
# every queued/undelivered block on the normal and error paths.

def _shm_pack(full: dict[str, np.ndarray]):
    """Copy a span's arrays into one shm block -> (name, metas)."""
    from multiprocessing import resource_tracker, shared_memory

    metas = []
    total = 0
    for k, v in full.items():
        metas.append((k, v.shape, v.dtype.str, total))
        total += int(v.nbytes)
    shm = shared_memory.SharedMemory(create=True, size=max(total, 1))
    try:
        for (k, shape, dt, off), v in zip(metas, full.values()):
            np.ndarray(shape, dtype=dt, buffer=shm.buf, offset=off)[...] = v
    except BaseException:
        shm.close()
        shm.unlink()  # unlink also drops the tracker registration
        raise
    name = shm.name
    # the consumer owns the block from here; drop this process's tracker
    # registration so worker exit can't reap a block the consumer is
    # about to read (3.12 auto-registers every opener)
    resource_tracker.unregister(shm._name, "shared_memory")
    shm.close()
    return name, metas


def _shm_unpack(name: str, metas) -> dict[str, np.ndarray]:
    """Copy arrays out of a shm block and remove it."""
    from multiprocessing import shared_memory

    shm = shared_memory.SharedMemory(name=name)
    try:
        return {
            k: np.ndarray(shape, dtype=dt, buffer=shm.buf, offset=off).copy()
            for k, shape, dt, off in metas
        }
    finally:
        shm.close()
        shm.unlink()  # also unregisters the attach-side registration


def _shm_drop(name: str) -> None:
    """Best-effort removal of an unconsumed block (error/teardown path)."""
    from multiprocessing import shared_memory

    try:
        shm = shared_memory.SharedMemory(name=name)
    except FileNotFoundError:
        return
    shm.close()
    try:
        shm.unlink()
    except FileNotFoundError:
        pass


def chunk_spans(
    paths, chunk_bytes: int = DEFAULT_CHUNK_BYTES
) -> list[tuple[str, int, int]]:
    """Split files into (path, start, end) byte spans at line boundaries.

    The split is a pure function of (paths, chunk_bytes) -- worker count
    never changes it, which is what makes the loader's output
    deterministic.
    """
    spans: list[tuple[str, int, int]] = []
    for path in paths:
        size = os.path.getsize(path)
        with open(path, "rb") as f:
            start = 0
            while start < size:
                target = start + chunk_bytes
                if target >= size:
                    end = size
                else:
                    f.seek(target)
                    f.readline()  # advance to the next line boundary
                    end = f.tell()
                spans.append((str(Path(path)), start, end))
                start = end
    return spans


def featurize_span(
    path: str,
    start: int,
    end: int,
    featurizer: Featurizer,
    layout: str,
    use_native: bool = True,
) -> tuple[dict[str, np.ndarray], int, int]:
    """Parse+featurize one byte span -> (full arrays, parsed, errors)."""
    with open(path, "rb") as f:
        f.seek(start)
        buf = f.read(end - start)
    if use_native:
        from .fast_pipeline import featurize_raw
        from .native import parse_pairs_native

        raw = parse_pairs_native(buf)
        n = len(raw["product_id"])
        return featurize_raw(raw, featurizer, layout), n, int(raw["n_errors"])
    # per-example python fallback (same fields; bit-exactness is tested)
    stats = PipelineStats()
    fz = featurizer.for_model(layout)
    rows = [fz(ex) for ex in iter_examples(buf.decode("utf-8").splitlines(), stats)]
    if not rows:
        return {}, 0, stats.errors
    return stack_examples(rows), stats.parsed, stats.errors


def _worker_main(task_q, out_q, featurizer, layout, use_native, use_shm) -> None:
    """Worker loop: byte spans in, featurized span arrays out."""
    try:
        while True:
            item = task_q.get()
            if item is None:
                out_q.put(("done", None, None))
                return
            idx, path, start, end = item
            full, parsed, errors = featurize_span(
                path, start, end, featurizer, layout, use_native
            )
            if use_shm and full:
                try:
                    name, metas = _shm_pack(full)
                except OSError:  # /dev/shm full or unavailable: pickle it
                    out_q.put(("chunk", idx, (full, parsed, errors)))
                else:
                    out_q.put(("shm", idx, (name, metas, parsed, errors)))
            else:
                out_q.put(("chunk", idx, (full, parsed, errors)))
    except BaseException:  # noqa: BLE001 -- ship the traceback to the consumer
        out_q.put(("error", None, traceback.format_exc()))


class MultiWorkerLoader:
    """files -> fixed-shape batches, parsed+featurized by N processes.

    ``num_workers=0`` runs the same chunked path inline (no processes) --
    the determinism baseline the worker counts are tested against.
    Iterating twice restarts the pool.
    """

    def __init__(
        self,
        paths,
        featurizer: Featurizer,
        layout: str,
        batch_size: int,
        num_workers: int = 2,
        chunk_bytes: int = DEFAULT_CHUNK_BYTES,
        stats: PipelineStats | None = None,
        use_native: bool | None = None,
        timeout: float = 600.0,
        use_shm: bool = True,
    ):
        if use_native is None:
            try:
                from .native import get_lib

                get_lib()
                use_native = True
            except Exception:  # noqa: BLE001 -- NativeUnavailable and friends
                use_native = False
        self.paths = [str(p) for p in paths]
        self.featurizer = featurizer
        self.layout = layout
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.chunk_bytes = chunk_bytes
        self.stats = stats if stats is not None else PipelineStats()
        self.use_native = use_native
        self.timeout = timeout
        self.use_shm = use_shm

    # ---------------------------------------------------------- batching
    def _batches(self, fulls: Iterator[dict]) -> Iterator[dict]:
        """Ordered span arrays -> batch_size batches with one padded tail."""
        carry: list[dict[str, np.ndarray]] = []
        rows = 0
        bs = self.batch_size
        for full in fulls:
            if not full:
                continue
            n = len(next(iter(full.values())))
            if n == 0:
                continue
            carry.append(full)
            rows += n
            if rows < bs:
                continue
            whole = {
                k: np.concatenate([c[k] for c in carry], axis=0) for k in carry[0]
            }
            n_emit = (rows // bs) * bs
            for s in range(0, n_emit, bs):
                self.stats.batches += 1
                yield pad_batch(
                    {k: v[s : s + bs] for k, v in whole.items()}, bs
                )
            carry = (
                [{k: v[n_emit:] for k, v in whole.items()}] if rows > n_emit else []
            )
            rows -= n_emit
        if rows:
            whole = {
                k: np.concatenate([c[k] for c in carry], axis=0) for k in carry[0]
            }
            self.stats.batches += 1
            yield pad_batch(whole, bs)

    # ---------------------------------------------------------- pipelines
    def _spans_inline(self, spans) -> Iterator[dict]:
        for _, path, start, end in spans:
            full, parsed, errors = featurize_span(
                path, start, end, self.featurizer, self.layout, self.use_native
            )
            self.stats.parsed += parsed
            self.stats.errors += errors
            yield full

    def _spans_pooled(self, spans) -> Iterator[dict]:
        ctx = mp.get_context("spawn")
        task_q = ctx.Queue()
        out_q = ctx.Queue(maxsize=2 * self.num_workers)

        # Tasks are fed lazily, never more than max_ahead spans past the
        # next span the consumer needs: this bounds the reorder buffer (and
        # so host RAM) even when one span parses much slower than its
        # neighbours -- with everything pre-queued, the other workers could
        # otherwise run arbitrarily far ahead while the consumer waits.
        max_ahead = 4 * self.num_workers
        issued = 0
        ended = False

        def feed(next_idx: int) -> None:
            nonlocal issued, ended
            while issued < len(spans) and issued < next_idx + max_ahead:
                task_q.put(spans[issued])
                issued += 1
            if issued == len(spans) and not ended:
                ended = True
                for _ in range(self.num_workers):
                    task_q.put(None)

        feed(0)

        # sanitized child env (see module docstring); spawn snapshots
        # os.environ at Process.start, so scope the mutation tightly
        saved = {k: os.environ.get(k) for k in ("PYTHONPATH", "JAX_PLATFORMS")}
        os.environ["PYTHONPATH"] = ""
        os.environ["JAX_PLATFORMS"] = "cpu"
        try:
            procs = [
                ctx.Process(
                    target=_worker_main,
                    args=(task_q, out_q, self.featurizer, self.layout,
                          self.use_native, self.use_shm),
                    daemon=True,
                )
                for _ in range(self.num_workers)
            ]
            for p in procs:
                p.start()
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

        reorder: dict[int, tuple] = {}
        try:
            next_idx = 0
            done = 0
            while done < self.num_workers or next_idx < len(spans):
                try:
                    kind, idx, payload = out_q.get(timeout=self.timeout)
                except Exception as e:  # queue.Empty
                    dead = [p.pid for p in procs if not p.is_alive()]
                    raise RuntimeError(
                        f"loader stalled >{self.timeout}s waiting for span "
                        f"{next_idx}/{len(spans)} (dead workers: {dead})"
                    ) from e
                if kind == "error":
                    raise RuntimeError(f"loader worker failed:\n{payload}")
                if kind == "done":
                    done += 1
                    continue
                reorder[idx] = (kind, payload)
                while next_idx in reorder:
                    kind, payload = reorder.pop(next_idx)
                    if kind == "shm":
                        name, metas, parsed, errors = payload
                        full = _shm_unpack(name, metas)
                    else:
                        full, parsed, errors = payload
                    next_idx += 1
                    feed(next_idx)
                    self.stats.parsed += parsed
                    self.stats.errors += errors
                    yield full
        finally:
            for p in procs:
                p.terminate()
            for p in procs:
                p.join(timeout=10)
            # remove any shm blocks that never reached _shm_unpack
            for kind, payload in reorder.values():
                if kind == "shm":
                    _shm_drop(payload[0])
            try:
                while True:
                    kind, _, payload = out_q.get_nowait()
                    if kind == "shm":
                        _shm_drop(payload[0])
            except Exception:  # queue.Empty / closed
                pass

    def __iter__(self) -> Iterator[dict]:
        spans = [
            (i, *span)
            for i, span in enumerate(chunk_spans(self.paths, self.chunk_bytes))
        ]
        if not spans:
            return
        if self.num_workers == 0:
            yield from self._batches(self._spans_inline(spans))
        else:
            yield from self._batches(self._spans_pooled(spans))
