"""Throughput benchmark: query-product pairs scored per second per chip.

Runs the flagship ImageBERT-A scorer (full BERT-Base config, bf16 matmuls /
f32 softmax+LN) over pre-staged synthetic batches on the available
accelerator and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "pairs/s/chip", "vs_baseline": N/50000}

Baseline: the reference publishes no throughput (it scored testB with a
batch-5 feed_dict loop, ``run_pretraining_predict_score.py:523,566``); the
north-star target from BASELINE.md is 50k pairs/s/chip on TPU v5e.

Rig discipline (ROADMAP.md "Known quirks"): the axon TPU tunnel can wedge
for hours after a stalled job, in which case *any* python that touches the
backend hangs at init -- inside this very process, where no try/except can
save us.  So the measurement runs in a child process ("--inner") and the
parent orchestrates: cheap device_put probe under a hard timeout, bounded
sleep-retry loop, and on persistent failure ONE parseable JSON line with an
"error" field (never a raw traceback) and exit code 0.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# -- orchestration knobs (env-overridable for tests) -------------------------
PROBE_TIMEOUT_S = int(os.environ.get("BENCH_PROBE_TIMEOUT", "150"))
INNER_TIMEOUT_S = int(os.environ.get("BENCH_INNER_TIMEOUT", "1500"))
MAX_ATTEMPTS = int(os.environ.get("BENCH_MAX_ATTEMPTS", "10"))
RETRY_SLEEP_S = int(os.environ.get("BENCH_RETRY_SLEEP", "120"))

_PROBE_SRC = (
    "import numpy as np, jax; "
    "x = jax.device_put(np.arange(8.0)); "
    "print('probe-ok', float(x.sum()))"
)


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _probe() -> bool:
    """Compile-free backend-liveness check in a killable child process."""
    try:
        res = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            timeout=PROBE_TIMEOUT_S,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        _log(f"probe timed out after {PROBE_TIMEOUT_S}s (tunnel wedged)")
        return False
    if res.returncode == 0 and "probe-ok" in res.stdout:
        return True
    _log(f"probe failed rc={res.returncode}: {(res.stderr or '').strip()[-300:]}")
    return False


def _run_inner() -> str | None:
    """Run the measurement child; return its final JSON line or None."""
    try:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner"],
            timeout=INNER_TIMEOUT_S,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        _log(f"inner bench timed out after {INNER_TIMEOUT_S}s")
        return None
    if res.stderr:
        sys.stderr.write(res.stderr[-2000:])
    for line in reversed((res.stdout or "").strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "value" in parsed:
                return line
    _log(f"inner bench rc={res.returncode}, no JSON line in output")
    return None


def orchestrate() -> int:
    last_err = "no attempt ran"
    for attempt in range(1, MAX_ATTEMPTS + 1):
        _log(f"attempt {attempt}/{MAX_ATTEMPTS}")
        if not _probe():
            last_err = "backend probe failed (tunnel wedged?)"
        else:
            line = _run_inner()
            if line is not None:
                print(line)
                return 0
            last_err = "inner bench produced no JSON result"
        if attempt < MAX_ATTEMPTS:
            _log(f"sleeping {RETRY_SLEEP_S}s before retry")
            time.sleep(RETRY_SLEEP_S)
    print(
        json.dumps(
            {
                "metric": "imagebert_a_scoring_throughput",
                "value": 0.0,
                "unit": "pairs/s/chip",
                "vs_baseline": 0.0,
                "error": f"{last_err} after {MAX_ATTEMPTS} attempts",
            }
        )
    )
    return 0


# -- the actual measurement (child process) ----------------------------------


def inner_main() -> None:
    import pathlib

    import jax
    import numpy as np

    # the remote XLA compile helper on this rig costs 1-5 min per program;
    # persist compiles so driver re-runs (and repeat benches) skip them
    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import (
        Precision,
        get_model,
    )

    model = get_model("imagebert_a")
    cfg = model.config
    params = model.init_params(jax.random.key(0))

    batch_size = int(os.environ.get("BENCH_BATCH", "16384"))
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": rng.integers(0, cfg.vocab_size, (batch_size, 20)).astype(np.int32),
        "segment_ids": np.zeros((batch_size, 20), np.int32),
        "boxes": rng.standard_normal((batch_size, 10, 5)).astype(np.float32),
        "features": rng.standard_normal((batch_size, 10, 2048)).astype(np.float32),
        "label_ids": rng.integers(0, cfg.vocab_size, (batch_size, 10, 8)).astype(np.int32),
    }
    batch = jax.device_put(batch)

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.attention import (
        set_attention_backend,
    )

    if jax.default_backend() == "tpu":
        set_attention_backend("pallas_packed")
    prec = Precision.bf16()
    # one jitted cast program instead of ~30 per-leaf eager converts (each
    # eager op is its own remote compile on this rig)
    bf16_params = jax.jit(
        lambda p: jax.tree.map(
            lambda x: x.astype("bfloat16") if x.dtype == np.float32 else x, p
        )
    )(params)

    @jax.jit
    def score(params, batch):
        return model.apply(params, batch, cfg, prec)["score"]

    # warmup / compile; NB: on this platform block_until_ready can return
    # before execution finishes, so timings force a host fetch -- but of a
    # jitted SCALAR reduce, with the iterations pipelined: fetching the
    # whole [B] array per iteration serializes on the ~29 ms/dispatch
    # tunnel and reads ~4-8% low.
    import jax.numpy as jnp

    reduce = jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))
    float(jax.device_get(reduce(score(bf16_params, batch))))
    float(jax.device_get(reduce(score(bf16_params, batch))))

    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = score(bf16_params, batch)
    float(jax.device_get(reduce(out)))
    dt = time.perf_counter() - t0

    n_chips = jax.local_device_count()
    pairs_per_sec = n_iters * batch_size / dt / max(n_chips, 1)
    baseline = 50_000.0
    print(
        json.dumps(
            {
                "metric": "imagebert_a_scoring_throughput",
                "value": round(pairs_per_sec, 1),
                "unit": "pairs/s/chip",
                "vs_baseline": round(pairs_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    if "--inner" in sys.argv:
        inner_main()
    else:
        sys.exit(orchestrate())
