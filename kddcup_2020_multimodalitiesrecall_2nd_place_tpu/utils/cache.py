"""Persistent XLA compile-cache setup shared by every CLI entry point.

On this rig XLA compiles go through a remote compile helper (~10-60 s
each; the fused Pallas train programs take minutes cold), so every driver
that touches the device enables the on-disk compilation cache before its
first trace.  One helper keeps the path and threshold consistent across
``scripts/{train,score,distill,export,perf_lab}.py`` and ``bench.py``
(the reference has no equivalent: its TF1 graph scripts rebuild and
re-optimize the graph on every invocation, e.g.
``code/imagebert_lds/src/run_pretraining_predict_score.py:522-593``).
"""

from __future__ import annotations

from pathlib import Path

# repo root: utils/cache.py -> utils -> package -> repo
_CACHE_DIR = Path(__file__).resolve().parents[2] / ".jax_cache"


def enable_persistent_compile_cache(min_compile_secs: float = 0.5) -> None:
    """Point jax at the repo-local persistent compile cache.

    Must run before the first compilation (anywhere before the first jit
    call is fine — backend init itself is not cached).  Safe to call more
    than once; imports jax lazily so CPU-only code paths that never touch
    the device don't pay backend init.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", str(_CACHE_DIR))
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )
