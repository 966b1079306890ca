"""Canonical scoring-batch layouts per model family.

One source of truth for the feature arrays each model's ``apply`` consumes
(shapes, dtypes, and a random example generator), shared by the benches
(``scripts/bench_all.py``), the on-device tests and the AOT serving export
(``serving/export.py``). The layouts mirror what ``featurize.Featurizer``
emits from a TSV row: reference row formats in
``imagebert_lds/src/load_data_pred.py:94-121`` (A/B 20-query + 10-box
fields) and ``lxmert/src/tasks/kdd_data.py:88-108`` (23-token query, 4-dim
boxes, per-box label grids).
"""

from __future__ import annotations

import numpy as np

__all__ = ["example_batch", "batch_spec"]


def example_batch(name: str, cfg, B: int, rng) -> dict:
    """Random numpy feature batch with the exact scoring layout of ``name``
    (meta keys like product_id/query_id/valid excluded)."""
    if name in ("imagebert_a", "imagebert_b", "imagebert_c"):
        b = {
            "input_ids": rng.integers(0, cfg.vocab_size, (B, 20)).astype(np.int32),
            "segment_ids": (
                np.zeros((B, 20), np.int32)
                if name == "imagebert_a"
                else np.array([[0] * 20 + [1] * 10] * B, np.int32)
            ),
            "boxes": rng.standard_normal((B, 10, 5)).astype(np.float32),
            "features": rng.standard_normal((B, 10, 2048)).astype(np.float32),
            "label_ids": rng.integers(0, cfg.vocab_size, (B, 10, 8)).astype(np.int32),
        }
        if name != "imagebert_a":
            b["len_query"] = rng.integers(3, 21, (B,)).astype(np.int32)
            b["num_boxes"] = rng.integers(1, 11, (B,)).astype(np.int32)
            b["labels"] = np.ones((B,), np.int32)
        return b
    if name == "lxmert":
        nb = rng.integers(1, 11, (B,))
        nq = rng.integers(3, 24, (B,))
        v = cfg.bert.vocab_size
        return {
            "input_ids": rng.integers(0, v, (B, 23)).astype(np.int32),
            "input_mask": (np.arange(23)[None] < nq[:, None]).astype(np.int32),
            "label_ids": rng.integers(0, v, (B, 10, 8)).astype(np.int32),
            "label_mask": np.ones((B, 10, 8), np.int32),
            "boxes": rng.standard_normal((B, 10, 4)).astype(np.float32),
            "features": rng.standard_normal((B, 10, 2048)).astype(np.float32),
            "feats_mask": (np.arange(10)[None] < nb[:, None]).astype(np.float32),
        }
    raise ValueError(f"unknown model {name!r}")


def batch_spec(name: str, cfg, B) -> dict:
    """dict of ``jax.ShapeDtypeStruct`` matching :func:`example_batch` --
    the abstract signature an AOT export is traced against. ``B`` may be a
    symbolic dim. Shapes come from a B=1 example (a real batch at the
    documented B=8192 would materialize ~700 MB of random features just to
    read .shape)."""
    import jax

    ex = example_batch(name, cfg, 1, np.random.default_rng(0))
    return {
        k: jax.ShapeDtypeStruct((B, *v.shape[1:]), v.dtype) for k, v in ex.items()
    }
