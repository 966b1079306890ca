"""Vectorised host pipeline: native parser + numpy batch assembly.

The per-example python path (``pipeline.py``) is the readable reference;
this path feeds the TPU at full rate:

* the C++ library decodes the whole TSV buffer into dense arrays
  (``native/preproc.cpp``),
* box-label token ids come from a precomputed [num_label_ids, 8] lookup
  table (one gather instead of per-box tokenizer calls),
* queries are tokenised once per *unique* string (testB has ~500 unique
  queries across 29k rows).

Produces exactly the same fixed-shape batches as ``Featurizer`` (checked in
tests), so engines can switch paths freely.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from .featurize import SEGMENT_IDS_B, Featurizer, pad_batch
from .tsv import MAX_BOXES, MAX_LABEL_TOKENS, MAX_QUERY_LEN_AB, MAX_QUERY_LEN_L


def build_label_lut(featurizer: Featurizer) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (ids [max_label+1, 8] i32, mask [.., 8] i32, lens [..] i32 uncapped)."""
    keys = [int(k) for k in featurizer.label_texts]
    size = max(keys) + 1
    ids = np.zeros((size, MAX_LABEL_TOKENS), np.int32)
    mask = np.zeros((size, MAX_LABEL_TOKENS), np.int32)
    lens = np.zeros((size,), np.int32)
    for k in keys:
        tok = featurizer.label_token_ids(k)
        n = min(len(tok), MAX_LABEL_TOKENS)
        ids[k, :n] = tok[:n]
        mask[k, :n] = 1
        lens[k] = len(tok)  # uncapped, like len_class_labels in the reference
    return ids, mask, lens


def _tokenize_queries(
    featurizer: Featurizer, queries: list[str], max_len: int
) -> tuple[np.ndarray, np.ndarray]:
    """-> (ids [N, max_len] i32, lens [N] i32), one tokenize per unique query."""
    cache: dict[str, tuple[np.ndarray, int]] = {}
    tok = featurizer.tokenizer
    out = np.zeros((len(queries), max_len), np.int32)
    lens = np.zeros((len(queries),), np.int32)
    for i, q in enumerate(queries):
        if featurizer.sen2forest:
            q = q.replace("sen department of", "forest style")
        hit = cache.get(q)
        if hit is None:
            ids = tok.encode_query(q)
            row = np.zeros((max_len,), np.int32)
            row[: min(len(ids), max_len)] = ids[:max_len]
            hit = (row, len(ids))
            cache[q] = hit
        out[i] = hit[0]
        lens[i] = hit[1]
    return out, lens


def featurize_raw(
    raw: dict,
    featurizer: Featurizer,
    model_name: str,
) -> dict[str, np.ndarray]:
    """Native-parser output -> the full featurized arrays of a model layout
    (same fields as the per-example ``Featurizer`` path, unsliced). The
    unit of work a multiprocessing worker ships back whole
    (``data/multiworker.py``); ``assemble_batches`` slices it."""
    n = len(raw["product_id"])
    label_lut, label_mask_lut, label_lens_lut = build_label_lut(featurizer)
    clipped = np.clip(raw["class_labels"], 0, len(label_lut) - 1)
    nb = np.minimum(raw["num_boxes"], MAX_BOXES)
    box_arange = np.arange(MAX_BOXES)[None, :]
    box_valid = (box_arange < nb[:, None])  # [N, 10]
    # rows beyond num_boxes must be all-zero ids (the per-example path never
    # writes them; the parser's class_labels pad of 0 is a REAL label id)
    label_ids = label_lut[clipped] * box_valid[..., None]  # [N, 10, 8]
    max_len = MAX_QUERY_LEN_L if model_name == "lxmert" else MAX_QUERY_LEN_AB
    q_ids, q_lens = _tokenize_queries(featurizer, raw["queries"], max_len)

    if model_name in ("imagebert_a", "imagebert_b", "imagebert_c"):
        full: dict[str, np.ndarray] = {
            "input_ids": q_ids,
            "boxes": raw["boxes5"],
            "features": raw["features"],
            "label_ids": label_ids,
            "labels": np.zeros((n,), np.int32)
            if model_name == "imagebert_a"
            else np.ones((n,), np.int32),
            "product_id": raw["product_id"],
            "query_id": raw["query_id"],
        }
        if model_name == "imagebert_a":
            full["segment_ids"] = np.zeros((n, MAX_QUERY_LEN_AB), np.int32)
        else:
            full["segment_ids"] = np.broadcast_to(SEGMENT_IDS_B, (n, 30)).copy()
            full["len_query"] = q_lens
            full["num_boxes"] = raw["num_boxes"].astype(np.int32)
            full["label_lens"] = label_lens_lut[clipped] * box_valid
    else:  # lxmert
        full = {
            "input_ids": q_ids,
            "input_mask": (
                np.arange(max_len)[None, :] < np.minimum(q_lens, max_len)[:, None]
            ).astype(np.int32),
            "label_ids": label_ids,
            "label_mask": label_mask_lut[clipped],
            "boxes": raw["boxes4"],
            "features": raw["features"],
            "feats_mask": box_valid.astype(np.float32),
            "labels": np.ones((n,), np.int32),
            "product_id": raw["product_id"],
            "query_id": raw["query_id"],
        }
        full["label_mask"] = full["label_mask"] * box_valid[..., None]
    return full


def assemble_batches(
    raw: dict,
    featurizer: Featurizer,
    model_name: str,
    batch_size: int,
) -> Iterator[dict[str, np.ndarray]]:
    """Native-parser output -> model-layout batches (same fields as Featurizer)."""
    full = featurize_raw(raw, featurizer, model_name)
    n = len(raw["product_id"])
    for start in range(0, n, batch_size):
        chunk = {k: v[start : start + batch_size] for k, v in full.items()}
        yield pad_batch(chunk, batch_size)


def native_batches_from_files(
    paths,
    featurizer: Featurizer,
    model_name: str,
    batch_size: int,
    stats=None,
) -> Iterator[dict[str, np.ndarray]]:
    from .native import parse_pairs_native

    for path in paths:
        with open(path, "rb") as f:
            raw = parse_pairs_native(f.read())
        if stats is not None:
            stats.parsed += len(raw["product_id"])
            stats.errors += raw["n_errors"]
        yield from assemble_batches(raw, featurizer, model_name, batch_size)
