"""Layout-specific featurization into fixed-shape arrays.

The three reference stacks pad the same decoded row into three layouts:

* ImageBERT-A (``imagebert_lds``): 20 query ids + 10 box feature tokens +
  10 label tokens; segment ids only over the 20 text positions; **no**
  padding masks at all (``pixelmodel.py:189-195`` builds an all-ones mask).
* ImageBERT-B/C (``imagebert_zk``): 20 query ids + 10 image tokens; segment
  ids ``[0]*20 + [1]*10``; real length masks from ``len_query``/``num_boxes``
  (``model_triple.py:198-201``); C additionally rewrites the query text.
* LXMERT: 23 query ids (+mask), 10x8 label ids (+mask), 4-dim boxes,
  feature mask (``tasks/kdd_data.py:88-108``, ``utils.py:23-59``).

Everything returns numpy dicts; stacking into device-ready batches is
``stack_examples``/``pad_batch`` below.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from ..tokenization import FullTokenizer
from .tsv import (
    MAX_BOXES,
    MAX_LABEL_TOKENS,
    MAX_QUERY_LEN_AB,
    MAX_QUERY_LEN_L,
    RawExample,
    pad_1d,
    pad_rows,
    rewrite_sen2forest,
    row_mask,
)

SEGMENT_IDS_B = np.array([0] * MAX_QUERY_LEN_AB + [1] * MAX_BOXES, dtype=np.int32)


class Featurizer:
    """Shared tokenization machinery for all three layouts."""

    def __init__(
        self,
        tokenizer: FullTokenizer,
        label_texts: dict[str, str],
        sen2forest: bool = False,
    ):
        self.tokenizer = tokenizer
        self.label_texts = label_texts
        self.sen2forest = sen2forest
        self._label_ids_cache: dict[int, list[int]] = {}

    def label_token_ids(self, class_label: int) -> list[int]:
        """WordPiece ids of a box label's text (no [CLS]/[SEP])."""
        ids = self._label_ids_cache.get(class_label)
        if ids is None:
            text = self.label_texts[str(class_label)]
            ids = self.tokenizer.convert_tokens_to_ids(self.tokenizer.tokenize(text))
            self._label_ids_cache[class_label] = ids
        return ids

    def _query_text(self, ex: RawExample) -> str:
        return rewrite_sen2forest(ex.query) if self.sen2forest else ex.query

    def query_token_ids(self, ex: RawExample) -> list[int]:
        """Untruncated [CLS]+pieces+[SEP] ids of the (possibly rewritten)
        query -- the query-side half of every layout, used by the packed-
        catalog rerank path (``data/catalog.py:rerank_batch``)."""
        return self.tokenizer.encode_query(self._query_text(ex))

    def _label_id_grid(self, ex: RawExample) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (ids [10,8] i32, mask [10,8] i32, lens [10] i32)."""
        ids = np.zeros((MAX_BOXES, MAX_LABEL_TOKENS), dtype=np.int32)
        mask = np.zeros((MAX_BOXES, MAX_LABEL_TOKENS), dtype=np.int32)
        lens = np.zeros((MAX_BOXES,), dtype=np.int32)
        for i, cl in enumerate(ex.class_labels[:MAX_BOXES]):
            tok = self.label_token_ids(int(cl))
            n = min(len(tok), MAX_LABEL_TOKENS)
            ids[i, :n] = tok[:n]
            mask[i, :n] = 1
            lens[i] = len(tok)  # uncapped, like len_class_labels in the ref
        return ids, mask, lens

    # ---- ImageBERT-A (40-token single stream) -------------------------------

    def imagebert_a(self, ex: RawExample, label: int = 0) -> dict[str, np.ndarray]:
        q_ids = self.tokenizer.encode_query(self._query_text(ex))
        label_ids, _, _ = self._label_id_grid(ex)
        return {
            "input_ids": pad_1d(q_ids, MAX_QUERY_LEN_AB).astype(np.int32),
            "segment_ids": np.zeros((MAX_QUERY_LEN_AB,), dtype=np.int32),
            "boxes": pad_rows(ex.boxes_5(), MAX_BOXES).astype(np.float32),
            "features": pad_rows(ex.features, MAX_BOXES).astype(np.float32),
            "label_ids": label_ids,
            "labels": np.int32(label),
            "product_id": np.int64(ex.product_id),
            "query_id": np.int64(ex.query_id),
        }

    # ---- ImageBERT-B/C (30-token single stream, AM-softmax) ----------------

    def imagebert_b(self, ex: RawExample, label: int = 1) -> dict[str, np.ndarray]:
        q_ids = self.tokenizer.encode_query(self._query_text(ex))
        label_ids, _, label_lens = self._label_id_grid(ex)
        return {
            "input_ids": pad_1d(q_ids, MAX_QUERY_LEN_AB).astype(np.int32),
            "len_query": np.int32(len(q_ids)),
            "num_boxes": np.int32(ex.num_boxes),
            "segment_ids": SEGMENT_IDS_B.copy(),
            "boxes": pad_rows(ex.boxes_5(), MAX_BOXES).astype(np.float32),
            "features": pad_rows(ex.features, MAX_BOXES).astype(np.float32),
            "label_ids": label_ids,
            "label_lens": label_lens,
            "labels": np.int32(label),
            "product_id": np.int64(ex.product_id),
            "query_id": np.int64(ex.query_id),
        }

    # ---- LXMERT (dual stream) ------------------------------------------------

    def lxmert(self, ex: RawExample, label: int = 1) -> dict[str, np.ndarray]:
        q_ids = self.tokenizer.encode_query(self._query_text(ex))
        n_q = min(len(q_ids), MAX_QUERY_LEN_L)
        label_ids, label_mask, _ = self._label_id_grid(ex)
        return {
            "input_ids": pad_1d(q_ids, MAX_QUERY_LEN_L).astype(np.int32),
            "input_mask": row_mask(n_q, MAX_QUERY_LEN_L),
            "label_ids": label_ids,
            "label_mask": label_mask,
            "boxes": pad_rows(ex.boxes_normalized(), MAX_BOXES).astype(np.float32),
            "features": pad_rows(ex.features, MAX_BOXES).astype(np.float32),
            "feats_mask": row_mask(min(ex.num_boxes, MAX_BOXES), MAX_BOXES).astype(
                np.float32
            ),
            "labels": np.int32(label),
            "product_id": np.int64(ex.product_id),
            "query_id": np.int64(ex.query_id),
        }

    def for_model(self, name: str) -> Callable[[RawExample], dict[str, np.ndarray]]:
        return {
            "imagebert_a": self.imagebert_a,
            "imagebert_b": self.imagebert_b,
            "imagebert_c": self.imagebert_b,  # sen2forest handled at __init__
            "lxmert": self.lxmert,
        }[name]


def stack_examples(examples: list[dict[str, np.ndarray]]) -> dict[str, np.ndarray]:
    keys = examples[0].keys()
    return {k: np.stack([e[k] for e in examples], axis=0) for k in keys}


def pad_batch(
    batch: dict[str, np.ndarray], batch_size: int
) -> dict[str, np.ndarray]:
    """Pad a ragged tail batch to the compiled batch size with a 'valid' mask.

    XLA compiles one program per shape; padding keeps a single compiled
    scoring program alive for the whole dataset (the reference instead
    dropped/except'd the tail: ``run_pretraining_predict_score.py:577-578``).
    """
    n = next(iter(batch.values())).shape[0]
    valid = np.zeros((batch_size,), dtype=np.bool_)
    valid[:n] = True
    if n == batch_size:
        return {**batch, "valid": valid}
    out = {}
    for k, v in batch.items():
        pad_shape = (batch_size - n,) + v.shape[1:]
        out[k] = np.concatenate([v, np.zeros(pad_shape, dtype=v.dtype)], axis=0)
    out["valid"] = valid
    return out
