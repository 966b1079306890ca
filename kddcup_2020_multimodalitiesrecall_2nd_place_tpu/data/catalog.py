"""Memmapped product catalogs: the 3M-product retrieval data layer.

The reference processed the full 3M-row train set with Python loops over
in-RAM dicts (``imagebert_lds/src/train_split.py:11`` is the 3M regime;
the scorers hold ``{qid: {pid: score}}`` tables in memory). For catalog-
scale retrieval that layout caps out: 3M products' RoI features alone are
~24 GB. This module stores the catalog the same way ``data/packed.py``
stores training instances -- per-field ``.npy`` shards, memory-mapped at
read time -- so both the recall stage (embeddings, ~0.8 GB bf16 at 3M x
128) and the rerank stage (full per-product features) stream from disk with
bounded RSS:

* ``build_catalog``: drain a (product_id, embedding[, features]) stream
  into shards; constant memory (one shard buffered at a time);
* ``CatalogDataset``: memmapped reader; ``embedding_chunks()`` yields
  [C, D] slabs for the device;
* ``recall_chunked``: exact top-k over the memmapped catalog -- each chunk
  is scored on-device (``top_k_products``) and merged into a running host
  top-k, so device HBM holds one chunk and the host holds [Q, k].
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

import numpy as np

from .packed import MANIFEST, PackedDataset, write_packed_shards

__all__ = [
    "build_catalog",
    "CatalogDataset",
    "recall_chunked",
    "recall_at_k",
    "rerank_batch",
]


def build_catalog(
    entries: Iterable[dict],
    out_dir,
    shard_size: int = 262_144,
    embedding_dtype=np.float16,
    label_tokenizer: str = "google",
) -> dict:
    """Stream ``{"product_id", "embedding", ...}`` dicts into packed shards.

    Extra keys (e.g. the rerank features ``boxes/features/label_ids/
    num_boxes``) are stored as additional fields; ``features`` is halved to
    float16 by the underlying writer. Returns the manifest.

    ``label_tokenizer`` records which WordPiece lineage the stored
    ``label_ids`` were built with ("google" = ImageBERT lineage, "hf" =
    LXMERT lineage; the two differ on never-split tokens and >100-char
    words) so the rerank stage can verify it matches the cross-encoder --
    see ``rerank_batch``.
    """

    def cast(ex):
        ex = dict(ex)
        ex["embedding"] = np.asarray(ex["embedding"], embedding_dtype)
        return ex

    return write_packed_shards(
        (cast(e) for e in entries), out_dir, shard_size=shard_size,
        meta={"label_tokenizer": label_tokenizer},
    )


class CatalogDataset(PackedDataset):
    """Memmapped catalog reader (a PackedDataset with embedding helpers)."""

    @property
    def dim(self) -> int:
        return int(self.manifest["fields"]["embedding"]["shape"][0])

    def product_ids(self) -> np.ndarray:
        return np.concatenate([m["product_id"][:] for m in self._maps])

    def embedding_chunks(self, chunk_rows: int = 262_144) -> Iterator[tuple[int, np.ndarray]]:
        """Yield (global_start_row, [C, D] float32/float16 slab) in order.

        Slabs are copies of at most ``chunk_rows`` rows (shards are split,
        never concatenated, so peak memory is one slab + the mmap pages).
        """
        start = 0
        for m in self._maps:
            emb = m["embedding"]
            for lo in range(0, emb.shape[0], chunk_rows):
                slab = np.asarray(emb[lo : lo + chunk_rows])
                yield start + lo, slab
            start += emb.shape[0]

    def rows(self, idx: np.ndarray) -> dict:
        """Gather arbitrary global rows (the rerank stage's feature fetch).

        Vectorized: ONE searchsorted for the global->shard split plus one
        fancy-index gather per (shard, field), with each shard's reads in
        ascending row order (memmap-page friendly). A per-row python loop
        costs ~10us/row on a 1-core host -- at cascade scale (512 queries x
        k_recall=500 = 256k gathered rows) that alone would dominate the
        stage."""
        bounds = np.cumsum([0] + list(self.shard_sizes))
        flat = np.asarray(idx, np.int64).reshape(-1)
        shard_of = np.searchsorted(bounds, flat, side="right") - 1
        local = flat - bounds[shard_of]
        batch: dict[str, np.ndarray] = {}
        for f in self.fields:
            m0 = self._maps[0][f]
            dest = np.empty((flat.shape[0], *m0.shape[1:]), m0.dtype)
            for s, m in enumerate(self._maps):
                sel = np.nonzero(shard_of == s)[0]
                if sel.size:
                    sel = sel[np.argsort(local[sel], kind="stable")]
                    dest[sel] = m[f][local[sel]]
            batch[f] = dest
        if "features" in batch and batch["features"].dtype != np.float32:
            batch["features"] = batch["features"].astype(np.float32)
        return batch


def recall_chunked(
    q_emb: np.ndarray,  # [Q, D] float32
    catalog: CatalogDataset,
    k: int = 5,
    chunk_rows: int = 262_144,
    device_top_k: Callable | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k MIPS over a memmapped catalog, one device chunk at a time.

    Each [C, D] slab is scored on-device (``top_k_products`` on the default
    backend unless ``device_top_k`` injects another scorer) and merged into
    the host-side running top-k -- the device never holds more than one
    chunk, the host never more than [Q, 2k]. Returns (scores, global idx).
    """
    import jax
    import jax.numpy as jnp

    if device_top_k is None:
        from ..models.two_tower import top_k_products

        # one jit per (chunk shape, k): eager ops would otherwise compile
        # per primitive (catastrophic on remote-compile rigs)
        scorer = jax.jit(top_k_products, static_argnames=("k", "chunk"))

        def device_top_k(q, c, kk):
            return scorer(q, c, k=kk, chunk=c.shape[0])

    qd = jax.device_put(jnp.asarray(q_emb, jnp.float32))
    q = q_emb.shape[0]
    best_s = np.full((q, k), -np.inf, np.float32)
    best_i = np.full((q, k), -1, np.int64)
    for start, slab in catalog.embedding_chunks(chunk_rows):
        kk = min(k, slab.shape[0])
        s, i = device_top_k(qd, jnp.asarray(slab, jnp.bfloat16), kk)
        s = np.asarray(s, np.float32)
        i = np.asarray(i, np.int64) + start
        merged_s = np.concatenate([best_s, s], axis=1)
        merged_i = np.concatenate([best_i, i], axis=1)
        top = np.argsort(-merged_s, axis=1, kind="stable")[:, :k]
        best_s = np.take_along_axis(merged_s, top, axis=1)
        best_i = np.take_along_axis(merged_i, top, axis=1)
    return best_s, best_i


def rerank_batch(
    model_name: str,
    q_ids_list: list,  # per pair: untruncated [CLS]+pieces+[SEP] id list
    query_ids: np.ndarray,  # [B] int64
    rows: dict,  # CatalogDataset.rows() gather for the same B pairs
) -> dict:
    """Assemble a cross-encoder batch from tokenized queries + catalog rows.

    The memmap-backed half of the cascade's rerank stage: the product side
    comes straight out of the packed catalog (``recall.py build --packed
    --store-features`` stores the ImageBERT-B featurized fields: boxes [10,5],
    features [10,2048], label_ids [10,8], label_lens [10], num_boxes), the
    query side from ``Featurizer.query_token_ids``. Reconstructs each
    layout exactly as ``featurize.Featurizer`` builds it from a RawExample
    (`imagebert_lds/src/pixelmodel.py:189-195` / `imagebert_zk/
    model_triple.py:198-201` / `lxmert/src/tasks/kdd_data.py:88-108`
    semantics), so scores match the TSV featurization path bit-for-bit
    (modulo the catalog's float16 feature storage, and provided the
    catalog's stored ``label_ids`` were tokenized with the cross-encoder's
    WordPiece lineage -- the manifest records it as ``label_tokenizer`` and
    ``scripts/cascade.py`` warns on a mismatch; "google" and "hf" differ on
    never-split literals and >100-char words in label text).
    """
    from .featurize import SEGMENT_IDS_B
    from .tsv import MAX_BOXES, MAX_QUERY_LEN_AB, MAX_QUERY_LEN_L, pad_1d, row_mask

    b = len(q_ids_list)
    if query_ids.shape[0] != b or next(iter(rows.values())).shape[0] != b:
        raise ValueError("q_ids_list, query_ids and rows must agree on B")
    features = rows["features"]
    if features.dtype != np.float32:
        features = features.astype(np.float32)
    label_ids = np.ascontiguousarray(rows["label_ids"], dtype=np.int32)
    boxes = np.ascontiguousarray(rows["boxes"], dtype=np.float32)
    product_id = np.ascontiguousarray(rows["product_id"], dtype=np.int64)
    query_ids = np.asarray(query_ids, dtype=np.int64)

    if model_name == "lxmert":
        input_ids = np.stack(
            [pad_1d(q, MAX_QUERY_LEN_L) for q in q_ids_list]
        ).astype(np.int32)
        input_mask = np.stack(
            [row_mask(min(len(q), MAX_QUERY_LEN_L), MAX_QUERY_LEN_L)
             for q in q_ids_list]
        )
        num_boxes = np.ascontiguousarray(rows["num_boxes"], dtype=np.int64)
        return {
            "input_ids": input_ids,
            "input_mask": input_mask,
            "label_ids": label_ids,
            # stored wordpiece ids are never 0 ([PAD]), so the id grid
            # carries its own mask
            "label_mask": (label_ids != 0).astype(np.int32),
            "boxes": boxes[:, :, :4],  # col 4 is imagebert's area feature
            "features": features,
            "feats_mask": np.stack(
                [row_mask(min(int(n), MAX_BOXES), MAX_BOXES) for n in num_boxes]
            ).astype(np.float32),
            "labels": np.ones((b,), np.int32),
            "product_id": product_id,
            "query_id": query_ids,
        }

    input_ids = np.stack(
        [pad_1d(q, MAX_QUERY_LEN_AB) for q in q_ids_list]
    ).astype(np.int32)
    if model_name == "imagebert_a":
        return {
            "input_ids": input_ids,
            "segment_ids": np.zeros((b, MAX_QUERY_LEN_AB), np.int32),
            "boxes": boxes,
            "features": features,
            "label_ids": label_ids,
            "labels": np.zeros((b,), np.int32),
            "product_id": product_id,
            "query_id": query_ids,
        }
    if model_name in ("imagebert_b", "imagebert_c"):
        if "label_lens" in rows:
            label_lens = np.ascontiguousarray(rows["label_lens"], np.int32)
        else:
            # catalogs built before label_lens was stored: the id-grid mask
            # caps each length at MAX_LABEL_TOKENS (the true reference value
            # is uncapped; only labels longer than 8 pieces differ)
            label_lens = (label_ids != 0).sum(axis=2).astype(np.int32)
        return {
            "input_ids": input_ids,
            "len_query": np.array([len(q) for q in q_ids_list], np.int32),
            "num_boxes": np.ascontiguousarray(rows["num_boxes"], np.int32),
            "segment_ids": np.tile(SEGMENT_IDS_B, (b, 1)),
            "boxes": boxes,
            "features": features,
            "label_ids": label_ids,
            "label_lens": label_lens,
            "labels": np.ones((b,), np.int32),
            "product_id": product_id,
            "query_id": query_ids,
        }
    raise ValueError(f"unknown model {model_name!r}")


def recall_at_k(
    retrieved_ids: np.ndarray,  # [Q, K] product ids (−1 = empty)
    truth: dict,  # query row -> set/list of relevant product ids
    ks: Iterable[int],
) -> dict[int, float]:
    """Recall@K curve: fraction of relevant products inside the top-K."""
    out = {}
    for k in ks:
        hits = total = 0
        for row, rel in truth.items():
            rel = {int(p) for p in rel}
            if not rel:
                continue
            got = {int(p) for p in retrieved_ids[row, :k] if p >= 0}
            hits += len(rel & got)
            total += len(rel)
        out[int(k)] = hits / max(total, 1)
    return out
