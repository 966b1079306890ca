"""Materialized training-instance shards: the pretrain-scale data format.

TPU-native replacement for the reference's TFRecord pretraining data
(``imagebert_zk/generate_data.py:90-362,668-699``): training instances
(hard-negative pairing, curriculum sampling, MLM masking) are materialized
ONCE by draining the online sampler, then written as per-field ``.npy``
shards that memory-map at train time. Multi-epoch passes over the 3M-row
train set then cost no re-tokenization / re-mining / re-b64-decoding.

Deliberate differences from the reference format:

* one raw ``.npy`` per (shard, field) instead of protobuf TFRecords --
  ``np.load(mmap_mode="r")`` gives zero-parse random access, so batch
  assembly is a fancy-index gather instead of a per-record decode loop;
* RoI features may be stored float16 (halves the dominant field: 2048 floats
  per instance) and are cast back to float32 at batch assembly;
* epoch shuffling is a seeded permutation at load time (shard order + order
  within each shard), not shuffle-on-write, so one materialization serves
  any number of differently-ordered epochs.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterable, Iterator

import numpy as np

MANIFEST = "manifest.json"


def write_packed_shards(
    examples: Iterable[dict],
    out_dir,
    shard_size: int = 65536,
    feature_dtype=np.float16,
    max_instances: int | None = None,
    meta: dict | None = None,
) -> dict:
    """Drain an example iterator (e.g. ``HardNegativeSampler.examples``)
    into per-field .npy shards + a manifest. Returns the manifest dict.
    ``meta``: extra JSON-able key/values recorded in the manifest (e.g. the
    tokenizer lineage the label_ids were built with)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    shards: list[int] = []
    fields: dict[str, dict] = {}
    buf: list[dict] = []

    def flush():
        if not buf:
            return
        idx = len(shards)
        for key in buf[0]:
            arr = np.stack([ex[key] for ex in buf], axis=0)
            if key == "features" and feature_dtype is not None:
                arr = arr.astype(feature_dtype)
            np.save(out / f"shard_{idx:05d}.{key}.npy", arr)
            fields.setdefault(
                key, {"dtype": str(arr.dtype), "shape": list(arr.shape[1:])}
            )
        shards.append(len(buf))
        buf.clear()

    for ex in examples:
        buf.append(ex)
        if len(buf) == shard_size:
            flush()
        if max_instances is not None and sum(shards) + len(buf) >= max_instances:
            break
    flush()

    manifest = {
        "version": 1,
        "num_instances": int(sum(shards)),
        "shard_sizes": shards,
        "fields": fields,
        "feature_dtype": str(np.dtype(feature_dtype)) if feature_dtype else None,
        **(meta or {}),
    }
    (out / MANIFEST).write_text(json.dumps(manifest, indent=1))
    return manifest


class PackedDataset:
    """Memory-mapped reader over a packed-shard directory."""

    def __init__(self, path):
        self.dir = Path(path)
        self.manifest = json.loads((self.dir / MANIFEST).read_text())
        self.shard_sizes = self.manifest["shard_sizes"]
        self.fields = list(self.manifest["fields"])
        # one memmap per (shard, field); OS page cache does the real caching
        self._maps = [
            {
                f: np.load(self.dir / f"shard_{i:05d}.{f}.npy", mmap_mode="r")
                for f in self.fields
            }
            for i in range(len(self.shard_sizes))
        ]

    def __len__(self) -> int:
        return self.manifest["num_instances"]

    def _assemble(self, shard: dict, idx: np.ndarray) -> dict:
        batch = {}
        for f, arr in shard.items():
            a = arr[idx]  # fancy-index gather materialises the batch copy
            if f == "features" and a.dtype != np.float32:
                a = a.astype(np.float32)
            batch[f] = a
        return batch

    def batches(
        self,
        batch_size: int,
        epochs: int | None = 1,
        seed: int = 0,
        drop_remainder: bool = True,
        process_id: int = 0,
        process_count: int = 1,
    ) -> Iterator[dict]:
        """Shuffled batches: per epoch, shard order and the order within each
        shard are re-permuted from (seed, epoch). ``epochs=None`` = forever.

        Multi-host: every process derives the SAME permutation and takes a
        disjoint ``process_id::process_count`` stride of each shard, so a pod
        covers each instance exactly once per epoch with no coordination."""
        epoch = 0
        while epochs is None or epoch < epochs:
            n_yielded = 0
            rng = np.random.default_rng((seed, epoch))
            carry: list[tuple[dict, np.ndarray]] = []
            carry_n = 0
            for si in rng.permutation(len(self._maps)):
                shard = self._maps[si]
                order = rng.permutation(self.shard_sizes[si])
                if process_count > 1:
                    # truncate to a multiple of process_count BEFORE striding
                    # so every process yields the same number of instances per
                    # epoch -- otherwise strides differ by up to 1 per shard
                    # and hosts drift across epoch boundaries (unequal step
                    # counts under finite epochs)
                    order = order[: len(order) - len(order) % process_count]
                    order = order[process_id::process_count]
                pos = 0
                while pos < len(order):
                    take = min(batch_size - carry_n, len(order) - pos)
                    carry.append((shard, order[pos : pos + take]))
                    carry_n += take
                    pos += take
                    if carry_n == batch_size:
                        parts = [self._assemble(s, i) for s, i in carry]
                        n_yielded += 1
                        yield {
                            f: np.concatenate([p[f] for p in parts], axis=0)
                            if len(parts) > 1
                            else parts[0][f]
                            for f in self.fields
                        }
                        carry, carry_n = [], 0
            if not drop_remainder and carry:
                parts = [self._assemble(s, i) for s, i in carry]
                n_yielded += 1
                yield {
                    f: np.concatenate([p[f] for p in parts], axis=0)
                    for f in self.fields
                }
            if n_yielded == 0:
                # with epochs=None + drop_remainder this would otherwise
                # re-permute and re-scan shards forever yielding nothing
                raise ValueError(
                    f"batch_size={batch_size} exceeds this process's "
                    f"{len(self) // max(process_count, 1)} packed instances"
                )
            epoch += 1
