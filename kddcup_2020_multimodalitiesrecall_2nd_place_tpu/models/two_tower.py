"""Two-tower dual encoder + exact on-device recall (stretch capability).

The reference is a pure cross-encoder pipeline: every (query, product) pair
costs a full BERT forward, so candidate generation is outsourced upstream.
This adds the retrieval stage the reference lacks (BASELINE.json config 5):

* query tower: the shared text embedding + a shallow encoder over the
  20-token query, CLS-pooled and L2-normalised;
* product tower: the ImageBERT-B image-token path (label conv + box FC +
  feature FC) + a shallow encoder over the 10 RoI tokens, CLS-style pooled
  (mean over valid tokens) and L2-normalised;
* training: in-batch softmax contrastive loss (symmetric InfoNCE) with
  temperature;
* retrieval: exact maximum-inner-product search as one [Q, D] x [D, N]
  matmul over the catalog, chunked over HBM and sharded over the ``data``
  mesh axis -- at 3M products x 128 dims the catalog is ~0.8 GB in bf16, so
  brute-force on the MXU beats approximate ANN structures on TPU.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..data.tsv import MAX_BOXES, MAX_QUERY_LEN_AB
from .core import (
    BertConfig,
    Params,
    Precision,
    dense,
    dense_init,
    embeddings_init,
    encoder,
    encoder_init,
    layer_norm,
)
from .imagebert_b import image_tokens


@dataclass(frozen=True)
class TwoTowerConfig:
    bert: BertConfig = BertConfig(num_hidden_layers=4)
    embed_dim: int = 128
    temperature: float = 0.05


def two_tower_config() -> TwoTowerConfig:
    """Default config, shrinkable via KMR_TOWER_CONFIG_OVERRIDES (JSON with
    optional "bert" sub-dict), mirroring the registry's KMR_CONFIG_OVERRIDES
    hook so CLI tests can run tiny towers."""
    import json
    import os

    overrides = os.environ.get("KMR_TOWER_CONFIG_OVERRIDES")
    if not overrides:
        return TwoTowerConfig()
    raw = dict(json.loads(overrides))
    bert = BertConfig(num_hidden_layers=4).replace(**raw.pop("bert", {}))
    return TwoTowerConfig(bert=bert, **raw)


def init_params(rng: jax.Array, tcfg: TwoTowerConfig) -> Params:
    cfg = tcfg.bert
    ks = jax.random.split(rng, 8)
    return {
        "bert": {"embeddings": embeddings_init(ks[0], cfg)},
        "query_encoder": encoder_init(ks[1], cfg),
        "product_encoder": encoder_init(ks[2], cfg),
        # image path reuses the ImageBERT-B parameter shapes
        "kdd_conv1": {
            "weights": 0.02 * jax.random.normal(ks[3], (8, cfg.hidden_size, cfg.hidden_size)),
            "biases": jnp.zeros((cfg.hidden_size,), jnp.float32),
        },
        "kdd_dense1": dense_init(ks[4], 5, cfg.hidden_size, cfg.initializer_range),
        "kdd_conv2": dense_init(ks[5], 2048, cfg.hidden_size, cfg.initializer_range),
        "query_proj": dense_init(ks[6], cfg.hidden_size, tcfg.embed_dim, cfg.initializer_range),
        "product_proj": dense_init(ks[7], cfg.hidden_size, tcfg.embed_dim, cfg.initializer_range),
    }


def _l2(x: jax.Array) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def embed_query(
    p: Params, batch: dict, tcfg: TwoTowerConfig, prec: Precision = Precision.f32()
) -> jax.Array:
    """batch: input_ids [B,20], len_query [B] -> [B, D] unit embeddings."""
    cfg = tcfg.bert
    emb = p["bert"]["embeddings"]
    x = emb["word_embeddings"][batch["input_ids"]]
    x = x + emb["position_embeddings"][:MAX_QUERY_LEN_AB]
    x = layer_norm(emb["LayerNorm"], x, out_dtype=prec.compute_dtype)
    mask = jnp.arange(MAX_QUERY_LEN_AB)[None, :] < batch["len_query"][:, None]
    bias = ((1.0 - mask.astype(jnp.float32)) * -10000.0)[:, None, None, :]
    seq = encoder(p["query_encoder"], x, bias, cfg, prec)
    pooled = seq[:, 0, :]
    return _l2(dense(p["query_proj"], pooled, prec))


def embed_product(
    p: Params, batch: dict, tcfg: TwoTowerConfig, prec: Precision = Precision.f32()
) -> jax.Array:
    """batch: boxes/features/label_ids/num_boxes -> [B, D] unit embeddings."""
    cfg = tcfg.bert
    img = image_tokens(p, batch, prec).astype(prec.compute_dtype)  # [B, 10, H]
    mask = jnp.arange(MAX_BOXES)[None, :] < batch["num_boxes"][:, None]
    bias = ((1.0 - mask.astype(jnp.float32)) * -10000.0)[:, None, None, :]
    seq = encoder(p["product_encoder"], img, bias, cfg, prec)
    m = mask.astype(jnp.float32)[..., None]
    pooled = jnp.sum(seq * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return _l2(dense(p["product_proj"], pooled, prec))


def apply(
    p: Params,
    batch: dict,
    tcfg: TwoTowerConfig,
    prec: Precision = Precision.f32(),
    rng: jax.Array | None = None,  # towers are dropout-free; kept for the
    # Trainer's uniform ModelSpec.apply signature
) -> dict:
    """Both towers over aligned (query, product) rows.

    ``score`` is the cosine of each aligned pair; the in-batch contrastive
    loss consumes ``q_emb``/``p_emb`` directly.
    """
    del rng
    q = embed_query(p, batch, tcfg, prec)
    pe = embed_product(p, batch, tcfg, prec)
    score = jnp.sum(q * pe, axis=-1)
    # 2-col probs so the generic accuracy metric in the Trainer works
    probs = jnp.stack([1.0 - score, score], axis=-1)
    return {"q_emb": q, "p_emb": pe, "score": score, "probs": probs}


def contrastive_loss(
    q_emb: jax.Array,
    p_emb: jax.Array,
    temperature: float = 0.05,
    group_ids: jax.Array | None = None,
) -> tuple[jax.Array, dict]:
    """Symmetric in-batch InfoNCE; diagonal pairs are the positives.

    ``group_ids`` (e.g. query ids, [B] int): off-diagonal pairs sharing a
    group are masked out of the softmax -- on real data one query maps to
    many products, and without the mask those co-positive rows are trained
    as false negatives (train.py threads query_id through as
    ``query_group``)."""
    logits = (q_emb @ p_emb.T) / temperature
    b = q_emb.shape[0]
    labels = jnp.arange(b)
    if group_ids is not None:
        same = group_ids[:, None] == group_ids[None, :]
        off_diag = ~jnp.eye(b, dtype=bool)
        logits = jnp.where(same & off_diag, -jnp.inf, logits)
    loss_q = -jnp.mean(jax.nn.log_softmax(logits, axis=1)[labels, labels])
    loss_p = -jnp.mean(jax.nn.log_softmax(logits, axis=0)[labels, labels])
    acc = jnp.mean((jnp.argmax(logits, axis=1) == labels).astype(jnp.float32))
    return 0.5 * (loss_q + loss_p), {"in_batch_accuracy": acc}


# --------------------------------------------------------------------------
# exact on-device recall
# --------------------------------------------------------------------------


def top_k_products(
    q_emb: jax.Array,  # [Q, D]
    catalog: jax.Array,  # [N, D] (bf16 recommended)
    k: int = 5,
    chunk: int = 1 << 18,
    num_valid: jax.Array | int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Exact MIPS over the catalog, chunked to bound the [Q, chunk] scores.

    ``num_valid`` (static or traced scalar) marks rows ``>= num_valid`` as
    padding: they score -inf and can never displace real candidates. Used by
    :func:`recall_sharded`, whose device padding otherwise scores 0.

    -> (scores [Q, k], indices [Q, k]).
    """
    n = catalog.shape[0]
    if num_valid is None:
        num_valid = n
    n_chunks = (n + chunk - 1) // chunk
    pad = n_chunks * chunk - n
    cat = jnp.pad(catalog, ((0, pad), (0, 0)), constant_values=0)
    cat = cat.reshape(n_chunks, chunk, -1)

    def body(carry, inp):
        best_s, best_i = carry
        c_idx, c_block = inp
        scores = jnp.einsum(
            "qd,nd->qn", q_emb.astype(c_block.dtype), c_block,
            preferred_element_type=jnp.float32,
        )
        base = c_idx * chunk
        idx = base + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(idx < num_valid, scores, -jnp.inf)  # mask padded rows
        merged_s = jnp.concatenate([best_s, scores], axis=1)
        merged_i = jnp.concatenate([best_i, idx], axis=1)
        top_s, top_pos = jax.lax.top_k(merged_s, k)
        top_i = jnp.take_along_axis(merged_i, top_pos, axis=1)
        return (top_s, top_i), None

    q = q_emb.shape[0]
    # derive a zero from the catalog so the carry inherits its varying-axes
    # annotation when this runs inside shard_map (scan carries must match)
    zero_f = (cat.reshape(-1)[0] * 0).astype(jnp.float32)
    init = (
        jnp.full((q, k), -jnp.inf, jnp.float32) + zero_f,
        jnp.full((q, k), -1, jnp.int32) + zero_f.astype(jnp.int32),
    )
    (scores, indices), _ = jax.lax.scan(
        body, init, (jnp.arange(n_chunks, dtype=jnp.int32), cat)
    )
    return scores, indices


def recall_sharded(
    q_emb: jax.Array,
    catalog: jax.Array,
    mesh,
    k: int = 5,
    chunk: int = 1 << 18,
):
    """Catalog sharded over the ``data`` axis; per-shard top-k then a global
    merge (all_gather of k candidates per shard -- k*devices rows, tiny)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    n_dev = mesh.shape[DATA_AXIS]
    n = catalog.shape[0]
    pad = (-n) % n_dev
    catalog = jnp.pad(catalog, ((0, pad), (0, 0)))

    cat_sharding = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())
    catalog = jax.device_put(catalog, cat_sharding)
    q_emb = jax.device_put(q_emb, rep)

    def shard_fn(q, cat_shard):
        def local(q, c):
            # per-shard exact top-k; the k*n_devices candidates are merged
            # outside the shard_map (tiny: [Q, k*devices]). The device-pad
            # rows live at the tail of the LAST shard: bound each shard's
            # valid count so zero-padding can't displace real (possibly
            # negative-scoring) candidates from the per-shard top-k.
            shard = jax.lax.axis_index(DATA_AXIS)
            shard_size = c.shape[0]
            valid = jnp.clip(n - shard * shard_size, 0, shard_size)
            s, i = top_k_products(
                q, c, k=k, chunk=min(chunk, shard_size), num_valid=valid
            )
            return s, i + shard * shard_size

        s, i = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS)),
            out_specs=(P(None, DATA_AXIS), P(None, DATA_AXIS)),
        )(q, cat_shard)
        top_s, pos = jax.lax.top_k(s, k)
        return top_s, jnp.take_along_axis(i, pos, axis=1)

    scores, indices = jax.jit(shard_fn)(q_emb, catalog)
    # drop hits in the padded tail
    valid = indices < n
    return jnp.where(valid, scores, -jnp.inf), jnp.where(valid, indices, -1)
