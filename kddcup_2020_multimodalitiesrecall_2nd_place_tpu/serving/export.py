"""AOT serving export: compile-once, deploy-without-model-code artifacts.

The reference "deployed" a model by rebuilding its TF graph and restoring a
Saver checkpoint inside every predict script
(``imagebert_lds/src/run_pretraining_predict_score.py:522-593`` and the
three sibling scorers each re-declare the whole model). The TPU-native
equivalent is an ahead-of-time export: the jitted scoring computation (the
same function ``parallel.engine.ScoringEngine`` jits) is lowered to
versioned StableHLO with ``jax.export``, serialized into a directory
artifact, and reloaded anywhere a compatible jax runtime exists -- no model
python, no checkpoint plumbing, weights baked in like a frozen graph.

Design choices:

* **Weights are baked in** (closed over as constants): one artifact = one
  (model, checkpoint, batch size) triple, mirroring the reference's frozen
  per-checkpoint scorers. bf16 BERT-Base weights add ~220 MB.
* **The XLA attention backend is the default export path.** The fused
  Pallas kernels serialize as ``tpu_custom_call`` payloads, which pin the
  artifact to the exporting compiler version; plain StableHLO rides jax's
  cross-version compatibility guarantees (>= 1 month backward per the
  export docs). Same-fleet deployments can opt the packed kernels in with
  ``backend="pallas_packed"`` (adds the custom-call safety exemption).
* **Fixed batch size**: serving pads the tail batch, exactly like
  ``ScoringEngine.score_files`` does.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

import numpy as np

BLOB = "scorer.jaxexport"
META = "meta.json"


def export_scorer(
    spec,
    params,
    batch_size: int | None,
    precision=None,
    platforms: tuple[str, ...] | None = None,
    backend: str = "xla",
):
    """Export ``spec``'s scoring fn with ``params`` baked in -> Exported.

    ``batch_size``: fixed batch shape, or None for a batch-POLYMORPHIC
    artifact (symbolic leading dim -- one compile serves any batch size,
    no tail padding; XLA specializes per concrete size at run time).
    ``platforms``: e.g. ``("tpu",)`` or ``("tpu", "cpu")`` (multi-platform
    artifacts are bigger but portable); None = the current default backend.
    ``backend``: attention backend traced into the artifact ("xla" portable,
    "pallas_packed" fused kernels via a custom-call exemption).
    """
    import jax
    from jax import export as jexport

    from ..data.batchspec import batch_spec
    from ..models import Precision
    from ..ops import attention

    precision = precision or Precision.bf16()
    dev_params = jax.tree.map(jax.numpy.asarray, params)

    def score(feats):
        return spec.apply(dev_params, feats, spec.config, precision)["score"]

    b = jexport.symbolic_shape("b")[0] if batch_size is None else batch_size
    specs = batch_spec(spec.name, spec.config, b)
    disabled = ()
    if backend == "pallas_packed":
        disabled = (jexport.DisabledSafetyCheck.custom_call("tpu_custom_call"),)

    with attention.attention_backend(backend):
        return jexport.export(
            jax.jit(score),
            platforms=list(platforms) if platforms else None,
            disabled_checks=disabled,
        )(specs)


def export_tower(
    params,
    tcfg,
    side: str,  # "query" | "product"
    batch_size: int | None,
    precision=None,
    platforms: tuple[str, ...] | None = None,
):
    """Export one two-tower embedder (the cascade's recall stage) -> Exported.

    ``side="query"`` embeds input_ids [B,20] + len_query [B];
    ``side="product"`` embeds boxes/features/label_ids/num_boxes -- the same
    fields ``recall.py build`` streams through the product tower. Together
    with :func:`export_scorer` (the rerank cross-encoder) this freezes the
    full retrieval cascade for serving. batch_size=None -> batch-polymorphic.
    """
    import jax

    from ..models import Precision
    from ..models.two_tower import embed_product, embed_query
    from ..ops import attention

    precision = precision or Precision.bf16()
    dev_params = jax.tree.map(jax.numpy.asarray, params)
    if side == "query":
        fn = lambda b: embed_query(dev_params, b, tcfg, precision)  # noqa: E731
        shapes = {"input_ids": ((20,), np.int32), "len_query": ((), np.int32)}
    elif side == "product":
        fn = lambda b: embed_product(dev_params, b, tcfg, precision)  # noqa: E731
        shapes = {
            "boxes": ((10, 5), np.float32),
            "features": ((10, 2048), np.float32),
            "label_ids": ((10, 8), np.int32),
            "num_boxes": ((), np.int32),
        }
    else:
        raise ValueError(f"side must be 'query' or 'product', got {side!r}")
    from jax import export as jexport

    b = (
        jexport.symbolic_shape("b")[0]
        if batch_size is None
        else batch_size
    )
    specs = {
        k: jax.ShapeDtypeStruct((b, *trail), dt) for k, (trail, dt) in shapes.items()
    }
    # pin the portable XLA attention path regardless of the ambient global
    # backend (a process-wide "pallas_packed" would trace tpu_custom_calls
    # into the artifact and fail export's custom-call safety check) -- the
    # meta sidecar records attention_backend="xla" for towers
    with attention.attention_backend("xla"):
        return jexport.export(
            jax.jit(fn),
            platforms=list(platforms) if platforms else None,
        )(specs)


def save_scorer(
    out_dir,
    exported,
    spec,
    batch_size: int | None,
    backend: str,
    extra: dict | None = None,
) -> dict:
    """Write the serialized artifact + a meta sidecar; returns the meta.
    ``spec``: a ModelSpec, or a plain model-name string (tower embedders).
    ``extra``: additional meta fields (e.g. quantize mode) recorded in the
    on-disk sidecar, not just the returned dict."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / BLOB).write_bytes(exported.serialize())
    import jax

    meta = {
        "model": spec if isinstance(spec, str) else spec.name,
        "batch_size": batch_size,
        "attention_backend": backend,
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "calling_convention_version": exported.calling_convention_version,
        **(extra or {}),
    }
    (out / META).write_text(json.dumps(meta, indent=1))
    return meta


@dataclass
class ServingScorer:
    """A reloaded artifact: ``scores = scorer(batch)`` with tail padding."""

    exported: object
    meta: dict

    @property
    def batch_size(self) -> int | None:
        """Fixed artifact batch size, or None for batch-polymorphic."""
        b = self.meta["batch_size"]
        return None if b is None else int(b)

    @property
    def feature_keys(self) -> set[str]:
        """Feature-dict keys the artifact was traced with."""
        import jax.tree_util as jtu

        t = self.exported.in_tree
        args, _kwargs = jtu.tree_unflatten(t, [None] * t.num_leaves)
        return set(args[0])

    def __call__(self, feats: dict) -> np.ndarray:
        want = self.feature_keys
        if set(feats) != want:  # readable error instead of a pytree mismatch
            raise ValueError(
                f"artifact expects feature keys {sorted(want)}; missing "
                f"{sorted(want - set(feats))}, unexpected "
                f"{sorted(set(feats) - want)}"
            )
        n = next(iter(feats.values())).shape[0]
        b = self.batch_size
        if b is None:  # polymorphic artifact: any batch size, no padding
            return np.asarray(self.exported.call(feats))
        if n > b:
            raise ValueError(f"batch {n} exceeds artifact batch size {b}")
        if n < b:  # pad the tail batch, as ScoringEngine does
            feats = {
                k: np.concatenate(
                    [v, np.zeros((b - n, *v.shape[1:]), v.dtype)], axis=0
                )
                for k, v in feats.items()
            }
        return np.asarray(self.exported.call(feats))[:n]


def load_scorer(artifact_dir) -> ServingScorer:
    from jax import export as jexport

    d = Path(artifact_dir)
    exported = jexport.deserialize((d / BLOB).read_bytes())
    meta = json.loads((d / META).read_text())
    return ServingScorer(exported=exported, meta=meta)
