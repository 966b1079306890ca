"""Int8 quantised serving path.

The v5e MXU does int8 x int8 -> int32 at twice the bf16 rate; since this
model family is MXU-bound at ~6.9 GFLOP/pair (BASELINE.md's 50k pairs/s/chip
target exceeds the bf16 roofline), a quantised mode is the path to the
north-star throughput. This is a *serving* mode: strict-parity scoring stays
f32/bf16.

Scheme: weights per-output-channel symmetric int8; activations dynamically
quantised per row (symmetric, abs-max). y = (x_q @ w_q) * (sx * sw), bias
added in f32. LayerNorm/softmax/heads stay f32; embeddings stay
full-precision (gathers are not MXU work).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Params = dict

QUANT_KERNEL = "kernel_q8"
QUANT_SCALE = "kernel_scale"


def quantize_kernel(kernel: jax.Array) -> dict:
    """f32 [..., in, out] -> {kernel_q8 int8 [..., in, out], kernel_scale
    f32 [..., out]}. Leading dims (the scan-stacked [L, in, out] encoder
    kernels) quantise per (layer, output channel); ``lax.scan`` then slices
    both fields per layer, handing ``dense_q8`` an ordinary [in, out]."""
    k = kernel.astype(jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=-2)  # per output channel
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(k / scale[..., None, :]), -127, 127).astype(jnp.int8)
    return {QUANT_KERNEL: q, QUANT_SCALE: scale}


def dense_q8(p: Params, x: jax.Array) -> jax.Array:
    """Quantised dense: dynamic per-row activation quant, int8 MXU matmul."""
    xf = x.astype(jnp.float32)
    x_amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    x_scale = jnp.maximum(x_amax, 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q,
        p[QUANT_KERNEL],
        dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * x_scale * p[QUANT_SCALE]
    return y + p["bias"].astype(jnp.float32)


def quantize_dense_tree(
    params,
    *,
    skip_paths: tuple[str, ...] = (),
    only_paths: tuple[str, ...] | None = None,
) -> Params:
    """Replace every {kernel, bias} dense in the tree with its int8 form.

    ``skip_paths``: substrings of the '/'-joined path to leave in full
    precision (e.g. heads whose 2-wide outputs gain nothing from int8).
    ``only_paths``: if given, quantise ONLY denses whose path contains one
    of these substrings -- e.g. ``("ffn",)`` for the FFN-only serving mode:
    the measured int8 MXU win is shape-gated to >=2048-wide contractions
    (docs/BENCH.md), which on this family means exactly the M.768.3072 and
    M.3072.768 FFN matmuls (~2/3 of per-pair FLOPs); the 768-wide attention
    projections stay bf16 where int8 measures <= 1.0x.
    """

    def rec(node, path: str):
        if isinstance(node, dict):
            if "kernel" in node and "bias" in node and node["kernel"].ndim >= 2:
                wanted = only_paths is None or any(s in path for s in only_paths)
                if wanted and not any(s in path for s in skip_paths):
                    q = quantize_kernel(node["kernel"])
                    return {**q, "bias": node["bias"]}
            return {k: rec(v, f"{path}/{k}") for k, v in node.items()}
        return node

    return rec(params, "")


def is_quantized(p: Params) -> bool:
    return QUANT_KERNEL in p


def cast_residual_bf16(
    params: Params, *, skip_paths: tuple[str, ...] = ()
) -> Params:
    """Cast the remaining f32 leaves of a quantised tree to bf16 (embeddings,
    LayerNorms, biases), keeping the ``kernel_scale`` factors f32 -- scales
    multiply an int32 accumulation and bf16's 8-bit mantissa would
    re-quantise the dequantisation itself. ``skip_paths`` keeps whole
    subtrees f32 (pass the same paths as ``quantize_dense_tree`` so e.g.
    margin-sensitive scoring heads stay FULL precision, not just
    unquantised)."""
    import jax.tree_util as jtu

    def cast(path, x):
        if str(x.dtype) != "float32":
            return x
        keys = [str(getattr(k, "key", "")) for k in path]
        if QUANT_SCALE in keys:
            return x
        if skip_paths and any(s in "/".join(keys) for s in skip_paths):
            return x
        return x.astype(jnp.bfloat16)

    return jtu.tree_map_with_path(cast, params)
