"""Fused encoder layer: self-attention block + FFN block in ONE kernel.

MEASURED NEGATIVE at model scale on v5e -- kept as an opt-in
(``KMR_FUSED_LAYER=1``) with full interpret + on-device test coverage.
One launch per layer halves the per-layer kernel count and keeps the
attention output in VMEM for the FFN instead of round-tripping [B, S, H]
through HBM, but whole-model it measured SLOWER everywhere (B=8192,
2 reps, <0.1% run-to-run noise): imagebert_a 24,277 -> 22,714 pairs/s
(-6.4%), imagebert_b 25,381 -> 23,884 (-5.9%), lxmert 18,281 -> 18,005
(-1.4%). The FFN-only kernel runs at 81% MFU with its own block size and
double-buffer depth; fusing pins it to the attention half's smaller block
(VMEM-limited at S=40) and keeps ~14 MB of layer weights resident, which
shrinks Mosaic's pipelining headroom. The saved HBM round-trip
(2*B*S*H bf16 ~ 0.5 ms/layer at B=8192) does not cover that loss.
Same conclusion as the round-2 "FFN 128-row fold" negative: past ~80% MFU,
merging kernels trades away the scheduler freedom that got them there.

Semantics match `attention_block_pallas` followed by `ffn_block_pallas`
bit-for-bit at the block level (same matmul dtypes, f32 LayerNorms, same
head-packed or per-head-loop attention, same GELU variants) -- reference
behavior: BertLayer = attention + intermediate + output in
`/root/reference/code/imagebert_lds/src/pixelmodel.py` (TF) and
`lxmert/src/lxrt/modeling.py:407-427` (torch).

Inference-only (training uses the custom-VJP blocks in pallas_train.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_attention import packed_heads_attention
from .pallas_ffn import _erf_as


def _layer_kernel(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, g1_ref, be1_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, be2_ref, bias_ref, o_ref,
    *, num_heads, eps, headpack, approximate_gelu,
):
    x = x_ref[:]  # [BLOCK, S, H]
    block, s, h = x.shape
    dh = h // num_heads
    scale = 1.0 / (dh**0.5)
    x2d = x.reshape(block * s, h)
    qkv = (
        jax.lax.dot(x2d, wqkv_ref[:], preferred_element_type=jnp.float32)
        + bqkv_ref[:].astype(jnp.float32)
    ).astype(x.dtype).reshape(block, s, 3 * h)
    bias = None
    if bias_ref is not None:
        b = bias_ref[:].astype(jnp.float32)
        bias = b[:, None, :] if b.ndim == 2 else b  # compact key-mask rows
    if headpack:
        ctx = packed_heads_attention(
            qkv[..., :h], qkv[..., h : 2 * h], qkv[..., 2 * h :],
            bias, num_heads, scale, x.dtype,
        )
    else:
        head_outs = []
        for n in range(num_heads):
            q = qkv[..., n * dh : (n + 1) * dh]
            k = qkv[..., h + n * dh : h + (n + 1) * dh]
            v = qkv[..., 2 * h + n * dh : 2 * h + (n + 1) * dh]
            scores = jax.lax.dot_general(
                q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale
            if bias is not None:
                scores = scores + bias
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            head_outs.append(
                jax.lax.dot_general(
                    probs, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
            )
        ctx = jnp.concatenate(head_outs, axis=-1)
    o2d = (
        jax.lax.dot(
            ctx.reshape(block * s, h), wo_ref[:],
            preferred_element_type=jnp.float32,
        )
        + bo_ref[:].astype(jnp.float32)
    )
    y = o2d + x2d.astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps)
    y = y * g1_ref[:].astype(jnp.float32) + be1_ref[:].astype(jnp.float32)
    # -- FFN half: the attention output never leaves VMEM --
    a2d = y.astype(x.dtype)  # matches the two-kernel path's bf16 boundary
    hmid = (
        jax.lax.dot(a2d, w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[:].astype(jnp.float32)
    )
    if approximate_gelu:
        hmid = jax.nn.gelu(hmid, approximate=True)
    else:
        hmid = 0.5 * hmid * (1.0 + _erf_as(hmid * (2.0**-0.5)))
    out = (
        jax.lax.dot(hmid.astype(x.dtype), w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[:].astype(jnp.float32)
    )
    y = out + a2d.astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps)
    y = y * g2_ref[:].astype(jnp.float32) + be2_ref[:].astype(jnp.float32)
    o_ref[:] = y.reshape(block, s, h).astype(o_ref.dtype)


def _layer_no_bias(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, g1_ref, be1_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, be2_ref, o_ref, **kw,
):
    _layer_kernel(
        x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, g1_ref, be1_ref,
        w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, be2_ref, None, o_ref, **kw,
    )


def encoder_layer_pallas(
    x: jax.Array,  # [B, S, H]
    wqkv: jax.Array,  # [H, 3H]
    bqkv: jax.Array,
    wo: jax.Array,  # [H, H]
    bo: jax.Array,
    gamma1: jax.Array,
    beta1: jax.Array,
    w1: jax.Array,  # [H, I]
    b1: jax.Array,
    w2: jax.Array,  # [I, H]
    b2: jax.Array,
    gamma2: jax.Array,
    beta2: jax.Array,
    num_heads: int,
    bias: jax.Array | None = None,  # [B, 1, 1, S] additive key mask
    approximate_gelu: bool = True,
    eps: float = 1e-12,
    block_b: int | None = None,
    variant: str = "auto",  # "auto" | "loop" | "headpack"
    interpret: bool = False,
) -> jax.Array:
    """Whole encoder layer (self-attn block + FFN block) in one launch."""
    from .pallas_attention import headpack_group

    b, s, h = x.shape
    if variant == "auto":
        variant = "headpack" if headpack_group(num_heads, s) > 1 else "loop"
    if block_b is None:
        block_b = 16 if s <= 24 else 8
    block = min(block_b, b)
    grid = (pl.cdiv(b, block),)
    dtype = x.dtype

    def xi(i):
        return (i, 0, 0)

    def const2(i):
        return (0, 0)

    def const1(i):
        return (0,)

    in_specs = [
        pl.BlockSpec((block, s, h), xi, memory_space=pltpu.VMEM),
        pl.BlockSpec(wqkv.shape, const2, memory_space=pltpu.VMEM),
        pl.BlockSpec(bqkv.shape, const1, memory_space=pltpu.VMEM),
        pl.BlockSpec(wo.shape, const2, memory_space=pltpu.VMEM),
        pl.BlockSpec(bo.shape, const1, memory_space=pltpu.VMEM),
        pl.BlockSpec(gamma1.shape, const1, memory_space=pltpu.VMEM),
        pl.BlockSpec(beta1.shape, const1, memory_space=pltpu.VMEM),
        pl.BlockSpec(w1.shape, const2, memory_space=pltpu.VMEM),
        pl.BlockSpec(b1.shape, const1, memory_space=pltpu.VMEM),
        pl.BlockSpec(w2.shape, const2, memory_space=pltpu.VMEM),
        pl.BlockSpec(b2.shape, const1, memory_space=pltpu.VMEM),
        pl.BlockSpec(gamma2.shape, const1, memory_space=pltpu.VMEM),
        pl.BlockSpec(beta2.shape, const1, memory_space=pltpu.VMEM),
    ]
    args = [x, wqkv.astype(dtype), bqkv, wo.astype(dtype), bo, gamma1, beta1,
            w1.astype(dtype), b1, w2.astype(dtype), b2, gamma2, beta2]
    kw = dict(
        num_heads=num_heads, eps=eps, headpack=(variant == "headpack"),
        approximate_gelu=approximate_gelu,
    )
    if bias is not None:
        if not (bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1):
            raise ValueError("encoder_layer_pallas needs a compact key mask")
        args.append(bias.reshape(b, s))
        in_specs.append(
            pl.BlockSpec((block, s), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        kernel = functools.partial(_layer_kernel, **kw)
    else:
        kernel = functools.partial(_layer_no_bias, **kw)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block, s, h), xi, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, h), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
