"""Fused FFN block kernel: LN(x + W2 gelu(W1 x + b1) + b2) in one pass.

At 30-43 token sequences the FFN's elementwise chain (GELU, bias adds,
residual, float32 LayerNorm) costs multiple HBM round-trips of the [B, S, H]
activations when left to XLA. This kernel blocks over the batch and keeps
the whole chain in VMEM; both weight matrices (768x3072 + 3072x768 bf16
~9.4 MB) are fetched once and reused across grid steps (constant index_map).

Matmuls accumulate in float32; GELU and LayerNorm run in float32; the
residual stream is read/written in the caller's dtype. GELU variant is
selectable (tanh for the TF stacks, erf for LXMERT).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf_as(x):
    """erf via Abramowitz-Stegun 7.1.26 (|err| <= 1.5e-7): Mosaic has no
    erf/erfc primitive, and 1.5e-7 is far below bf16 resolution."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _ffn_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, gamma_ref, beta_ref, o_ref,
    *, approximate_gelu: bool, eps: float,
):
    x = x_ref[:]  # [BLOCK, S, H]
    block, s, h = x.shape
    x2d = x.reshape(block * s, h)
    hmid = jax.lax.dot(
        x2d, w1_ref[:], preferred_element_type=jnp.float32
    ) + b1_ref[:].astype(jnp.float32)
    if approximate_gelu:
        hmid = jax.nn.gelu(hmid, approximate=True)
    else:
        hmid = 0.5 * hmid * (1.0 + _erf_as(hmid * (2.0**-0.5)))
    hmid = hmid.astype(x.dtype)
    out = jax.lax.dot(
        hmid, w2_ref[:], preferred_element_type=jnp.float32
    ) + b2_ref[:].astype(jnp.float32)
    y = out + x2d.astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps)
    y = y * gamma_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    o_ref[:] = y.reshape(block, s, h).astype(o_ref.dtype)


@functools.lru_cache(maxsize=1)
def _fold_min_waste() -> float:
    """Sublane-pad waste threshold above which (B,S) is folded to 128-row
    slabs; KMR_FFN_FOLD_MIN_WASTE overrides (set e.g. 0.1 to enable).

    Default OFF: measured on v5e (B=8192), folding was -5% whole-model at
    S=30, -6% on LXMERT's S=23/10 streams and neutral at S=40 -- the
    [B,S,H]<->[*,128,H] reshape at the kernel boundary is a real tiled-
    layout copy on TPU, which eats the pad savings. Kept because the
    trade-off is layout/hardware-dependent and trivially re-enableable."""
    import os

    return float(os.environ.get("KMR_FFN_FOLD_MIN_WASTE", "1.01"))


def ffn_block_pallas(
    x: jax.Array,  # [B, S, H]
    w1: jax.Array,  # [H, I]
    b1: jax.Array,  # [I]
    w2: jax.Array,  # [I, H]
    b2: jax.Array,  # [H]
    gamma: jax.Array,  # [H]
    beta: jax.Array,  # [H]
    approximate_gelu: bool = True,
    eps: float = 1e-12,
    block_b: int = 8,
    interpret: bool = False,
) -> jax.Array:
    b, s, h = x.shape
    # The whole block is position-independent (two matmuls + row-wise LN),
    # so token rows can be re-bucketed freely. Fold (B, S) into lane-tile-
    # aligned [*, 128, H] slabs when divisible: S = 10/23/40 pad the sublane
    # dim to 16/32/48 inside every VMEM tile (20-60% wasted rows + an
    # in-kernel relayout for the matmul reshape); S = 128 tiles are dense
    # and the kernel reshape is a no-op. Measured on v5e: +10% whole-model
    # at S=40, but a slight LOSS at S=30 (6.7% pad < the fold's reshape
    # boundary cost), hence the >=12% waste threshold.
    pad_waste = (-s % 16) / s
    if (b * s) % 128 == 0 and s != 128 and pad_waste >= _fold_min_waste():
        rows_per_block = max(1, (block_b * s + 64) // 128)
        y = ffn_block_pallas(
            x.reshape(-1, 128, h), w1, b1, w2, b2, gamma, beta,
            approximate_gelu=approximate_gelu, eps=eps,
            block_b=rows_per_block, interpret=interpret,
        )
        return y.reshape(b, s, h)
    block = min(block_b, b)
    grid = (pl.cdiv(b, block),)
    dtype = x.dtype

    def xi(i):
        return (i, 0, 0)

    def const2(i):
        return (0, 0)

    def const1(i):
        return (0,)

    kernel = functools.partial(
        _ffn_kernel, approximate_gelu=approximate_gelu, eps=eps
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, s, h), xi, memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, const1, memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, const1, memory_space=pltpu.VMEM),
            pl.BlockSpec(gamma.shape, const1, memory_space=pltpu.VMEM),
            pl.BlockSpec(beta.shape, const1, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, s, h), xi, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, h), dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x, w1.astype(dtype), b1, w2.astype(dtype), b2, gamma, beta)
