"""Pallas TPU fused attention for short cross-modal sequences.

These models attend over 30-43 tokens, so unlike long-context flash
attention the blocking dimension is the **pair batch**, not sequence
length: each grid step loads a [BLOCK_BN, S, Dh] slab of (batch x head)
rows into VMEM and runs QK^T -> scale -> +bias -> softmax -> PV entirely
on-chip, writing one fused output slab. Softmax is computed in float32.

For these shapes XLA's fused batched-matmul path is already close to the
HBM-bandwidth roofline (weights dominate traffic, not activations), so the
kernel is benchmarked against ``mha_xla`` at runtime; ``best_mha`` picks the
faster backend once per (shape, dtype). Correctness is validated in
interpreter mode on CPU against the XLA reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[:]  # [BLOCK, S, Dh]
    k = k_ref[:]
    v = v_ref[:]
    scores = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    scores = scores * scale
    if bias_ref is not None:
        scores = scores + bias_ref[:].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jax.lax.dot_general(
        probs,
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = out.astype(o_ref.dtype)


def mha_pallas(
    q: jax.Array,  # [B, N, S, Dh]
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array | None = None,  # [B, 1 or N, S, S] additive or None
    block_bn: int = 64,
    interpret: bool = False,
) -> jax.Array:
    """Fused attention; returns [B, N, S, Dh] like ``mha_xla``."""
    b, n, s, dh = q.shape
    bn = b * n
    qf = q.reshape(bn, s, dh)
    kf = k.reshape(bn, s, dh)
    vf = v.reshape(bn, s, dh)
    scale = 1.0 / (dh**0.5)

    block = min(block_bn, bn)
    grid = (pl.cdiv(bn, block),)

    def idx(i):
        return (i, 0, 0)

    in_specs = [
        pl.BlockSpec((block, s, dh), idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((block, s, dh), idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((block, s, dh), idx, memory_space=pltpu.VMEM),
    ]
    args = [qf, kf, vf]
    if bias is not None:
        bias_full = jnp.broadcast_to(bias, (b, n, s, s)).reshape(bn, s, s)
        in_specs.append(pl.BlockSpec((block, s, s), idx, memory_space=pltpu.VMEM))
        args.append(bias_full)
        kernel = functools.partial(_attention_kernel, scale=scale)
    else:
        kernel = functools.partial(_no_bias_kernel, scale=scale)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block, s, dh), idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bn, s, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*args)
    return out.reshape(b, n, s, dh)


def _no_bias_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    _attention_kernel(q_ref, k_ref, v_ref, None, o_ref, scale=scale)


# --------------------------------------------------------------------------
# packed layout: heads stay folded in the hidden dim
# --------------------------------------------------------------------------


def _packed_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, num_heads):
    """q/k/v [BLOCK, S, H] with heads packed along lanes; per-head slices are
    64-lane aligned so no [B,N,S,Dh] transpose ever materialises in HBM."""
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    h = q.shape[-1]
    dh = h // num_heads
    bias = bias_ref[:].astype(jnp.float32) if bias_ref is not None else None
    for n in range(num_heads):
        sl = slice(n * dh, (n + 1) * dh)
        scores = jax.lax.dot_general(
            q[..., sl],
            k[..., sl],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        scores = scores * scale
        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jax.lax.dot_general(
            probs,
            v[..., sl],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[..., sl] = out.astype(o_ref.dtype)


def mha_pallas_packed(
    q: jax.Array,  # [B, S, H] (heads packed)
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    bias: jax.Array | None = None,  # [B, 1, 1, S] or [B, 1, S, S] additive
    block_b: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Fused attention on the packed layout; returns [B, S, H]."""
    b, s, h = q.shape
    scale = 1.0 / ((h // num_heads) ** 0.5)
    block = min(block_b, b)
    grid = (pl.cdiv(b, block),)

    def idx(i):
        return (i, 0, 0)

    in_specs = [
        pl.BlockSpec((block, s, h), idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((block, s, h), idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((block, s, h), idx, memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if bias is not None:
        # bias comes in as [B, 1, F_or_1, S]; broadcast to [B, S, S]
        bias_full = jnp.broadcast_to(bias, (b, 1, s, s)).reshape(b, s, s)
        in_specs.append(pl.BlockSpec((block, s, s), idx, memory_space=pltpu.VMEM))
        args.append(bias_full)
        kernel = functools.partial(_packed_kernel, scale=scale, num_heads=num_heads)
    else:
        kernel = functools.partial(
            _packed_no_bias_kernel, scale=scale, num_heads=num_heads
        )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block, s, h), idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, h), q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*args)


def _packed_no_bias_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, num_heads):
    _packed_kernel(q_ref, k_ref, v_ref, None, o_ref, scale=scale, num_heads=num_heads)


# --------------------------------------------------------------------------
# fully fused attention block: QKV proj -> attention -> out proj -> +res -> LN
# --------------------------------------------------------------------------


def _attn_block_kernel(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, gamma_ref, beta_ref, bias_ref,
    o_ref, *, num_heads, eps,
):
    x = x_ref[:]  # [BLOCK, S, H]
    block, s, h = x.shape
    dh = h // num_heads
    scale = 1.0 / (dh**0.5)
    x2d = x.reshape(block * s, h)
    qkv = (
        jax.lax.dot(x2d, wqkv_ref[:], preferred_element_type=jnp.float32)
        + bqkv_ref[:].astype(jnp.float32)
    ).astype(x.dtype)
    qkv = qkv.reshape(block, s, 3 * h)
    bias = bias_ref[:].astype(jnp.float32) if bias_ref is not None else None
    if bias is not None and bias.ndim == 2:
        # compact key-mask rows [BLOCK, T]; broadcast over query positions
        bias = bias[:, None, :]
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
    ctx = jnp.concatenate(head_outs, axis=-1)  # [block, s, h]
    o2d = (
        jax.lax.dot(
            ctx.reshape(block * s, h),
            wo_ref[:],
            preferred_element_type=jnp.float32,
        )
        + bo_ref[:].astype(jnp.float32)
    )
    y = o2d + x2d.astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps)
    y = y * gamma_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    o_ref[:] = y.reshape(block, s, h).astype(o_ref.dtype)


def _attn_block_no_bias(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, gamma_ref, beta_ref, o_ref,
    *, num_heads, eps,
):
    _attn_block_kernel(
        x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, gamma_ref, beta_ref, None,
        o_ref, num_heads=num_heads, eps=eps,
    )


def headpack_group(num_heads: int, s: int) -> int:
    """Heads per pack: the largest divisor of num_heads with group*s <= 128
    lanes (one packed score tile per softmax)."""
    divisors = [d for d in range(num_heads, 0, -1) if num_heads % d == 0]
    for d in divisors:
        if d * s <= 128:
            return d
    return 1


def pack_kv(k_all, v_all, g0: int, g: int, dh: int, dtype):
    """Block-arranged K/V for heads g0..g0+g: head j's [T, Dh] slab lands in
    rows j*T..(j+1)*T and feature columns j*Dh..(j+1)*Dh of a
    [block, G*T, G*Dh] operand (zeros elsewhere), so NT/NN matmuls against
    it compute all G heads at once with no transposes."""
    block, t, _ = k_all.shape

    def placed(slab, j):
        # zero-width jnp.zeros operands fail Mosaic's broadcast lowering,
        # so only emit the nonempty pads
        parts = []
        if j:
            parts.append(jnp.zeros((block, t, j * dh), dtype))
        parts.append(slab)
        if g - 1 - j:
            parts.append(jnp.zeros((block, t, (g - 1 - j) * dh), dtype))
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=2)

    krows = [
        placed(k_all[..., (g0 + j) * dh : (g0 + j + 1) * dh], j) for j in range(g)
    ]
    vrows = [
        placed(v_all[..., (g0 + j) * dh : (g0 + j + 1) * dh], j) for j in range(g)
    ]
    kpack = krows[0] if g == 1 else jnp.concatenate(krows, axis=1)
    vpack = vrows[0] if g == 1 else jnp.concatenate(vrows, axis=1)
    return kpack, vpack


def segment_sums(x, g: int, t: int):
    """Per-segment lane sums broadcast back to every lane of the segment:
    one [G*T, G*T] block-diagonal-ones matmul, no relayouts."""
    block, f, _ = x.shape
    seg_i = jax.lax.broadcasted_iota(jnp.int32, (g * t, g * t), 0) // t
    seg_j = jax.lax.broadcasted_iota(jnp.int32, (g * t, g * t), 1) // t
    ones_bd = (seg_i == seg_j).astype(jnp.float32)
    return jax.lax.dot(
        x.reshape(block * f, g * t), ones_bd, preferred_element_type=jnp.float32
    ).reshape(block, f, g * t)


def packed_softmax(scores, g: int, t: int):
    """Segmented softmax on [block, F, G*T] packed scores: the global max
    stabilises against overflow (exp <= 1 everywhere) and the per-segment
    denominator comes from one block-diag-ones matmul. A per-segment max
    would need a lane relayout, so segments whose own max sits > ~88 below
    the global max underflow to e == 0 on every lane; the clamped
    denominator turns that 0/0 (which would NaN-contaminate ALL packed
    heads through the 0*NaN PV matmul) into probs == 0. Exact whenever each
    segment has a lane within f32-exp range of the global max -- always
    true for trained-model logits and for -10000-masked lanes as long as
    one live lane per segment exists (the data layer guarantees >=1 query
    token / >=1 box)."""
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    return e / jnp.maximum(segment_sums(e, g, t), 1e-30)


def tile_bias(bias, g: int):
    """Key-mask rows tiled across the G packed segments."""
    return bias if g == 1 else jnp.concatenate([bias] * g, axis=-1)


def packed_heads_attention(q_all, k_all, v_all, bias, num_heads, scale, dtype):
    """Head-packed scores/softmax/PV over [block, F, H] q and [block, T, H] k/v.

    Packs G heads' [F, T] score tiles into the lane dimension: K/V rows of
    head j land in rows j*T..(j+1)*T and feature columns j*Dh..(j+1)*Dh of a
    [block, G*T, G*Dh] operand, so one NT matmul yields the packed
    [block, F, G*T] scores with no transposes. Softmax then runs on G*T
    (<=128) lanes instead of T, and the per-segment denominator comes from
    one [G*T, G*T] block-diagonal-ones matmul -- no relayouts anywhere.
    The zero blocks waste (G-1)/G of the score/PV MACs, but those stages
    are ~2%% of block FLOPs while the softmax lane occupancy (the measured
    bottleneck at T<=32, docs/BENCH.md round 2) improves by ~G.
    Returns the concatenated per-head context [block, F, H].
    """
    t = k_all.shape[1]
    h = q_all.shape[2]
    n, dh = num_heads, h // num_heads
    g = headpack_group(n, t)
    ctx_parts = []
    for g0 in range(0, n, g):
        kpack, vpack = pack_kv(k_all, v_all, g0, g, dh, dtype)
        q = q_all[..., g0 * dh : (g0 + g) * dh]  # [block, F, G*Dh]
        scores = jax.lax.dot_general(
            q, kpack, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [block, F, G*T]
        if bias is not None:
            scores = scores + tile_bias(bias, g)
        probs = packed_softmax(scores, g, t).astype(dtype)
        ctx_parts.append(
            jax.lax.dot_general(
                probs, vpack, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype)  # [block, F, G*Dh]
        )
    return jnp.concatenate(ctx_parts, axis=-1)


def _attn_block_kernel_headpack(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, gamma_ref, beta_ref, bias_ref,
    o_ref, *, num_heads, eps,
):
    """Fused self-attention block with head-packed scores/softmax/PV."""
    x = x_ref[:]
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
        bias = b[:, None, :] if b.ndim == 2 else b
    ctx = packed_heads_attention(
        qkv[..., :h], qkv[..., h : 2 * h], qkv[..., 2 * h :],
        bias, num_heads, scale, x.dtype,
    )
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
    y = y * gamma_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    o_ref[:] = y.reshape(block, s, h).astype(o_ref.dtype)


def _attn_block_headpack_no_bias(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, gamma_ref, beta_ref, o_ref,
    *, num_heads, eps,
):
    _attn_block_kernel_headpack(
        x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, gamma_ref, beta_ref, None,
        o_ref, num_heads=num_heads, eps=eps,
    )


def _attn_block_kernel_headmajor(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, gamma_ref, beta_ref, bias_ref,
    o_ref, *, num_heads, eps,
):
    """Experimental head-major variant: transpose qkv to [BLOCK*N, S, Dh]
    once and run scores/softmax/PV as single batched ops (batch = BLOCK*N)
    instead of a python loop of N per-head dot_generals.

    Verdict on v5e: DO NOT USE at real sizes -- Mosaic unrolls the
    [block, s, 3, n, dh] transposes into a ~4.7 MB MLIR module (vs 139 KB
    for the loop variant) and the TPU compiler rejects it. Kept as a
    documented negative result (interpret-mode parity-tested)."""
    x = x_ref[:]  # [BLOCK, S, H]
    block, s, h = x.shape
    n, dh = num_heads, h // num_heads
    scale = 1.0 / (dh**0.5)
    x2d = x.reshape(block * s, h)
    qkv = (
        jax.lax.dot(x2d, wqkv_ref[:], preferred_element_type=jnp.float32)
        + bqkv_ref[:].astype(jnp.float32)
    ).astype(x.dtype)
    qkv = qkv.reshape(block, s, 3, n, dh).transpose(0, 2, 3, 1, 4)
    qkv = qkv.reshape(block, 3, n, s, dh)
    q = qkv[:, 0].reshape(block * n, s, dh)
    k = qkv[:, 1].reshape(block * n, s, dh)
    v = qkv[:, 2].reshape(block * n, s, dh)
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    if bias_ref is not None:
        bias = bias_ref[:].astype(jnp.float32)
        if bias.ndim == 2:  # compact key-mask rows [BLOCK, T]
            bias = bias[:, None, None, :]  # -> [BLOCK, 1, 1, T]
        else:  # [BLOCK, F, T]
            bias = bias[:, None, :, :]
        scores = (
            scores.reshape(block, n, s, s) + bias
        ).reshape(block * n, s, s)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jax.lax.dot_general(
        probs, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)  # [block*n, s, dh]
    ctx = ctx.reshape(block, n, s, dh).transpose(0, 2, 1, 3).reshape(block * s, h)
    o2d = (
        jax.lax.dot(ctx, wo_ref[:], preferred_element_type=jnp.float32)
        + bo_ref[:].astype(jnp.float32)
    )
    y = o2d + x2d.astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps)
    y = y * gamma_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    o_ref[:] = y.reshape(block, s, h).astype(o_ref.dtype)


def _attn_block_headmajor_no_bias(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, gamma_ref, beta_ref, o_ref,
    *, num_heads, eps,
):
    _attn_block_kernel_headmajor(
        x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, gamma_ref, beta_ref, None,
        o_ref, num_heads=num_heads, eps=eps,
    )


def attention_block_pallas(
    x: jax.Array,  # [B, S, H]
    wqkv: jax.Array,  # [H, 3H]
    bqkv: jax.Array,  # [3H]
    wo: jax.Array,  # [H, H]
    bo: jax.Array,  # [H]
    gamma: jax.Array,
    beta: jax.Array,
    num_heads: int,
    bias: jax.Array | None = None,  # [B, 1, 1 or S, S] additive
    eps: float = 1e-12,
    block_b: int | None = None,
    variant: str = "auto",  # "auto" | "loop" | "headmajor" (negative) | "headpack"
    interpret: bool = False,
) -> jax.Array:
    """The whole post-LN self-attention block in one VMEM-resident kernel.

    variant="auto" resolves to the head-packed scores/softmax/PV whenever
    more than one head fits the 128-lane tile -- measured on v5e at B=2048
    it beats the per-head loop at every model shape (S=32: 2.85 -> 2.33 ms,
    S=30: 4.30 -> 3.73, S=10: 1.77 -> 1.51) and ties at S=23 (2.24 -> 2.23).

    Default block_b measured on v5e (B=2048 sweeps): 32 up to S=24 (S=23:
    2.43 -> 2.24 ms; S=10: +8% vs 16), 16 above (block 24+ at S>=30
    overflows the scoped-vmem limit: the qkv slab is [block, S, 3H]
    f32-accumulated; 64 at S=10 ties the sweep but OOMs in-model; headpack
    at S=40 block 32 also overflows -- 16 is within noise of 32 at S<=32)."""
    b, s, h = x.shape
    if variant == "auto":
        variant = "headpack" if headpack_group(num_heads, s) > 1 else "loop"
    if block_b is None:
        block_b = 32 if s <= 24 else 16
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
        pl.BlockSpec(gamma.shape, const1, memory_space=pltpu.VMEM),
        pl.BlockSpec(beta.shape, const1, memory_space=pltpu.VMEM),
    ]
    args = [x, wqkv.astype(dtype), bqkv, wo.astype(dtype), bo, gamma, beta]
    if bias is not None:
        if bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1:
            # key-mask-only bias (the inference case): ship the compact
            # [B, S] rows and broadcast in-kernel instead of materialising
            # a [B, S, S] array in HBM on every layer of the scan
            args.append(bias.reshape(b, s))
            in_specs.append(
                pl.BlockSpec((block, s), lambda i: (i, 0), memory_space=pltpu.VMEM)
            )
        else:
            bias_full = jnp.broadcast_to(bias, (b, 1, s, s)).reshape(b, s, s)
            in_specs.append(pl.BlockSpec((block, s, s), xi, memory_space=pltpu.VMEM))
            args.append(bias_full)
        body = {
            "headmajor": _attn_block_kernel_headmajor,
            "headpack": _attn_block_kernel_headpack,
        }.get(variant, _attn_block_kernel)
        kernel = functools.partial(
            _bias_last_adapter, body=body, num_heads=num_heads, eps=eps
        )
    else:
        kernel = functools.partial(
            {
                "headmajor": _attn_block_headmajor_no_bias,
                "headpack": _attn_block_headpack_no_bias,
            }.get(variant, _attn_block_no_bias),
            num_heads=num_heads, eps=eps,
        )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block, s, h), xi, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, h), dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*args)


def _bias_last_adapter(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, gamma_ref, beta_ref, bias_ref,
    o_ref, *, body, num_heads, eps,
):
    """pallas passes the bias ref last among inputs; the kernel bodies take
    it before o_ref."""
    body(
        x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, gamma_ref, beta_ref,
        bias_ref, o_ref, num_heads=num_heads, eps=eps,
    )


# --------------------------------------------------------------------------
# fused cross-attention block (F != T): LXMERT x-layers
# --------------------------------------------------------------------------


def _cross_block_kernel(
    x_ref, ctx_ref, wq_ref, bq_ref, wkv_ref, bkv_ref, wo_ref, bo_ref,
    gamma_ref, beta_ref, bias_ref, o_ref, *, num_heads, eps,
):
    x = x_ref[:]  # [BLOCK, F, H]
    c = ctx_ref[:]  # [BLOCK, T, H]
    block, f, h = x.shape
    t = c.shape[1]
    dh = h // num_heads
    scale = 1.0 / (dh**0.5)
    q2d = (
        jax.lax.dot(x.reshape(block * f, h), wq_ref[:], preferred_element_type=jnp.float32)
        + bq_ref[:].astype(jnp.float32)
    ).astype(x.dtype)
    kv2d = (
        jax.lax.dot(c.reshape(block * t, h), wkv_ref[:], preferred_element_type=jnp.float32)
        + bkv_ref[:].astype(jnp.float32)
    ).astype(x.dtype)
    q = q2d.reshape(block, f, h)
    kv = kv2d.reshape(block, t, 2 * h)
    bias = bias_ref[:].astype(jnp.float32) if bias_ref is not None else None
    if bias is not None and bias.ndim == 2:
        # compact key-mask rows [BLOCK, T]; broadcast over query positions
        bias = bias[:, None, :]
    head_outs = []
    for n in range(num_heads):
        qh = q[..., n * dh : (n + 1) * dh]
        kh = kv[..., n * dh : (n + 1) * dh]
        vh = kv[..., h + n * dh : h + (n + 1) * dh]
        scores = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        head_outs.append(
            jax.lax.dot_general(
                probs, vh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        )
    ctx_out = jnp.concatenate(head_outs, axis=-1)
    o2d = (
        jax.lax.dot(
            ctx_out.reshape(block * f, h), wo_ref[:],
            preferred_element_type=jnp.float32,
        )
        + bo_ref[:].astype(jnp.float32)
    )
    y = o2d + x.reshape(block * f, h).astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps)
    y = y * gamma_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    o_ref[:] = y.reshape(block, f, h).astype(o_ref.dtype)


def _cross_block_no_bias(
    x_ref, ctx_ref, wq_ref, bq_ref, wkv_ref, bkv_ref, wo_ref, bo_ref,
    gamma_ref, beta_ref, o_ref, *, num_heads, eps,
):
    _cross_block_kernel(
        x_ref, ctx_ref, wq_ref, bq_ref, wkv_ref, bkv_ref, wo_ref, bo_ref,
        gamma_ref, beta_ref, None, o_ref, num_heads=num_heads, eps=eps,
    )


def _cross_block_kernel_headpack(
    x_ref, ctx_ref, wq_ref, bq_ref, wkv_ref, bkv_ref, wo_ref, bo_ref,
    gamma_ref, beta_ref, bias_ref, o_ref, *, num_heads, eps,
):
    """Cross-attention block with head-packed scores/softmax/PV (the
    [block, F, T<=23] score tiles otherwise idle >80%% of lanes)."""
    x = x_ref[:]  # [BLOCK, F, H]
    c = ctx_ref[:]  # [BLOCK, T, H]
    block, f, h = x.shape
    t = c.shape[1]
    dh = h // num_heads
    scale = 1.0 / (dh**0.5)
    q2d = (
        jax.lax.dot(x.reshape(block * f, h), wq_ref[:], preferred_element_type=jnp.float32)
        + bq_ref[:].astype(jnp.float32)
    ).astype(x.dtype)
    kv2d = (
        jax.lax.dot(c.reshape(block * t, h), wkv_ref[:], preferred_element_type=jnp.float32)
        + bkv_ref[:].astype(jnp.float32)
    ).astype(x.dtype)
    q = q2d.reshape(block, f, h)
    kv = kv2d.reshape(block, t, 2 * h)
    bias = None
    if bias_ref is not None:
        b = bias_ref[:].astype(jnp.float32)
        bias = b[:, None, :] if b.ndim == 2 else b
    ctx_out = packed_heads_attention(
        q, kv[..., :h], kv[..., h:], bias, num_heads, scale, x.dtype
    )
    o2d = (
        jax.lax.dot(
            ctx_out.reshape(block * f, h), wo_ref[:],
            preferred_element_type=jnp.float32,
        )
        + bo_ref[:].astype(jnp.float32)
    )
    y = o2d + x.reshape(block * f, h).astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps)
    y = y * gamma_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    o_ref[:] = y.reshape(block, f, h).astype(o_ref.dtype)


def _cross_block_headpack_no_bias(
    x_ref, ctx_ref, wq_ref, bq_ref, wkv_ref, bkv_ref, wo_ref, bo_ref,
    gamma_ref, beta_ref, o_ref, *, num_heads, eps,
):
    _cross_block_kernel_headpack(
        x_ref, ctx_ref, wq_ref, bq_ref, wkv_ref, bkv_ref, wo_ref, bo_ref,
        gamma_ref, beta_ref, None, o_ref, num_heads=num_heads, eps=eps,
    )


def cross_attention_block_pallas(
    x: jax.Array,  # [B, F, H]
    ctx: jax.Array,  # [B, T, H]
    wq: jax.Array,  # [H, H]
    bq: jax.Array,
    wkv: jax.Array,  # [H, 2H] (key ++ value kernels)
    bkv: jax.Array,
    wo: jax.Array,
    bo: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    num_heads: int,
    bias: jax.Array | None = None,  # [B, 1, 1 or F, T] additive (ctx mask)
    eps: float = 1e-12,
    block_b: int | None = None,
    variant: str = "auto",  # "auto" | "loop" (per-head) | "headpack"
    interpret: bool = False,
) -> jax.Array:
    """Whole cross-attention block (post-LN) in one kernel; F may differ
    from T (LXMERT lang<->visn cross attention).

    variant="auto" packs heads along lanes when more than one fits
    (23<-10 on v5e: 2.17 -> 2.09 ms at B=2048).

    Default block_b = 32: measured best on v5e for both 23->10 and 10->23
    (2.44 -> 2.17 ms and 2.01 -> 1.73 ms at B=2048; 64 overflows VMEM)."""
    b, f, h = x.shape
    t = ctx.shape[1]
    if variant == "auto":
        variant = "headpack" if headpack_group(num_heads, t) > 1 else "loop"
    if block_b is None:
        block_b = 32
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
        pl.BlockSpec((block, f, h), xi, memory_space=pltpu.VMEM),
        pl.BlockSpec((block, t, h), xi, memory_space=pltpu.VMEM),
        pl.BlockSpec(wq.shape, const2, memory_space=pltpu.VMEM),
        pl.BlockSpec(bq.shape, const1, memory_space=pltpu.VMEM),
        pl.BlockSpec(wkv.shape, const2, memory_space=pltpu.VMEM),
        pl.BlockSpec(bkv.shape, const1, memory_space=pltpu.VMEM),
        pl.BlockSpec(wo.shape, const2, memory_space=pltpu.VMEM),
        pl.BlockSpec(bo.shape, const1, memory_space=pltpu.VMEM),
        pl.BlockSpec(gamma.shape, const1, memory_space=pltpu.VMEM),
        pl.BlockSpec(beta.shape, const1, memory_space=pltpu.VMEM),
    ]
    args = [x, ctx, wq.astype(dtype), bq, wkv.astype(dtype), bkv,
            wo.astype(dtype), bo, gamma, beta]
    if bias is not None:
        if bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1:
            # compact ctx key-mask (see attention_block_pallas)
            args.append(bias.reshape(b, t))
            in_specs.append(
                pl.BlockSpec((block, t), lambda i: (i, 0), memory_space=pltpu.VMEM)
            )
        else:
            bias_full = jnp.broadcast_to(bias, (b, 1, f, t)).reshape(b, f, t)
            in_specs.append(pl.BlockSpec((block, f, t), xi, memory_space=pltpu.VMEM))
            args.append(bias_full)
        kernel = functools.partial(
            _cross_block_kernel_headpack if variant == "headpack"
            else _cross_block_kernel,
            num_heads=num_heads, eps=eps,
        )
    else:
        kernel = functools.partial(
            _cross_block_headpack_no_bias if variant == "headpack"
            else _cross_block_no_bias,
            num_heads=num_heads, eps=eps,
        )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block, f, h), xi, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, f, h), dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*args)


# --------------------------------------------------------------------------
# dual-direction cross-attention block: both directions of an LXMERT x-layer
# (lang<-visn and visn<-lang share the SAME weights, modeling.py:460-464)
# in ONE kernel launch
# --------------------------------------------------------------------------


def _dual_cross_kernel(
    l_ref, v_ref, wq_ref, bq_ref, wkv_ref, bkv_ref, wo_ref, bo_ref,
    gamma_ref, beta_ref, lbias_ref, vbias_ref, ol_ref, ov_ref,
    *, num_heads, eps, headpack,
):
    """Both cross directions in one pass, one launch: the shared weights are
    fetched from HBM once for both directions and each stream is read once
    (each separate direction kernel reads BOTH streams, so the pair reads
    them twice). Projections run per stream: row-slicing a concatenated
    [block*(F+T), H] projection would hand pack_kv operands at sublane
    offset F%%8, which Mosaic's lane-concat cannot relayout ("result/input
    offset mismatch on non-concat dimension"); per-stream matmuls pad the
    same rows (F,T -> multiples of 8) and keep every operand at offset 0."""
    l = l_ref[:]  # [BLOCK, F, H] lang stream
    v = v_ref[:]  # [BLOCK, T, H] visn stream
    block, f, h = l.shape
    t = v.shape[1]
    dh = h // num_heads
    scale = 1.0 / (dh**0.5)
    l2d = l.reshape(block * f, h)
    v2d = v.reshape(block * t, h)

    def project(x2d, rows):
        q = (
            jax.lax.dot(x2d, wq_ref[:], preferred_element_type=jnp.float32)
            + bq_ref[:].astype(jnp.float32)
        ).astype(l.dtype).reshape(block, rows, h)
        kv = (
            jax.lax.dot(x2d, wkv_ref[:], preferred_element_type=jnp.float32)
            + bkv_ref[:].astype(jnp.float32)
        ).astype(l.dtype).reshape(block, rows, 2 * h)
        return q, kv[..., :h], kv[..., h:]

    ql, kl, vl = project(l2d, f)
    qv, kn, vn = project(v2d, t)
    lbias = vbias = None
    if lbias_ref is not None:
        # compact key-mask rows: lang-positions mask gates visn->lang keys
        lbias = lbias_ref[:].astype(jnp.float32)[:, None, :]  # [BLOCK, 1, F]
    if vbias_ref is not None:
        vbias = vbias_ref[:].astype(jnp.float32)[:, None, :]  # [BLOCK, 1, T]
    if headpack:
        ctx_l = packed_heads_attention(ql, kn, vn, vbias, num_heads, scale, l.dtype)
        ctx_v = packed_heads_attention(qv, kl, vl, lbias, num_heads, scale, l.dtype)
    else:
        def direction(qs, ks, vs, bias):
            outs = []
            for n in range(num_heads):
                qh = qs[..., n * dh : (n + 1) * dh]
                kh = ks[..., n * dh : (n + 1) * dh]
                vh = vs[..., n * dh : (n + 1) * dh]
                scores = jax.lax.dot_general(
                    qh, kh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * scale
                if bias is not None:
                    scores = scores + bias
                probs = jax.nn.softmax(scores, axis=-1).astype(l.dtype)
                outs.append(
                    jax.lax.dot_general(
                        probs, vh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    ).astype(l.dtype)
                )
            return jnp.concatenate(outs, axis=-1)

        ctx_l = direction(ql, kn, vn, vbias)
        ctx_v = direction(qv, kl, vl, lbias)

    def out_ln(ctx, x2d, rows, o_ref):
        o2d = (
            jax.lax.dot(
                ctx.reshape(block * rows, h), wo_ref[:],
                preferred_element_type=jnp.float32,
            )
            + bo_ref[:].astype(jnp.float32)
        )
        y = o2d + x2d.astype(jnp.float32)
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
        y = (y - mean) * jax.lax.rsqrt(var + eps)
        y = y * gamma_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
        o_ref[:] = y.reshape(block, rows, h).astype(o_ref.dtype)

    out_ln(ctx_l, l2d, f, ol_ref)
    out_ln(ctx_v, v2d, t, ov_ref)


def _dual_cross_no_bias(
    l_ref, v_ref, wq_ref, bq_ref, wkv_ref, bkv_ref, wo_ref, bo_ref,
    gamma_ref, beta_ref, ol_ref, ov_ref, *, num_heads, eps, headpack,
):
    _dual_cross_kernel(
        l_ref, v_ref, wq_ref, bq_ref, wkv_ref, bkv_ref, wo_ref, bo_ref,
        gamma_ref, beta_ref, None, None, ol_ref, ov_ref,
        num_heads=num_heads, eps=eps, headpack=headpack,
    )


def dual_cross_attention_block_pallas(
    l: jax.Array,  # [B, F, H] lang stream
    v: jax.Array,  # [B, T, H] visn stream
    wq: jax.Array,  # [H, H] shared query kernel
    bq: jax.Array,
    wkv: jax.Array,  # [H, 2H] shared (key ++ value) kernels
    bkv: jax.Array,
    wo: jax.Array,
    bo: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    num_heads: int,
    lang_bias: jax.Array | None = None,  # compact lang key-mask rows [B, F]
    visn_bias: jax.Array | None = None,  # compact visn key-mask rows [B, T]
    eps: float = 1e-12,
    block_b: int | None = None,
    variant: str = "auto",  # "auto" | "loop" | "headpack"
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Both shared-weight cross directions of an LXMERT x-layer
    (``lxmert/src/lxrt/modeling.py:460-464``) fused into one kernel launch:
    returns (lang_out, visn_out). Biases must be None or compact key-mask
    rows; each direction is masked by the OTHER stream's key positions.
    Requires both biases present or both absent (the x-layer always has
    both)."""
    b, f, h = l.shape
    t = v.shape[1]
    if (lang_bias is None) != (visn_bias is None):
        raise ValueError("dual cross kernel needs both biases or neither")
    if variant == "auto":
        variant = (
            "headpack"
            if max(headpack_group(num_heads, t), headpack_group(num_heads, f)) > 1
            else "loop"
        )
    if block_b is None:
        block_b = 32
    block = min(block_b, b)
    grid = (pl.cdiv(b, block),)
    dtype = l.dtype

    def xi(i):
        return (i, 0, 0)

    def const2(i):
        return (0, 0)

    def const1(i):
        return (0,)

    in_specs = [
        pl.BlockSpec((block, f, h), xi, memory_space=pltpu.VMEM),
        pl.BlockSpec((block, t, h), xi, memory_space=pltpu.VMEM),
        pl.BlockSpec(wq.shape, const2, memory_space=pltpu.VMEM),
        pl.BlockSpec(bq.shape, const1, memory_space=pltpu.VMEM),
        pl.BlockSpec(wkv.shape, const2, memory_space=pltpu.VMEM),
        pl.BlockSpec(bkv.shape, const1, memory_space=pltpu.VMEM),
        pl.BlockSpec(wo.shape, const2, memory_space=pltpu.VMEM),
        pl.BlockSpec(bo.shape, const1, memory_space=pltpu.VMEM),
        pl.BlockSpec(gamma.shape, const1, memory_space=pltpu.VMEM),
        pl.BlockSpec(beta.shape, const1, memory_space=pltpu.VMEM),
    ]
    args = [l, v, wq.astype(dtype), bq, wkv.astype(dtype), bkv,
            wo.astype(dtype), bo, gamma, beta]
    if lang_bias is not None:
        args += [lang_bias, visn_bias]
        in_specs += [
            pl.BlockSpec((block, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        kernel = functools.partial(
            _dual_cross_kernel, num_heads=num_heads, eps=eps,
            headpack=(variant == "headpack"),
        )
    else:
        kernel = functools.partial(
            _dual_cross_no_bias, num_heads=num_heads, eps=eps,
            headpack=(variant == "headpack"),
        )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((block, f, h), xi, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, t, h), xi, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, f, h), dtype),
            jax.ShapeDtypeStruct((b, t, h), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


@functools.lru_cache(maxsize=16)
def _backend_choice(shape_key) -> str:
    """Benchmark both backends once per shape on the current default device."""
    import time

    from .attention import mha_xla

    b, n, s, dh, has_bias, dtype_name = shape_key
    dtype = jnp.dtype(dtype_name)
    rng = jax.random.key(0)
    ks = jax.random.split(rng, 4)
    q = jax.random.normal(ks[0], (b, n, s, dh), dtype)
    k = jax.random.normal(ks[1], (b, n, s, dh), dtype)
    v = jax.random.normal(ks[2], (b, n, s, dh), dtype)
    bias = (
        jax.random.normal(ks[3], (b, 1, 1, s), jnp.float32) if has_bias else None
    )

    def time_fn(fn):
        f = jax.jit(fn)
        f(q, k, v, bias).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(q, k, v, bias)
        out.block_until_ready()
        return time.perf_counter() - t0

    try:
        t_pallas = time_fn(lambda q, k, v, b_: mha_pallas(q, k, v, b_))
    except Exception:
        return "xla"
    t_xla = time_fn(lambda q, k, v, b_: mha_xla(q, k, v, b_))
    return "pallas" if t_pallas < t_xla else "xla"


def best_mha(q, k, v, bias=None):
    """Auto-selected attention backend (cached per shape/dtype)."""
    from .attention import mha_xla

    key = (*q.shape, bias is not None, str(q.dtype))
    if _backend_choice(key) == "pallas":
        return mha_pallas(q, k, v, bias)
    return mha_xla(q, k, v, bias)
