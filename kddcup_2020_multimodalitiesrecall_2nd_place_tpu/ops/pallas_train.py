"""Custom-VJP fused training blocks: Pallas forward AND backward kernels.

Training previously bypassed the fused inference kernels
(ops/pallas_attention.py, ops/pallas_ffn.py) because they had no VJP and
dropout needed per-mask rng tensors. That left the training step on the
unfused XLA path at ~11-15%% MFU (docs/BENCH.md round 2). These kernels
close the gap the TPU-native way:

* **forward**: the same fully fused block computation as the inference
  kernels plus in-kernel dropout driven by the TPU hardware PRNG
  (``pltpu.prng_seed`` / ``prng_random_bits``), seeded per (step seed,
  grid block). No [B,S,S]/[B,S,H] threefry mask tensors ever touch HBM.
* **backward**: a hand-written Pallas kernel per block recomputes the
  in-VMEM intermediates from the block input (cheaper than saving [B,S,I]
  GELU activations to HBM -- this subsumes the per-layer ``jax.checkpoint``
  the XLA path needs) and emits dx plus the per-row gradients; the big
  [rows,H]x[rows,I] *weight*-gradient matmuls are left to XLA, where the
  MXU runs a 2-D reduction over B*S rows near peak.
* **determinism**: the backward reseeds the identical PRNG stream (same
  seed, same program_id, same draw order and shapes), so dropout masks
  match the forward bit-exactly -- the property jax.random gets from
  functional keys is recovered by construction.

The interpreter (CPU test) path cannot use the hardware PRNG (no interpret
rule), so masks there come from a counter-based hash (`_hash_bits`) that is
plain jnp -- the same formula is exported for pure-jnp reference
implementations, letting tests check the custom VJP against ``jax.grad``
of an identical-masks reference.

Gradient dtypes follow the f32-params / bf16-compute training policy: dx is
emitted in the residual stream's dtype, weight/bias/LN grads in float32.

Reference recipes these kernels train: ``run_pretraining_predict_score.py``
(ImageBERT-A towers), ``train_normal.py:59-98`` (ImageBERT-B). Dropout
placement matches BERT exactly: attention probabilities, post-projection
hidden states, post-FFN hidden states (``pixelmodel.py:807-833,935-960``).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_ffn import _erf_as

_INV_SQRT_2PI = 0.3989422804014327
_GELU_C = 0.7978845608028654  # sqrt(2/pi)
_GELU_A = 0.044715


def gelu_fwd(u, approximate: bool):
    if approximate:
        t = jnp.tanh(_GELU_C * (u + _GELU_A * u * u * u))
        return 0.5 * u * (1.0 + t)
    return 0.5 * u * (1.0 + _erf_as(u * (2.0**-0.5)))


def gelu_bwd(u, approximate: bool):
    """d gelu / du, float32."""
    if approximate:
        t = jnp.tanh(_GELU_C * (u + _GELU_A * u * u * u))
        return 0.5 * (1.0 + t) + 0.5 * u * (1.0 - t * t) * _GELU_C * (
            1.0 + 3.0 * _GELU_A * u * u
        )
    phi = jnp.exp(-0.5 * u * u) * _INV_SQRT_2PI
    return 0.5 * (1.0 + _erf_as(u * (2.0**-0.5))) + u * phi


def _hash_bits(seed, draw: int, shape) -> jax.Array:
    """Counter-based uint32 hash (murmur3 fmix over a per-element index).

    Used (a) on the interpret path, where the hardware PRNG has no rule,
    and (b) by pure-jnp reference implementations in tests so ``jax.grad``
    of the reference sees the *same* masks as the Pallas kernels.
    ``seed`` is a traced int32/uint32 scalar; ``draw`` distinguishes
    successive draws within one kernel invocation.
    """
    idx = jnp.zeros(shape, jnp.uint32)
    mults = (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F)
    for d in range(len(shape)):
        iota = jax.lax.broadcasted_iota(jnp.uint32, shape, d)
        idx = idx + iota * jnp.uint32(mults[d % len(mults)])
    x = idx ^ seed.astype(jnp.uint32) ^ jnp.uint32((draw * 0x632BE59B) & 0xFFFFFFFF)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def dropout_cutoff(rate: float) -> int:
    """uint32 threshold: drop iff bits < cutoff (P = rate)."""
    return min(int(rate * 4294967296.0), 4294967295)


def _keep_mask(seed, draw: int, shape, cutoff: int, interpret: bool):
    """Boolean keep-mask for one dropout draw.

    Hardware path: sequential draws from the per-core PRNG (the caller
    must have seeded it; draw order/shapes must match between fwd and bwd).
    Interpret path: order-independent counter hash.
    """
    if interpret:
        bits = _hash_bits(seed, draw, shape)
    else:
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits >= jnp.uint32(cutoff)


def _seed_prng(seed_ref, interpret: bool):
    if not interpret:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    # interpret path folds the block id into the per-draw hash seed instead
    return seed_ref[0] + pl.program_id(0) * jnp.int32(1000003)


def _layer_norm_fwd(z, gamma, beta, eps):
    mean = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(z - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    zn = (z - mean) * inv
    return zn * gamma + beta, zn, inv


def _write_partial(ref, row):
    """Write a per-grid-block [H] reduction into a (1, 8, H) output block.

    TPU block shapes need the sublane dim divisible by 8, so the row is
    replicated across 8 sublanes; the XLA side reads ``p[:, 0, :]``.
    """
    ref[:] = jnp.broadcast_to(row[None, None, :], ref.shape).astype(ref.dtype)


def _partial_spec(h):
    return pl.BlockSpec((1, 8, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _layer_norm_bwd(dy, zn, inv, gamma):
    """Row-wise LN backward -> (dz, per-row dgamma summand, dbeta summand)."""
    g = dy * gamma
    dz = (
        g
        - jnp.mean(g, axis=-1, keepdims=True)
        - zn * jnp.mean(g * zn, axis=-1, keepdims=True)
    ) * inv
    return dz


# ==========================================================================
# FFN block: y = LN(x + dropout(W2 gelu(W1 x + b1) + b2))
# ==========================================================================


@dataclass(frozen=True)
class FfnTrainSpec:
    dropout_rate: float
    approximate_gelu: bool
    eps: float
    block_b: int
    interpret: bool

    @property
    def cutoff(self) -> int:
        return dropout_cutoff(self.dropout_rate)


def _ffn_fwd_kernel(
    seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, gamma_ref, beta_ref,
    y_ref, *, spec: FfnTrainSpec,
):
    seed = _seed_prng(seed_ref, spec.interpret)
    x = x_ref[:]
    block, s, h = x.shape
    x2d = x.reshape(block * s, h)
    u = jax.lax.dot(
        x2d, w1_ref[:], preferred_element_type=jnp.float32
    ) + b1_ref[:].astype(jnp.float32)
    g = gelu_fwd(u, spec.approximate_gelu).astype(x.dtype)
    hid = jax.lax.dot(
        g, w2_ref[:], preferred_element_type=jnp.float32
    ) + b2_ref[:].astype(jnp.float32)
    if spec.dropout_rate > 0.0:
        keep = _keep_mask(seed, 0, hid.shape, spec.cutoff, spec.interpret)
        hid = jnp.where(keep, hid * (1.0 / (1.0 - spec.dropout_rate)), 0.0)
    z = hid + x2d.astype(jnp.float32)
    y, _, _ = _layer_norm_fwd(
        z, gamma_ref[:].astype(jnp.float32), beta_ref[:].astype(jnp.float32),
        spec.eps,
    )
    y_ref[:] = y.reshape(block, s, h).astype(y_ref.dtype)


def _ffn_bwd_kernel(
    seed_ref, x_ref, dy_ref, w1_ref, b1_ref, w2_ref, b2_ref, gamma_ref,
    dx_ref, du_ref, gsave_ref, dh_ref, dgamma_ref, dbeta_ref,
    *, spec: FfnTrainSpec,
):
    seed = _seed_prng(seed_ref, spec.interpret)
    x = x_ref[:]
    block, s, h = x.shape
    x2d = x.reshape(block * s, h)
    # ---- recompute forward (identical draw order to _ffn_fwd_kernel) ----
    u = jax.lax.dot(
        x2d, w1_ref[:], preferred_element_type=jnp.float32
    ) + b1_ref[:].astype(jnp.float32)
    g = gelu_fwd(u, spec.approximate_gelu)
    g16 = g.astype(x.dtype)
    hid = jax.lax.dot(
        g16, w2_ref[:], preferred_element_type=jnp.float32
    ) + b2_ref[:].astype(jnp.float32)
    if spec.dropout_rate > 0.0:
        keep = _keep_mask(seed, 0, hid.shape, spec.cutoff, spec.interpret)
        inv_keep = 1.0 / (1.0 - spec.dropout_rate)
        hid = jnp.where(keep, hid * inv_keep, 0.0)
    z = hid + x2d.astype(jnp.float32)
    gamma = gamma_ref[:].astype(jnp.float32)
    mean = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(z - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + spec.eps)
    zn = (z - mean) * inv
    # ---- backward ----
    dy = dy_ref[:].reshape(block * s, h).astype(jnp.float32)
    _write_partial(dgamma_ref, jnp.sum(dy * zn, axis=0))
    _write_partial(dbeta_ref, jnp.sum(dy, axis=0))
    dz = _layer_norm_bwd(dy, zn, inv, gamma)
    if spec.dropout_rate > 0.0:
        dh = jnp.where(keep, dz * inv_keep, 0.0)
    else:
        dh = dz
    dh16 = dh.astype(x.dtype)
    dh_ref[:] = dh16.reshape(block, s, h)
    gsave_ref[:] = g16.reshape(block, s, -1)
    # dg = dh @ W2^T (NT matmul: contract both last dims)
    dg = jax.lax.dot_general(
        dh16, w2_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    du = dg * gelu_bwd(u, spec.approximate_gelu)
    du16 = du.astype(x.dtype)
    du_ref[:] = du16.reshape(block, s, -1)
    dx = dz + jax.lax.dot_general(
        du16, w1_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[:] = dx.reshape(block, s, h).astype(dx_ref.dtype)


def _const_spec(a):
    nd = a.ndim
    return pl.BlockSpec(
        a.shape, functools.partial(lambda n, i: (0,) * n, nd),
        memory_space=pltpu.VMEM,
    )


def _block_spec(block, trailing):
    return pl.BlockSpec(
        (block, *trailing), lambda i: (i,) + (0,) * len(trailing),
        memory_space=pltpu.VMEM,
    )


def _grid_check(b: int, block: int, what: str) -> int:
    if b % block != 0:
        raise ValueError(
            f"{what}: batch {b} must be divisible by block_b {block} "
            "(dropout streams are per grid block)"
        )
    return b // block


def _pick_block(b: int, block_b: int) -> int:
    """Largest block <= block_b that divides b. Dropout masks are drawn per
    grid block (seeded by program_id), so the forward and backward kernels
    must derive the IDENTICAL block size; both call this with the same
    (b, spec.block_b). Odd batch sizes degrade to smaller blocks (worst
    case 1 for prime b) instead of failing the old divisibility check."""
    block = min(block_b, b)
    while b % block:
        block -= 1
    return block


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ffn_train(spec: FfnTrainSpec, x, w1, b1, w2, b2, gamma, beta, seed):
    y, _ = _ffn_train_fwd(spec, x, w1, b1, w2, b2, gamma, beta, seed)
    return y


def _ffn_train_fwd(spec: FfnTrainSpec, x, w1, b1, w2, b2, gamma, beta, seed):
    b, s, h = x.shape
    block = _pick_block(b, spec.block_b)
    n_blocks = _grid_check(b, block, "ffn_block_train")
    dt = x.dtype
    w1c, w2c = w1.astype(dt), w2.astype(dt)
    y = pl.pallas_call(
        functools.partial(_ffn_fwd_kernel, spec=spec),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _block_spec(block, (s, h)),
            _const_spec(w1c), _const_spec(b1), _const_spec(w2c),
            _const_spec(b2), _const_spec(gamma), _const_spec(beta),
        ],
        out_specs=_block_spec(block, (s, h)),
        out_shape=jax.ShapeDtypeStruct((b, s, h), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=spec.interpret,
    )(seed, x, w1c, b1, w2c, b2, gamma, beta)
    return y, (x, w1, b1, w2, b2, gamma, seed)


def _ffn_train_bwd(spec: FfnTrainSpec, res, dy):
    x, w1, b1, w2, b2, gamma, seed = res
    b, s, h = x.shape
    i_dim = w1.shape[1]
    block = _pick_block(b, spec.block_b)
    n_blocks = b // block
    dt = x.dtype
    w1c, w2c = w1.astype(dt), w2.astype(dt)
    dx, du, g, dh, dgamma_p, dbeta_p = pl.pallas_call(
        functools.partial(_ffn_bwd_kernel, spec=spec),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _block_spec(block, (s, h)),
            _block_spec(block, (s, h)),
            _const_spec(w1c), _const_spec(b1), _const_spec(w2c),
            _const_spec(b2), _const_spec(gamma),
        ],
        out_specs=[
            _block_spec(block, (s, h)),
            _block_spec(block, (s, i_dim)),
            _block_spec(block, (s, i_dim)),
            _block_spec(block, (s, h)),
            _partial_spec(h),
            _partial_spec(h),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, h), dt),
            jax.ShapeDtypeStruct((b, s, i_dim), dt),
            jax.ShapeDtypeStruct((b, s, i_dim), dt),
            jax.ShapeDtypeStruct((b, s, h), dt),
            jax.ShapeDtypeStruct((n_blocks, 8, h), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 8, h), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=spec.interpret,
    )(seed, x, dy.astype(dt), w1c, b1, w2c, b2, gamma)
    # weight gradients: one big MXU-friendly reduction over B*S rows each
    rows = lambda t: t.reshape(-1, t.shape[-1])  # noqa: E731
    dw1 = jax.lax.dot_general(
        rows(x), rows(du), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1 = jnp.sum(rows(du).astype(jnp.float32), axis=0)
    dw2 = jax.lax.dot_general(
        rows(g), rows(dh), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2 = jnp.sum(rows(dh).astype(jnp.float32), axis=0)
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return (dx, dw1, db1, dw2, db2,
            dgamma_p[:, 0, :].sum(0), dbeta_p[:, 0, :].sum(0), dseed)


_ffn_train.defvjp(_ffn_train_fwd, _ffn_train_bwd)


def _env_block(default: int, kind: str | None = None) -> int:
    """Resolve a train kernel's batch-block size: an explicit ``block_b``
    wins, else the per-op-kind env (``KMR_TRAIN_BLOCK_FFN`` /
    ``KMR_TRAIN_BLOCK_ATTN``), else ``KMR_TRAIN_BLOCK`` (model-scale sweeps
    via ``perf_lab.py train``), else the per-op default. Per-kind knobs
    exist because the optimum differs: FFN blocks carry [block*S, 3072]
    activations (VMEM-bound, small blocks), attention blocks carry
    [block*S_q, S_k] score tiles (MXU-fill-bound, big blocks win on short
    streams). Dropout masks are drawn per grid block, so different block
    sizes give different (equally valid) masks; fwd/bwd stay aligned
    because both resolve from the same inputs."""
    v = _sweep_env_block(kind)
    return default if v is None else v


def _sweep_env_block(kind: str | None) -> int | None:
    """The ONE copy of the sweep-env lookup (``KMR_TRAIN_BLOCK_{KIND}``
    first, then ``KMR_TRAIN_BLOCK``), shared by ``_env_block`` and
    ``resolve_train_block`` so precedence and validation cannot drift.
    Returns None when neither env is set."""
    import os

    names = [f"KMR_TRAIN_BLOCK_{kind.upper()}"] if kind is not None else []
    names.append("KMR_TRAIN_BLOCK")
    for src in names:
        v = os.environ.get(src)
        if v:
            iv = int(v)
            if iv <= 0:
                raise ValueError(f"{src} must be a positive int, got {v!r}")
            return iv
    return None


def resolve_train_block(kind: str, cfg) -> int | None:
    """Model-call-site block resolution: the sweep envs win
    (``KMR_TRAIN_BLOCK_{KIND}`` then ``KMR_TRAIN_BLOCK`` -- a sweep must
    override per-model defaults or ``perf_lab.py train`` measures nothing),
    else the model config's ``train_block_{kind}`` field, else None so the
    kernel falls through to its per-op default in ``_env_block``."""
    v = _sweep_env_block(kind)
    if v is not None:
        return v
    return getattr(cfg, f"train_block_{kind}", None)


def ffn_block_train(
    x: jax.Array,  # [B, S, H]
    w1: jax.Array,  # [H, I] float32
    b1: jax.Array,
    w2: jax.Array,  # [I, H] float32
    b2: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    seed: jax.Array,  # [1] int32 -- per (step, layer) dropout stream
    dropout_rate: float = 0.0,
    approximate_gelu: bool = True,
    eps: float = 1e-12,
    block_b: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable fused FFN block with in-kernel dropout."""
    if block_b is None:
        block_b = _env_block(4, kind="ffn")
    spec = FfnTrainSpec(
        dropout_rate=float(dropout_rate), approximate_gelu=approximate_gelu,
        eps=eps, block_b=block_b, interpret=interpret,
    )
    return _ffn_train(spec, x, w1, b1, w2, b2, gamma, beta, seed)


# ==========================================================================
# self-attention block:
#   y = LN(x + dropout(Wo . concat_heads(dropout(softmax(QK^T/s + bias)) V)))
# ==========================================================================


@dataclass(frozen=True)
class AttnTrainSpec:
    num_heads: int
    attn_dropout_rate: float
    hidden_dropout_rate: float
    eps: float
    block_b: int
    interpret: bool
    has_bias: bool
    headpack: bool | str = False  # False | True | "mixed"

    @property
    def attn_cutoff(self) -> int:
        return dropout_cutoff(self.attn_dropout_rate)

    @property
    def hidden_cutoff(self) -> int:
        return dropout_cutoff(self.hidden_dropout_rate)


def _group_mask(spec, seed, g0: int, g: int, shape_ss):
    """Lane-concatenated per-head keep-masks for one packed group.

    Draw order/shapes are IDENTICAL to the per-head variant (draw 1+head of
    [block, S, S]), so the hardware stream and the interpret hash both
    produce the same masks regardless of packing -- the pure-jnp reference
    in the tests covers both variants unchanged. The uint32 bits are
    concatenated BEFORE the cutoff compare: Mosaic rejects concatenation of
    i1 vectors ("invalid vector register cast")."""

    def draw_bits(j):
        if spec.interpret:
            return _hash_bits(seed, 1 + g0 + j, shape_ss)
        return pltpu.bitcast(pltpu.prng_random_bits(shape_ss), jnp.uint32)

    bits = [draw_bits(j) for j in range(g)]
    packed = bits[0] if g == 1 else jnp.concatenate(bits, axis=-1)
    return packed >= jnp.uint32(spec.attn_cutoff)


def _attn_recompute_packed(spec, seed, qkv, bias, out_dtype):
    """Head-packed recompute shared by fwd/bwd: per packed group, the
    undropped packed probs [block, S, G*S] (float32), the packed keep mask
    (or None) and the context slab [block, S, G*Dh].

    Packing rationale + helpers: ops/pallas_attention.py (the [S, S] score
    tiles keep <=S of 128 lanes busy in the per-head variant)."""
    from .pallas_attention import (
        headpack_group,
        pack_kv,
        packed_softmax,
        tile_bias,
    )

    block, s, h3 = qkv.shape
    h = h3 // 3
    n, dh = spec.num_heads, h // spec.num_heads
    g = headpack_group(n, s)
    scale = 1.0 / (dh**0.5)
    inv_attn = 1.0 / (1.0 - spec.attn_dropout_rate)
    k_all = qkv[..., h : 2 * h]
    v_all = qkv[..., 2 * h :]
    groups = []
    for g0 in range(0, n, g):
        kpack, vpack = pack_kv(k_all, v_all, g0, g, dh, out_dtype)
        q = qkv[..., g0 * dh : (g0 + g) * dh]
        scores = jax.lax.dot_general(
            q, kpack, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        if bias is not None:
            scores = scores + tile_bias(bias, g)
        probs = packed_softmax(scores, g, s)
        mask = None
        if spec.attn_dropout_rate > 0.0:
            mask = _group_mask(spec, seed, g0, g, (block, s, s))
            probsd = jnp.where(mask, probs * inv_attn, 0.0)
        else:
            probsd = probs
        ctx_part = jax.lax.dot_general(
            probsd.astype(out_dtype), vpack,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(out_dtype)
        groups.append((g0, g, probs, mask, ctx_part))
    return groups, (n, dh, g, scale, inv_attn)


def _attn_recompute_heads(spec, seed, qkv, bias):
    """Shared fwd/bwd head loop: per-head (undropped probs f32, keep mask).

    Draw order: head 0..N-1 attention masks; the hidden mask is drawn by the
    caller AFTER this loop (both kernels must call in the same sequence).
    """
    block, s, h3 = qkv.shape
    h = h3 // 3
    n, dh = spec.num_heads, h // spec.num_heads
    scale = 1.0 / (dh**0.5)
    probs_list, keep_list = [], []
    for i in range(n):
        q = qkv[..., i * dh : (i + 1) * dh]
        k = qkv[..., h + i * dh : h + (i + 1) * dh]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores, axis=-1)
        keep = None
        if spec.attn_dropout_rate > 0.0:
            keep = _keep_mask(
                seed, 1 + i, probs.shape, spec.attn_cutoff, spec.interpret
            )
        probs_list.append(probs)
        keep_list.append(keep)
    return probs_list, keep_list


def _attn_fwd_kernel(
    seed_ref, x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, gamma_ref, beta_ref,
    *rest, spec: AttnTrainSpec,
):
    if spec.has_bias:
        bias_ref, y_ref = rest
    else:
        (y_ref,) = rest
        bias_ref = None
    seed = _seed_prng(seed_ref, spec.interpret)
    x = x_ref[:]
    block, s, h = x.shape
    n, dh = spec.num_heads, h // spec.num_heads
    x2d = x.reshape(block * s, h)
    qkv = (
        jax.lax.dot(x2d, wqkv_ref[:], preferred_element_type=jnp.float32)
        + bqkv_ref[:].astype(jnp.float32)
    ).astype(x.dtype).reshape(block, s, 3 * h)
    bias = None
    if bias_ref is not None:
        # compact key-mask rows [BLOCK, S] broadcast over query positions
        bias = bias_ref[:].astype(jnp.float32)[:, None, :]
    if spec.headpack:
        groups, _ = _attn_recompute_packed(spec, seed, qkv, bias, x.dtype)
        parts = [ctx_part for _, _, _, _, ctx_part in groups]
        ctx = (parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1))
        ctx = ctx.reshape(block * s, h)
    else:
        probs_list, keep_list = _attn_recompute_heads(spec, seed, qkv, bias)
        inv_attn = 1.0 / (1.0 - spec.attn_dropout_rate)
        head_outs = []
        for i in range(n):
            probs = probs_list[i]
            if keep_list[i] is not None:
                probs = jnp.where(keep_list[i], probs * inv_attn, 0.0)
            v = qkv[..., 2 * h + i * dh : 2 * h + (i + 1) * dh]
            head_outs.append(
                jax.lax.dot_general(
                    probs.astype(x.dtype), v,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
            )
        ctx = jnp.concatenate(head_outs, axis=-1).reshape(block * s, h)
    o = jax.lax.dot(
        ctx, wo_ref[:], preferred_element_type=jnp.float32
    ) + bo_ref[:].astype(jnp.float32)
    if spec.hidden_dropout_rate > 0.0:
        keep_h = _keep_mask(seed, 0, o.shape, spec.hidden_cutoff, spec.interpret)
        o = jnp.where(keep_h, o * (1.0 / (1.0 - spec.hidden_dropout_rate)), 0.0)
    z = o + x2d.astype(jnp.float32)
    y, _, _ = _layer_norm_fwd(
        z, gamma_ref[:].astype(jnp.float32), beta_ref[:].astype(jnp.float32),
        spec.eps,
    )
    y_ref[:] = y.reshape(block, s, h).astype(y_ref.dtype)


def _attn_bwd_grads_packed(
    spec, qkv, dctx, groups, dqkv_ref, dtype, scale, inv_attn
):
    """Head-packed attention gradients: per-head matmuls become one packed
    matmul per group, with softmax-backward's per-segment sums from the same
    block-diag-ones trick as the forward. dprobs and dq are exact because
    the K/V packs are block-diagonal, and they pack only ONE output dim
    (lanes), same profile as the forward's score/context products. Fully
    packed dk/dv instead come out of a [G*S, G*Dh] product with BOTH output
    dims packed: G^2 MACs for G useful diagonal blocks -- the measured
    reason the all-packed train variant lost 5% at S=40. ``mixed`` keeps
    dprobs/ds/dq packed but computes dk/dv per head from slices of the
    packed probs/ds (exact, G MACs, [S, Dh] outputs)."""
    from .pallas_attention import pack_kv, segment_sums

    mixed = spec.headpack == "mixed"
    block, s, h3 = qkv.shape
    h = h3 // 3
    dh = h // spec.num_heads
    k_all = qkv[..., h : 2 * h]
    v_all = qkv[..., 2 * h :]
    for g0, g, probs, mask, _ctx_part in groups:
        kpack, vpack = pack_kv(k_all, v_all, g0, g, dh, dtype)
        q_g = qkv[..., g0 * dh : (g0 + g) * dh]
        dctx_g = dctx[..., g0 * dh : (g0 + g) * dh].astype(dtype)
        probsd = jnp.where(mask, probs * inv_attn, 0.0) if mask is not None else probs
        probsd16 = probsd.astype(dtype)
        # exact: vpack is block-diagonal, so segment j picks dctx_j @ v_j^T
        dprobsd = jax.lax.dot_general(
            dctx_g, vpack, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dprobs = (
            jnp.where(mask, dprobsd * inv_attn, 0.0) if mask is not None else dprobsd
        )
        rowseg = segment_sums(dprobs * probs, g, s)
        ds = probs * (dprobs - rowseg) * scale
        ds16 = ds.astype(dtype)
        dq_g = jax.lax.dot_general(
            ds16, kpack, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[..., g0 * dh : (g0 + g) * dh] = dq_g.astype(dqkv_ref.dtype)
        if mixed:
            for j in range(g):
                hj = g0 + j
                ds_j = ds16[..., j * s : (j + 1) * s]
                probsd_j = probsd16[..., j * s : (j + 1) * s]
                q_j = q_g[..., j * dh : (j + 1) * dh]
                dctx_j = dctx_g[..., j * dh : (j + 1) * dh]
                dk_j = jax.lax.dot_general(
                    ds_j, q_j, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                dv_j = jax.lax.dot_general(
                    probsd_j, dctx_j,
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                dqkv_ref[..., h + hj * dh : h + (hj + 1) * dh] = dk_j.astype(
                    dqkv_ref.dtype
                )
                dqkv_ref[..., 2 * h + hj * dh : 2 * h + (hj + 1) * dh] = (
                    dv_j.astype(dqkv_ref.dtype)
                )
            continue
        # dv-pack [block, G*S, G*Dh]: diag blocks = probsd_j^T @ dctx_j
        dvpack = jax.lax.dot_general(
            probsd16, dctx_g, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dkpack = jax.lax.dot_general(
            ds16, q_g, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        for j in range(g):
            hj = g0 + j
            dqkv_ref[..., h + hj * dh : h + (hj + 1) * dh] = dkpack[
                :, j * s : (j + 1) * s, j * dh : (j + 1) * dh
            ].astype(dqkv_ref.dtype)
            dqkv_ref[..., 2 * h + hj * dh : 2 * h + (hj + 1) * dh] = dvpack[
                :, j * s : (j + 1) * s, j * dh : (j + 1) * dh
            ].astype(dqkv_ref.dtype)


def _attn_bwd_kernel(
    seed_ref, x_ref, dy_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, gamma_ref,
    *rest, spec: AttnTrainSpec,
):
    if spec.has_bias:
        (bias_ref, dx_ref, dqkv_ref, ctx_ref, do_ref, dgamma_ref,
         dbeta_ref) = rest
    else:
        (dx_ref, dqkv_ref, ctx_ref, do_ref, dgamma_ref, dbeta_ref) = rest
        bias_ref = None
    seed = _seed_prng(seed_ref, spec.interpret)
    x = x_ref[:]
    block, s, h = x.shape
    n, dh = spec.num_heads, h // spec.num_heads
    scale = 1.0 / (dh**0.5)
    x2d = x.reshape(block * s, h)
    # ---- recompute forward (identical draw order to _attn_fwd_kernel) ----
    qkv = (
        jax.lax.dot(x2d, wqkv_ref[:], preferred_element_type=jnp.float32)
        + bqkv_ref[:].astype(jnp.float32)
    ).astype(x.dtype).reshape(block, s, 3 * h)
    bias = None
    if bias_ref is not None:
        bias = bias_ref[:].astype(jnp.float32)[:, None, :]
    inv_attn = 1.0 / (1.0 - spec.attn_dropout_rate)
    if spec.headpack:
        groups, _ = _attn_recompute_packed(spec, seed, qkv, bias, x.dtype)
        parts = [ctx_part for _, _, _, _, ctx_part in groups]
        ctx = (parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1))
        ctx = ctx.reshape(block * s, h)
    else:
        probs_list, keep_list = _attn_recompute_heads(spec, seed, qkv, bias)
        head_outs, probsd_list = [], []
        for i in range(n):
            probs = probs_list[i]
            if keep_list[i] is not None:
                probsd = jnp.where(keep_list[i], probs * inv_attn, 0.0)
            else:
                probsd = probs
            probsd16 = probsd.astype(x.dtype)
            probsd_list.append(probsd16)
            v = qkv[..., 2 * h + i * dh : 2 * h + (i + 1) * dh]
            head_outs.append(
                jax.lax.dot_general(
                    probsd16, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
            )
        ctx = jnp.concatenate(head_outs, axis=-1).reshape(block * s, h)
    ctx_ref[:] = ctx.reshape(block, s, h)
    o = jax.lax.dot(
        ctx, wo_ref[:], preferred_element_type=jnp.float32
    ) + bo_ref[:].astype(jnp.float32)
    if spec.hidden_dropout_rate > 0.0:
        keep_h = _keep_mask(seed, 0, o.shape, spec.hidden_cutoff, spec.interpret)
        inv_h = 1.0 / (1.0 - spec.hidden_dropout_rate)
        o = jnp.where(keep_h, o * inv_h, 0.0)
    z = o + x2d.astype(jnp.float32)
    gamma = gamma_ref[:].astype(jnp.float32)
    mean = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(z - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + spec.eps)
    zn = (z - mean) * inv
    # ---- backward ----
    dy = dy_ref[:].reshape(block * s, h).astype(jnp.float32)
    _write_partial(dgamma_ref, jnp.sum(dy * zn, axis=0))
    _write_partial(dbeta_ref, jnp.sum(dy, axis=0))
    dz = _layer_norm_bwd(dy, zn, inv, gamma)
    if spec.hidden_dropout_rate > 0.0:
        do = jnp.where(keep_h, dz * inv_h, 0.0)
    else:
        do = dz
    do16 = do.astype(x.dtype)
    do_ref[:] = do16.reshape(block, s, h)
    dctx = jax.lax.dot_general(
        do16, wo_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(block, s, h)
    if spec.headpack:
        _attn_bwd_grads_packed(
            spec, qkv, dctx, groups, dqkv_ref, x.dtype, scale, inv_attn
        )
        dqkv = dqkv_ref[:].reshape(block * s, 3 * h)
        dx = dz + jax.lax.dot_general(
            dqkv, wqkv_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dx_ref[:] = dx.reshape(block, s, h).astype(dx_ref.dtype)
        return
    for i in range(n):
        q = qkv[..., i * dh : (i + 1) * dh]
        k = qkv[..., h + i * dh : h + (i + 1) * dh]
        v = qkv[..., 2 * h + i * dh : 2 * h + (i + 1) * dh]
        dctx_h = dctx[..., i * dh : (i + 1) * dh].astype(x.dtype)
        # dv = probs_dropped^T @ dctx_h   (contract query positions)
        dv = jax.lax.dot_general(
            probsd_list[i], dctx_h,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # dprobs (pre-dropout) = dropout_bwd(dctx_h @ v^T)
        dprobsd = jax.lax.dot_general(
            dctx_h, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if keep_list[i] is not None:
            dprobs = jnp.where(keep_list[i], dprobsd * inv_attn, 0.0)
        else:
            dprobs = dprobsd
        probs = probs_list[i]
        ds = (
            probs * (dprobs - jnp.sum(dprobs * probs, axis=-1, keepdims=True))
        ) * scale
        ds16 = ds.astype(x.dtype)
        dq = jax.lax.dot_general(
            ds16, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # dk = ds^T @ q (contract query positions of ds)
        dk = jax.lax.dot_general(
            ds16, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[..., i * dh : (i + 1) * dh] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[..., h + i * dh : h + (i + 1) * dh] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[..., 2 * h + i * dh : 2 * h + (i + 1) * dh] = dv.astype(
            dqkv_ref.dtype
        )
    dqkv = dqkv_ref[:].reshape(block * s, 3 * h)
    dx = dz + jax.lax.dot_general(
        dqkv, wqkv_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[:] = dx.reshape(block, s, h).astype(dx_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _attn_train(spec, x, wqkv, bqkv, wo, bo, gamma, beta, seed, bias):
    y, _ = _attn_train_fwd(spec, x, wqkv, bqkv, wo, bo, gamma, beta, seed, bias)
    return y


def _attn_train_fwd(spec, x, wqkv, bqkv, wo, bo, gamma, beta, seed, bias):
    b, s, h = x.shape
    block = _pick_block(b, spec.block_b)
    n_blocks = _grid_check(b, block, "attention_block_train")
    dt = x.dtype
    wqkvc, woc = wqkv.astype(dt), wo.astype(dt)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        _block_spec(block, (s, h)),
        _const_spec(wqkvc), _const_spec(bqkv), _const_spec(woc),
        _const_spec(bo), _const_spec(gamma), _const_spec(beta),
    ]
    args = [seed, x, wqkvc, bqkv, woc, bo, gamma, beta]
    if spec.has_bias:
        in_specs.append(
            pl.BlockSpec((block, s), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        args.append(bias)
    y = pl.pallas_call(
        functools.partial(_attn_fwd_kernel, spec=spec),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=_block_spec(block, (s, h)),
        out_shape=jax.ShapeDtypeStruct((b, s, h), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=spec.interpret,
    )(*args)
    return y, (x, wqkv, bqkv, wo, bo, gamma, seed, bias)


def _attn_train_bwd(spec, res, dy):
    x, wqkv, bqkv, wo, bo, gamma, seed, bias = res
    b, s, h = x.shape
    block = _pick_block(b, spec.block_b)
    n_blocks = b // block
    dt = x.dtype
    wqkvc, woc = wqkv.astype(dt), wo.astype(dt)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        _block_spec(block, (s, h)),
        _block_spec(block, (s, h)),
        _const_spec(wqkvc), _const_spec(bqkv), _const_spec(woc),
        _const_spec(bo), _const_spec(gamma),
    ]
    args = [seed, x, dy.astype(dt), wqkvc, bqkv, woc, bo, gamma]
    if spec.has_bias:
        in_specs.append(
            pl.BlockSpec((block, s), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        args.append(bias)
    dx, dqkv, ctx, do, dgamma_p, dbeta_p = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, spec=spec),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[
            _block_spec(block, (s, h)),
            _block_spec(block, (s, 3 * h)),
            _block_spec(block, (s, h)),
            _block_spec(block, (s, h)),
            _partial_spec(h),
            _partial_spec(h),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, h), dt),
            jax.ShapeDtypeStruct((b, s, 3 * h), dt),
            jax.ShapeDtypeStruct((b, s, h), dt),
            jax.ShapeDtypeStruct((b, s, h), dt),
            jax.ShapeDtypeStruct((n_blocks, 8, h), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 8, h), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=spec.interpret,
    )(*args)
    rows = lambda t: t.reshape(-1, t.shape[-1])  # noqa: E731
    dwqkv = jax.lax.dot_general(
        rows(x), rows(dqkv), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbqkv = jnp.sum(rows(dqkv).astype(jnp.float32), axis=0)
    dwo = jax.lax.dot_general(
        rows(ctx), rows(do), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbo = jnp.sum(rows(do).astype(jnp.float32), axis=0)
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    # bias is an additive attention mask derived from integer lengths; its
    # cotangent dies at the int boundary upstream, so skip the per-head sum
    dbias = None if bias is None else jnp.zeros_like(bias)
    return (dx, dwqkv, dbqkv, dwo, dbo,
            dgamma_p[:, 0, :].sum(0), dbeta_p[:, 0, :].sum(0), dseed, dbias)


_attn_train.defvjp(_attn_train_fwd, _attn_train_bwd)


def attention_block_train(
    x: jax.Array,  # [B, S, H]
    wqkv: jax.Array,  # [H, 3H] float32
    bqkv: jax.Array,
    wo: jax.Array,  # [H, H] float32
    bo: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    num_heads: int,
    seed: jax.Array,  # [1] int32
    bias: jax.Array | None = None,  # compact key-mask rows [B, S] (additive)
    attn_dropout_rate: float = 0.0,
    hidden_dropout_rate: float = 0.0,
    eps: float = 1e-12,
    block_b: int | None = None,
    interpret: bool = False,
    headpack: bool | str | None = None,
) -> jax.Array:
    """Differentiable fused self-attention block with in-kernel dropout.

    ``headpack=True`` packs heads into the 128-lane score tile
    (ops/pallas_attention.py) in both the forward and the backward head
    math; ``headpack="mixed"`` packs the forward/recompute and the exact
    single-packed-output-dim backward products (dprobs/ds/dq) but keeps
    dk/dv per head -- dropout masks are drawn with the same per-head
    order/shapes in every variant, so all three train bit-identically given
    the same seed. Default ON (env KMR_TRAIN_HEADPACK=0|mixed overrides):
    in 3 interleaved reps on v5e full packing won every paired comparison
    (A: 3,846 -> 4,157 median pairs/s at B=1024, +8%; LXMERT: 1,833 ->
    2,051, +12%; "mixed" lands between) -- an earlier -5% reading for the
    all-packed variant predated dropping the outer scan remat (which ran
    every forward kernel twice) and did not reproduce (docs/BENCH.md)."""
    if block_b is None:
        block_b = _env_block(8, kind="attn")
    if headpack is None:
        import os

        env = os.environ.get("KMR_TRAIN_HEADPACK", "")
        headpack = "mixed" if env == "mixed" else env != "0"
    spec = AttnTrainSpec(
        num_heads=num_heads,
        attn_dropout_rate=float(attn_dropout_rate),
        hidden_dropout_rate=float(hidden_dropout_rate),
        eps=eps, block_b=block_b, interpret=interpret,
        has_bias=bias is not None,
        headpack=headpack,
    )
    return _attn_train(spec, x, wqkv, bqkv, wo, bo, gamma, beta, seed, bias)


# ==========================================================================
# cross-attention block (LXMERT x-layers):
#   y = LN(x + dropout(Wo . concat_heads(dropout(softmax(Q(x) K(ctx)^T/s
#       + bias)) V(ctx))))
# ==========================================================================


@dataclass(frozen=True)
class CrossTrainSpec:
    num_heads: int
    attn_dropout_rate: float
    hidden_dropout_rate: float
    eps: float
    block_b: int
    interpret: bool
    has_bias: bool

    @property
    def attn_cutoff(self) -> int:
        return dropout_cutoff(self.attn_dropout_rate)

    @property
    def hidden_cutoff(self) -> int:
        return dropout_cutoff(self.hidden_dropout_rate)


def _cross_recompute_heads(spec: CrossTrainSpec, seed, q, kv, bias):
    """Shared fwd/bwd head loop over F->T attention: per-head
    (undropped probs f32 [block, F, T], keep mask). Draw order matches the
    self-attention kernels: head i draws 1+i; hidden draw 0 comes after."""
    block, f, h = q.shape
    t = kv.shape[1]
    n, dh = spec.num_heads, h // spec.num_heads
    scale = 1.0 / (dh**0.5)
    probs_list, keep_list = [], []
    for i in range(n):
        qh = q[..., i * dh : (i + 1) * dh]
        kh = kv[..., i * dh : (i + 1) * dh]
        scores = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores, axis=-1)
        keep = None
        if spec.attn_dropout_rate > 0.0:
            keep = _keep_mask(
                seed, 1 + i, probs.shape, spec.attn_cutoff, spec.interpret
            )
        probs_list.append(probs)
        keep_list.append(keep)
    return probs_list, keep_list


def _cross_fwd_kernel(
    seed_ref, x_ref, ctx_ref, wq_ref, bq_ref, wkv_ref, bkv_ref, wo_ref,
    bo_ref, gamma_ref, beta_ref, *rest, spec: CrossTrainSpec,
):
    if spec.has_bias:
        bias_ref, y_ref = rest
    else:
        (y_ref,) = rest
        bias_ref = None
    seed = _seed_prng(seed_ref, spec.interpret)
    x = x_ref[:]
    c = ctx_ref[:]
    block, f, h = x.shape
    t = c.shape[1]
    n, dh = spec.num_heads, h // spec.num_heads
    x2d = x.reshape(block * f, h)
    q = (
        jax.lax.dot(x2d, wq_ref[:], preferred_element_type=jnp.float32)
        + bq_ref[:].astype(jnp.float32)
    ).astype(x.dtype).reshape(block, f, h)
    kv = (
        jax.lax.dot(
            c.reshape(block * t, h), wkv_ref[:],
            preferred_element_type=jnp.float32,
        )
        + bkv_ref[:].astype(jnp.float32)
    ).astype(x.dtype).reshape(block, t, 2 * h)
    bias = None
    if bias_ref is not None:
        # compact ctx-side key-mask rows [BLOCK, T], broadcast over queries
        bias = bias_ref[:].astype(jnp.float32)[:, None, :]
    probs_list, keep_list = _cross_recompute_heads(spec, seed, q, kv, bias)
    inv_attn = 1.0 / (1.0 - spec.attn_dropout_rate)
    head_outs = []
    for i in range(n):
        probs = probs_list[i]
        if keep_list[i] is not None:
            probs = jnp.where(keep_list[i], probs * inv_attn, 0.0)
        vh = kv[..., h + i * dh : h + (i + 1) * dh]
        head_outs.append(
            jax.lax.dot_general(
                probs.astype(x.dtype), vh,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        )
    ctx_out = jnp.concatenate(head_outs, axis=-1).reshape(block * f, h)
    o = jax.lax.dot(
        ctx_out, wo_ref[:], preferred_element_type=jnp.float32
    ) + bo_ref[:].astype(jnp.float32)
    if spec.hidden_dropout_rate > 0.0:
        keep_h = _keep_mask(seed, 0, o.shape, spec.hidden_cutoff, spec.interpret)
        o = jnp.where(keep_h, o * (1.0 / (1.0 - spec.hidden_dropout_rate)), 0.0)
    z = o + x2d.astype(jnp.float32)
    y, _, _ = _layer_norm_fwd(
        z, gamma_ref[:].astype(jnp.float32), beta_ref[:].astype(jnp.float32),
        spec.eps,
    )
    y_ref[:] = y.reshape(block, f, h).astype(y_ref.dtype)


def _cross_bwd_kernel(
    seed_ref, x_ref, ctx_ref, dy_ref, wq_ref, bq_ref, wkv_ref, bkv_ref,
    wo_ref, bo_ref, gamma_ref, *rest, spec: CrossTrainSpec,
):
    if spec.has_bias:
        (bias_ref, dx_ref, dq_ref, dkv_ref, ctxout_ref, do_ref,
         dgamma_ref, dbeta_ref) = rest
    else:
        (dx_ref, dq_ref, dkv_ref, ctxout_ref, do_ref, dgamma_ref,
         dbeta_ref) = rest
        bias_ref = None
    seed = _seed_prng(seed_ref, spec.interpret)
    x = x_ref[:]
    c = ctx_ref[:]
    block, f, h = x.shape
    t = c.shape[1]
    n, dh = spec.num_heads, h // spec.num_heads
    scale = 1.0 / (dh**0.5)
    x2d = x.reshape(block * f, h)
    # ---- recompute forward (identical draw order to _cross_fwd_kernel) ----
    q = (
        jax.lax.dot(x2d, wq_ref[:], preferred_element_type=jnp.float32)
        + bq_ref[:].astype(jnp.float32)
    ).astype(x.dtype).reshape(block, f, h)
    kv = (
        jax.lax.dot(
            c.reshape(block * t, h), wkv_ref[:],
            preferred_element_type=jnp.float32,
        )
        + bkv_ref[:].astype(jnp.float32)
    ).astype(x.dtype).reshape(block, t, 2 * h)
    bias = None
    if bias_ref is not None:
        bias = bias_ref[:].astype(jnp.float32)[:, None, :]
    probs_list, keep_list = _cross_recompute_heads(spec, seed, q, kv, bias)
    inv_attn = 1.0 / (1.0 - spec.attn_dropout_rate)
    head_outs, probsd_list = [], []
    for i in range(n):
        probs = probs_list[i]
        if keep_list[i] is not None:
            probsd = jnp.where(keep_list[i], probs * inv_attn, 0.0)
        else:
            probsd = probs
        probsd16 = probsd.astype(x.dtype)
        probsd_list.append(probsd16)
        vh = kv[..., h + i * dh : h + (i + 1) * dh]
        head_outs.append(
            jax.lax.dot_general(
                probsd16, vh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        )
    ctx_out = jnp.concatenate(head_outs, axis=-1).reshape(block * f, h)
    ctxout_ref[:] = ctx_out.reshape(block, f, h)
    o = jax.lax.dot(
        ctx_out, wo_ref[:], preferred_element_type=jnp.float32
    ) + bo_ref[:].astype(jnp.float32)
    if spec.hidden_dropout_rate > 0.0:
        keep_h = _keep_mask(seed, 0, o.shape, spec.hidden_cutoff, spec.interpret)
        inv_h = 1.0 / (1.0 - spec.hidden_dropout_rate)
        o = jnp.where(keep_h, o * inv_h, 0.0)
    z = o + x2d.astype(jnp.float32)
    gamma = gamma_ref[:].astype(jnp.float32)
    mean = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(z - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + spec.eps)
    zn = (z - mean) * inv
    # ---- backward ----
    dy = dy_ref[:].reshape(block * f, h).astype(jnp.float32)
    _write_partial(dgamma_ref, jnp.sum(dy * zn, axis=0))
    _write_partial(dbeta_ref, jnp.sum(dy, axis=0))
    dz = _layer_norm_bwd(dy, zn, inv, gamma)
    if spec.hidden_dropout_rate > 0.0:
        do = jnp.where(keep_h, dz * inv_h, 0.0)
    else:
        do = dz
    do16 = do.astype(x.dtype)
    do_ref[:] = do16.reshape(block, f, h)
    dctxout = jax.lax.dot_general(
        do16, wo_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(block, f, h)
    for i in range(n):
        qh = q[..., i * dh : (i + 1) * dh]
        kh = kv[..., i * dh : (i + 1) * dh]
        vh = kv[..., h + i * dh : h + (i + 1) * dh]
        dctx_h = dctxout[..., i * dh : (i + 1) * dh].astype(x.dtype)
        # dv = probs_dropped^T @ dctx_h (contract the F query positions)
        dv = jax.lax.dot_general(
            probsd_list[i], dctx_h,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dprobsd = jax.lax.dot_general(
            dctx_h, vh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if keep_list[i] is not None:
            dprobs = jnp.where(keep_list[i], dprobsd * inv_attn, 0.0)
        else:
            dprobs = dprobsd
        probs = probs_list[i]
        ds = (
            probs * (dprobs - jnp.sum(dprobs * probs, axis=-1, keepdims=True))
        ) * scale
        ds16 = ds.astype(x.dtype)
        dqh = jax.lax.dot_general(
            ds16, kh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds16, qh, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dq_ref[..., i * dh : (i + 1) * dh] = dqh.astype(dq_ref.dtype)
        dkv_ref[..., i * dh : (i + 1) * dh] = dk.astype(dkv_ref.dtype)
        dkv_ref[..., h + i * dh : h + (i + 1) * dh] = dv.astype(dkv_ref.dtype)
    dq2d = dq_ref[:].reshape(block * f, h)
    dx = dz + jax.lax.dot_general(
        dq2d, wq_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[:] = dx.reshape(block, f, h).astype(dx_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _cross_train(spec, x, ctx, wq, bq, wkv, bkv, wo, bo, gamma, beta, seed, bias):
    y, _ = _cross_train_fwd(
        spec, x, ctx, wq, bq, wkv, bkv, wo, bo, gamma, beta, seed, bias
    )
    return y


def _cross_train_fwd(spec, x, ctx, wq, bq, wkv, bkv, wo, bo, gamma, beta, seed, bias):
    b, f, h = x.shape
    t = ctx.shape[1]
    block = _pick_block(b, spec.block_b)
    n_blocks = _grid_check(b, block, "cross_attention_block_train")
    dt = x.dtype
    wqc, wkvc, woc = wq.astype(dt), wkv.astype(dt), wo.astype(dt)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        _block_spec(block, (f, h)),
        _block_spec(block, (t, h)),
        _const_spec(wqc), _const_spec(bq), _const_spec(wkvc),
        _const_spec(bkv), _const_spec(woc), _const_spec(bo),
        _const_spec(gamma), _const_spec(beta),
    ]
    args = [seed, x, ctx.astype(dt), wqc, bq, wkvc, bkv, woc, bo, gamma, beta]
    if spec.has_bias:
        in_specs.append(
            pl.BlockSpec((block, t), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        args.append(bias)
    y = pl.pallas_call(
        functools.partial(_cross_fwd_kernel, spec=spec),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=_block_spec(block, (f, h)),
        out_shape=jax.ShapeDtypeStruct((b, f, h), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=spec.interpret,
    )(*args)
    return y, (x, ctx, wq, bq, wkv, bkv, wo, bo, gamma, seed, bias)


def _cross_train_bwd(spec, res, dy):
    x, ctx, wq, bq, wkv, bkv, wo, bo, gamma, seed, bias = res
    b, f, h = x.shape
    t = ctx.shape[1]
    block = _pick_block(b, spec.block_b)
    n_blocks = b // block
    dt = x.dtype
    wqc, wkvc, woc = wq.astype(dt), wkv.astype(dt), wo.astype(dt)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        _block_spec(block, (f, h)),
        _block_spec(block, (t, h)),
        _block_spec(block, (f, h)),
        _const_spec(wqc), _const_spec(bq), _const_spec(wkvc),
        _const_spec(bkv), _const_spec(woc), _const_spec(bo),
        _const_spec(gamma),
    ]
    args = [seed, x, ctx.astype(dt), dy.astype(dt), wqc, bq, wkvc, bkv,
            woc, bo, gamma]
    if spec.has_bias:
        in_specs.append(
            pl.BlockSpec((block, t), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        args.append(bias)
    dx, dq, dkv, ctxout, do, dgamma_p, dbeta_p = pl.pallas_call(
        functools.partial(_cross_bwd_kernel, spec=spec),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[
            _block_spec(block, (f, h)),
            _block_spec(block, (f, h)),
            _block_spec(block, (t, 2 * h)),
            _block_spec(block, (f, h)),
            _block_spec(block, (f, h)),
            _partial_spec(h),
            _partial_spec(h),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, f, h), dt),
            jax.ShapeDtypeStruct((b, f, h), dt),
            jax.ShapeDtypeStruct((b, t, 2 * h), dt),
            jax.ShapeDtypeStruct((b, f, h), dt),
            jax.ShapeDtypeStruct((b, f, h), dt),
            jax.ShapeDtypeStruct((n_blocks, 8, h), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 8, h), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=spec.interpret,
    )(*args)
    rows = lambda a: a.reshape(-1, a.shape[-1])  # noqa: E731
    # dctx rides one big near-peak XLA matmul, like the weight grads
    dctx = jax.lax.dot_general(
        rows(dkv), wkvc, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(b, t, h).astype(dt)
    dwq = jax.lax.dot_general(
        rows(x), rows(dq), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbq = jnp.sum(rows(dq).astype(jnp.float32), axis=0)
    dwkv = jax.lax.dot_general(
        rows(ctx).astype(dt), rows(dkv),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbkv = jnp.sum(rows(dkv).astype(jnp.float32), axis=0)
    dwo = jax.lax.dot_general(
        rows(ctxout), rows(do), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbo = jnp.sum(rows(do).astype(jnp.float32), axis=0)
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    dbias = None if bias is None else jnp.zeros_like(bias)
    return (dx, dctx, dwq, dbq, dwkv, dbkv, dwo, dbo,
            dgamma_p[:, 0, :].sum(0), dbeta_p[:, 0, :].sum(0), dseed, dbias)


_cross_train.defvjp(_cross_train_fwd, _cross_train_bwd)


def cross_attention_block_train(
    x: jax.Array,  # [B, F, H] query-side stream
    ctx: jax.Array,  # [B, T, H] key/value-side stream
    wq: jax.Array,  # [H, H] float32
    bq: jax.Array,
    wkv: jax.Array,  # [H, 2H] float32 (key ++ value kernels)
    bkv: jax.Array,
    wo: jax.Array,  # [H, H] float32
    bo: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    num_heads: int,
    seed: jax.Array,  # [1] int32
    bias: jax.Array | None = None,  # compact ctx key-mask rows [B, T]
    attn_dropout_rate: float = 0.0,
    hidden_dropout_rate: float = 0.0,
    eps: float = 1e-12,
    block_b: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable fused cross-attention block with in-kernel dropout.

    The LXMERT x-layers' two cross directions (``lxmert/src/lxrt/
    modeling.py:460-464``) previously trained on the unfused XLA path
    (ops/pallas_train.py had self-attention only), leaving 10 of the 19
    per-forward blocks unfused with threefry mask tensors in HBM. Same
    recompute-in-VMEM backward + hardware-PRNG dropout scheme as
    ``attention_block_train``; dctx and all weight gradients ride XLA
    matmuls over B*F / B*T rows."""
    if block_b is None:
        block_b = _env_block(8, kind="attn")
    spec = CrossTrainSpec(
        num_heads=num_heads,
        attn_dropout_rate=float(attn_dropout_rate),
        hidden_dropout_rate=float(hidden_dropout_rate),
        eps=eps, block_b=block_b, interpret=interpret,
        has_bias=bias is not None,
    )
    return _cross_train(spec, x, ctx, wq, bq, wkv, bkv, wo, bo, gamma, beta,
                        seed, bias)


# ==========================================================================
# backend switch (mirrors ops/attention.py's backend selection)
# ==========================================================================

_TRAIN_FUSED: str = "auto"  # "auto" | "on" | "off" | "interpret"


def set_train_fused(mode: str) -> None:
    global _TRAIN_FUSED
    assert mode in ("auto", "on", "off", "interpret"), mode
    _TRAIN_FUSED = mode


def train_fused_mode() -> str:
    """Resolved mode: "on", "off" or "interpret" (test path on CPU)."""
    import os

    mode = os.environ.get("KMR_TRAIN_FUSED", _TRAIN_FUSED)
    if mode == "auto":
        return "on" if jax.default_backend() == "tpu" else "off"
    return mode


import contextlib


@contextlib.contextmanager
def train_fused(mode: str):
    global _TRAIN_FUSED
    prev = _TRAIN_FUSED
    set_train_fused(mode)
    try:
        yield
    finally:
        _TRAIN_FUSED = prev


def seed_from_key(rng: jax.Array) -> jax.Array:
    """[1] int32 kernel seed from a jax PRNG key (free: reinterprets the
    key's first word rather than running another threefry round)."""
    data = jax.random.key_data(rng).reshape(-1)[:1]
    return jax.lax.bitcast_convert_type(data, jnp.int32)
