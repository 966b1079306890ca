"""Multi-head attention for short cross-modal sequences (30-43 tokens).

Two interchangeable backends:

* ``mha_xla``: plain jnp einsum formulation. XLA fuses the scale/bias/softmax
  chain into the batched matmuls; for these tiny sequences the MXU work is
  dominated by the QKV/output projections which live outside this function.
* ``mha_pallas`` (ops/pallas_attention.py): a fused Pallas kernel that blocks
  over the batch dimension (sequences are far too short to block over length
  -- the blocking dimension for MXU utilisation is the *pair batch*, see
  SURVEY.md section 5 "long-context: absent").

Semantics follow BERT attention (reference ``pixelmodel.py:640-833``):
scores = QK^T / sqrt(d_head) + bias, softmax over keys, no padding masking
unless a bias is supplied (ImageBERT-A deliberately supplies none).

Softmax runs in float32 regardless of compute dtype: with 2-class heads
downstream, bf16 softmax would burn the whole 1e-3 parity budget.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """[B, S, H] -> [B, N, S, H/N]."""
    b, s, h = x.shape
    return x.reshape(b, s, num_heads, h // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """[B, N, S, Hd] -> [B, S, N*Hd]."""
    b, n, s, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, n * hd)


def mha_xla(
    q: jax.Array,  # [B, N, F, Hd]
    k: jax.Array,  # [B, N, T, Hd]
    v: jax.Array,  # [B, N, T, Hd]
    bias: jax.Array | None = None,  # additive, broadcastable to [B, N, F, T]
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    precision=None,
) -> jax.Array:
    head_dim = q.shape[-1]
    scores = jnp.einsum(
        "bnfh,bnth->bnft", q, k, preferred_element_type=jnp.float32,
        precision=precision,
    )
    scores = scores * (1.0 / jnp.sqrt(jnp.float32(head_dim)))
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    probs = probs.astype(v.dtype)
    return jnp.einsum(
        "bnft,bnth->bnfh", probs, v, preferred_element_type=jnp.float32,
        precision=precision,
    ).astype(v.dtype)


_ATTENTION_BACKEND = "xla"


def set_attention_backend(name: str) -> None:
    """Select "xla" (default), "pallas" or "pallas_packed" for encoder attention.

    The Pallas kernels are tested bit-close to the XLA path; whole-model
    benchmarks pick the winner per hardware (see ops/pallas_attention.py).
    "pallas_packed" keeps heads folded in the hidden dim end-to-end, removing
    the four [B,N,S,Dh] transpose passes per layer.
    """
    global _ATTENTION_BACKEND
    assert name in ("xla", "pallas", "pallas_packed"), name
    _ATTENTION_BACKEND = name


def packed_attention_active() -> bool:
    return _ATTENTION_BACKEND == "pallas_packed"


import contextlib


@contextlib.contextmanager
def attention_backend(name: str):
    """Scoped backend selection (used around jit tracing so concurrent
    engines with different backends don't clobber each other)."""
    global _ATTENTION_BACKEND
    prev = _ATTENTION_BACKEND
    set_attention_backend(name)
    try:
        yield
    finally:
        _ATTENTION_BACKEND = prev


def mha_packed(q, k, v, num_heads: int, bias=None):
    """Packed-layout fused attention: [B, S, H] in, [B, S, H] out."""
    from .pallas_attention import mha_pallas_packed

    return mha_pallas_packed(q, k, v, num_heads, bias)


def mha(q, k, v, bias=None, dropout_rate=0.0, dropout_rng=None, precision=None):
    """Backend-dispatching attention used by the encoder blocks."""
    if _ATTENTION_BACKEND == "pallas" and dropout_rng is None:
        from .pallas_attention import mha_pallas

        return mha_pallas(q, k, v, bias)
    return mha_xla(q, k, v, bias, dropout_rate, dropout_rng, precision)


def mask_to_bias(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[.., T] 1/0 keep-mask -> additive bias with -10000 at masked slots.

    The reference uses ``(1 - mask) * -10000`` rather than -inf
    (``pixelmodel.py:787-798``); reproduced exactly since a padded-but-
    unmasked token still leaks ~e^-10000 ~ 0 either way but the constant
    matters when every score path must match to 1e-3.
    """
    return ((1.0 - mask.astype(jnp.float32)) * -10000.0).astype(dtype)
