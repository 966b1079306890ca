"""Optimizers and LR schedules matching the reference training setups.

* ``bert_adamw``: Google-BERT AdamWeightDecayOptimizer
  (``imagebert_lds/src/optimization.py:128-213``): Adam **without bias
  correction**, decoupled weight decay added to the update *before* the LR
  multiply, decay excluded for any parameter whose path matches
  LayerNorm/layer_norm/bias (``optimization.py:59-65,198-206``). optax's
  stock adamw bias-corrects, so this is a custom transformation.
* ``polynomial_warmup_schedule``: linear warmup then linear (power=1) decay
  to 0 (``optimization.py:25-67``).
* ``exponential_staircase_schedule``: 0.94-decay every 2500 steps, staircase
  (zk ``train_normal.py:133-137``).
* value/global-norm clipping helpers matching the two reference variants
  (``run_pretraining_predict_score.py:234-286`` global-norm 1.0;
  ``train_normal.py:93`` per-value +-1).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

DECAY_EXCLUDE_SUBSTRINGS = ("LayerNorm", "layer_norm", "bias")


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def decay_mask(params) -> dict:
    """True where weight decay applies (TF re.search semantics: substring).

    Note ``bias`` matches ``output_bias`` and slim's ``biases`` too, and the
    LayerNorm scope match covers gamma/beta -- same effective set as the
    reference.
    """

    def mask_leaf(path, _):
        name = _path_str(path)
        return not any(s in name for s in DECAY_EXCLUDE_SUBSTRINGS)

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


class BertAdamState(NamedTuple):
    m: optax.Updates
    v: optax.Updates


def bert_adamw(
    learning_rate: float | Callable[[jax.Array], jax.Array],
    weight_decay_rate: float = 0.01,
    beta_1: float = 0.9,
    beta_2: float = 0.999,
    epsilon: float = 1e-6,
    mask=None,
) -> optax.GradientTransformation:
    """BERT Adam: no bias correction; update = m/(sqrt(v)+eps) + wd*param."""

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return (BertAdamState(zeros, jax.tree.map(jnp.zeros_like, params)), jnp.zeros((), jnp.int32))

    def update(grads, state, params):
        adam_state, step = state
        lr = learning_rate(step) if callable(learning_rate) else learning_rate
        new_m = jax.tree.map(lambda m, g: beta_1 * m + (1 - beta_1) * g, adam_state.m, grads)
        new_v = jax.tree.map(
            lambda v, g: beta_2 * v + (1 - beta_2) * jnp.square(g), adam_state.v, grads
        )
        upd = jax.tree.map(lambda m, v: m / (jnp.sqrt(v) + epsilon), new_m, new_v)
        if weight_decay_rate:
            wd_mask = mask(params) if callable(mask) else mask
            if wd_mask is None:
                wd_mask = decay_mask(params)
            upd = jax.tree.map(
                lambda u, p, use: u + weight_decay_rate * p if use else u,
                upd,
                params,
                wd_mask,
            )
        updates = jax.tree.map(lambda u: -lr * u, upd)
        return updates, (BertAdamState(new_m, new_v), step + 1)

    return optax.GradientTransformation(init, update)


def polynomial_warmup_schedule(
    init_lr: float, num_train_steps: int, num_warmup_steps: int
) -> Callable[[jax.Array], jax.Array]:
    def schedule(step):
        step_f = jnp.asarray(step, jnp.float32)
        frac = jnp.minimum(step_f / num_train_steps, 1.0)
        decayed = init_lr * (1.0 - frac)
        if not num_warmup_steps:
            return decayed
        warmup = init_lr * step_f / num_warmup_steps
        return jnp.where(step_f < num_warmup_steps, warmup, decayed)

    return schedule


def exponential_staircase_schedule(
    init_lr: float, decay_steps: int = 2500, decay_rate: float = 0.94
) -> Callable[[jax.Array], jax.Array]:
    def schedule(step):
        p = jnp.floor(jnp.asarray(step, jnp.float32) / decay_steps)
        return init_lr * decay_rate**p

    return schedule


def clip_by_global_norm(grads, max_norm: float = 1.0):
    norm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return jax.tree.map(lambda g: g * scale, grads), norm


def clip_by_value(grads, clip: float = 1.0):
    return jax.tree.map(lambda g: jnp.clip(g, -clip, clip), grads)


def grad_group_norms(grads) -> dict:
    """Per-layer-group L2 gradient norms, the TPU-native rebuild of the
    reference's ``clip_by_global_norm_summary`` per-variable TF summaries
    (``run_pretraining_predict_score.py:234-258``).

    Groups by the first two pytree path components (``bert/embeddings``,
    ``bert/encoder``, ``cls/seq_relationship``, ...) instead of per
    variable: the encoder is scan-stacked here, so one "variable" already
    holds all 12 layers, and a handful of group scalars is what a human
    actually reads on a dashboard. Norms are accumulated in f32 so bf16
    grads cannot overflow the sum of squares.
    """
    groups: dict[str, jax.Array] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
        keys = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
        group = "/".join(keys[:2]) if len(keys) >= 2 else (keys[0] or "root")
        sq = jnp.sum(jnp.square(leaf.astype(jnp.float32)))
        groups[group] = groups.get(group, 0.0) + sq
    return {g: jnp.sqrt(s) for g, s in groups.items()}


def adam_with_schedule(schedule) -> optax.GradientTransformation:
    """Plain Adam (bias-corrected) as used by zk train_normal.py:159."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=schedule)
