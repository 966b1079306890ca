"""Exponential moving average of parameters.

The B/C training loop applies EMA(0.997) to all trainables each step
(``train_normal.py:191-194``) and **evaluation restores the shadow
variables** (decay 0.9999 object, ``evaluate_normal.py:204-206``). Here EMA
shadows are a plain pytree updated functionally; ``swap_in`` returns the
shadow params for eval, mirroring ``variables_to_restore``.

TF's ExponentialMovingAverage uses
shadow -= (1 - decay) * (shadow - value), with the effective decay
min(decay, (1 + num_updates) / (10 + num_updates)) when ``num_updates`` is
passed -- the reference passes ``global_step`` (train_normal.py:192), so we
replicate that ramp.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    shadow: dict
    num_updates: jax.Array  # int32 step counter


def ema_init(params) -> EmaState:
    # materialise real copies: aliasing the param buffers breaks donation
    # (same buffer donated twice in the train step)
    return EmaState(
        jax.tree.map(lambda x: jnp.array(x, copy=True), params),
        jnp.zeros((), jnp.int32),
    )


def ema_update(state: EmaState, params, decay: float = 0.997, use_num_updates: bool = True) -> EmaState:
    if use_num_updates:
        n = state.num_updates.astype(jnp.float32)
        eff = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    else:
        eff = jnp.asarray(decay, jnp.float32)
    new_shadow = jax.tree.map(
        lambda s, p: s - (1.0 - eff) * (s - p), state.shadow, params
    )
    return EmaState(new_shadow, state.num_updates + 1)


def swap_in(state: EmaState) -> dict:
    """Parameters to evaluate/serve with (the EMA shadows)."""
    return state.shadow
