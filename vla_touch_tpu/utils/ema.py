"""Exponential moving averages of parameter pytrees.

Covers both EMA profiles used by the reference:

- :func:`torch_ema_decay` — torch_ema's ``ExponentialMovingAverage`` with
  ``use_num_updates=True`` (the BRIDGeR nets, ``bridge_model.py:433``,
  decay=0.75): effective decay = min(decay, (1+n)/(10+n)).
- :func:`rdt_ema_decay` — the RDT trainer's warmup-scheduled EMA
  (``/root/reference/VLA/models/ema_model.py:7-89``):
  decay(step) = clip(1 - (1 + step/inv_gamma)^(-power), min_value, max_value)
  and 0 before ``update_after_step``.

State is a plain pytree of float32 shadows plus an update counter; ``update``
is jittable and donation-friendly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EmaState:
    shadow: dict
    num_updates: jax.Array  # int32 scalar


def init(params) -> EmaState:
    return EmaState(
        # jnp.array(copy=True): astype would alias float32 params, and
        # aliased buffers break donation in jitted train steps.
        shadow=jax.tree.map(lambda p: jnp.array(p, jnp.float32, copy=True),
                            params),
        num_updates=jnp.zeros((), jnp.int32),
    )


def torch_ema_decay(decay: float, num_updates):
    n = num_updates.astype(jnp.float32)
    return jnp.minimum(decay, (1.0 + n) / (10.0 + n))


def rdt_ema_decay(step, update_after_step: int = 0, inv_gamma: float = 1.0,
                  power: float = 0.75, min_value: float = 0.0,
                  max_value: float = 0.9999):
    s = jnp.maximum(step.astype(jnp.float32) - update_after_step - 1, 0.0)
    value = 1.0 - (1.0 + s / inv_gamma) ** (-power)
    value = jnp.where(s <= 0, 0.0, value)
    return jnp.clip(value, min_value, max_value)


def update(state: EmaState, params, decay) -> EmaState:
    """shadow <- decay*shadow + (1-decay)*params (one-minus form)."""
    one_minus = 1.0 - decay
    new_shadow = jax.tree.map(
        lambda s, p: s - one_minus * (s - p.astype(jnp.float32)),
        state.shadow, params,
    )
    return EmaState(shadow=new_shadow, num_updates=state.num_updates + 1)


def update_torch_ema(state: EmaState, params, decay: float = 0.75) -> EmaState:
    """torch_ema-compatible step: the counter increments BEFORE the decay
    computation (torch_ema semantics — first update uses (1+1)/(10+1))."""
    return update(state, params,
                  torch_ema_decay(decay, state.num_updates + 1))
