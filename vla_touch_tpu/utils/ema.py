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


def init(params, dtype=jnp.float32) -> EmaState:
    return EmaState(
        # jnp.array(copy=True): astype would alias float32 params, and
        # aliased buffers break donation in jitted train steps.
        shadow=jax.tree.map(lambda p: jnp.array(p, dtype, copy=True),
                            params),
        num_updates=jnp.zeros((), jnp.int32),
    )


def stochastic_round_bf16(key, x):
    """Unbiased f32 -> bf16 rounding: E[sr(x)] == x.

    Adds uniform noise in [0, ulp) to the low 16 mantissa bits and
    truncates, so sub-ulp increments (the (1-decay)*(p-s) EMA updates at
    decay 0.999 round to ZERO under nearest-even bf16 and the shadow
    stalls) survive in expectation.  Finite inputs only (inf/nan bit
    patterns are not preserved).
    """
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    noise = jax.random.randint(key, x.shape, 0, 1 << 16, dtype=jnp.uint32)
    rounded = (bits + noise) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(rounded, jnp.float32).astype(
        jnp.bfloat16)


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


def update(state: EmaState, params, decay, key=None) -> EmaState:
    """shadow <- decay*shadow + (1-decay)*params (one-minus form).

    The update always computes in f32.  For a bf16 shadow (the 1B
    single-chip memory lever, ``TrainConfig.ema_dtype``) pass ``key``:
    the result is stochastically rounded back to bf16 so the shadow tracks
    in expectation instead of stalling once updates shrink below one ulp.
    """
    one_minus = 1.0 - decay
    leaves, treedef = jax.tree.flatten(state.shadow)
    params_leaves = jax.tree.leaves(params)
    bf16 = any(l.dtype == jnp.bfloat16 for l in leaves)
    if bf16 and key is None:
        raise ValueError("bf16 EMA shadow requires a PRNG key for "
                         "stochastic rounding")
    keys = jax.random.split(key, len(leaves)) if bf16 else [None] * len(leaves)
    out = []
    for s, p, k in zip(leaves, params_leaves, keys):
        new = s.astype(jnp.float32) - one_minus * (
            s.astype(jnp.float32) - p.astype(jnp.float32))
        if s.dtype == jnp.bfloat16:
            new = stochastic_round_bf16(k, new)
        out.append(new.astype(s.dtype))
    return EmaState(shadow=jax.tree.unflatten(treedef, out),
                    num_updates=state.num_updates + 1)


def update_torch_ema(state: EmaState, params, decay: float = 0.75) -> EmaState:
    """torch_ema-compatible step: the counter increments BEFORE the decay
    computation (torch_ema semantics — first update uses (1+1)/(10+1))."""
    return update(state, params,
                  torch_ema_decay(decay, state.num_updates + 1))
