"""8-bit AdamW: quantization roundtrip, memory shape, convergence parity."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vla_touch_tpu.ops.adam8bit import (
    adamw8bit,
    dequantize_blockwise,
    quantize_blockwise,
)


def test_blockwise_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(3, 1000)) * np.exp(
        rng.normal(size=(3, 1000))), jnp.float32)
    q, s = quantize_blockwise(x)
    assert q.dtype == jnp.int8
    back = dequantize_blockwise(q, s, x.shape)
    rel = float(jnp.max(jnp.abs(back - x)) / jnp.max(jnp.abs(x)))
    # per-block scales: error bounded by the largest block's quant step
    assert rel < 0.01
    # relative error within each block is ~1/127
    blockwise_rel = jnp.abs(back - x) / (jnp.abs(x) + 1e-6)
    assert float(jnp.median(blockwise_rel)) < 0.05


def test_adam8bit_converges_like_adamw(rng):
    """Quadratic bowl: 8-bit AdamW tracks fp32 AdamW closely."""
    target = jnp.asarray(rng.normal(size=(300,)), jnp.float32)

    def loss(p):
        return jnp.sum(jnp.square(p["w"] - target))

    params8 = {"w": jnp.zeros(300)}
    params32 = {"w": jnp.zeros(300)}
    opt8 = adamw8bit(0.05, weight_decay=0.0)
    opt32 = optax.adamw(0.05, weight_decay=0.0)
    s8, s32 = opt8.init(params8), opt32.init(params32)

    @jax.jit
    def step8(p, s):
        g = jax.grad(loss)(p)
        u, s = opt8.update(g, s, p)
        return optax.apply_updates(p, u), s

    @jax.jit
    def step32(p, s):
        g = jax.grad(loss)(p)
        u, s = opt32.update(g, s, p)
        return optax.apply_updates(p, u), s

    for _ in range(200):
        params8, s8 = step8(params8, s8)
        params32, s32 = step32(params32, s32)
    l8, l32 = float(loss(params8)), float(loss(params32))
    assert l8 < 0.05 * float(jnp.sum(jnp.square(target)))  # converged
    assert l8 < max(4 * l32, 1e-2), (l8, l32)  # close to fp32 quality

    # Moment storage really is int8.
    assert s8.m_q["w"].dtype == jnp.int8
    assert s8.m_q["w"].size + 4 * s8.m_s["w"].size < 300 * 4  # < fp32 bytes


def test_adam8bit_schedule_support():
    sched = optax.schedules.linear_schedule(0.1, 0.0, 10)
    opt = adamw8bit(sched)
    params = {"w": jnp.ones(10)}
    state = opt.init(params)
    g = {"w": jnp.ones(10)}
    u1, state = opt.update(g, state, params)
    for _ in range(10):
        u2, state = opt.update(g, state, params)
    # lr decayed to ~0 -> updates shrink.
    assert float(jnp.abs(u2["w"]).max()) < float(jnp.abs(u1["w"]).max())
