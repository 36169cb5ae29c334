"""8-bit AdamW: blockwise-quantized optimizer moments.

The reference trains RDT with bitsandbytes 8-bit Adam (``main.py`` flag,
``train/train.py:217-227``) to cut optimizer memory.  TPU equivalent as an
optax gradient transformation: the first/second moments are stored int8 with
one float32 scale per block of 256 values (dynamic symmetric quantization,
the bnb blockwise scheme), dequantized/requantized inside the fused update.

Memory: 2 moments × (1 byte + 4/256 bytes) ≈ 2.03 bytes/param vs 8
bytes/param for fp32 Adam — combined with ZeRO sharding over the data axis
this makes the 1.2B-param optimizer state ~2.4GB total.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

BLOCK = 256


def _pad_len(n: int) -> int:
    return (n + BLOCK - 1) // BLOCK * BLOCK


def quantize_blockwise(x):
    """float (any shape) -> (int8 flat padded, scales per block, orig shape)."""
    flat = x.reshape(-1)
    n = flat.shape[0]
    pad = _pad_len(n) - n
    flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, BLOCK)
    amax = jnp.maximum(jnp.max(jnp.abs(blocks), axis=1, keepdims=True), 1e-12)
    q = jnp.clip(jnp.round(blocks * (127.0 / amax)), -127, 127).astype(jnp.int8)
    return q, (amax[:, 0] / 127.0).astype(jnp.float32)


def dequantize_blockwise(q, scales, shape):
    flat = (q.astype(jnp.float32) * scales[:, None]).reshape(-1)
    n = 1
    for s in shape:
        n *= s
    return flat[:n].reshape(shape)


class Adam8bitState(NamedTuple):
    count: jax.Array
    m_q: optax.Params     # int8 trees
    m_s: optax.Params     # scale trees
    v_q: optax.Params
    v_s: optax.Params


def adamw8bit(learning_rate, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8, weight_decay: float = 0.0
              ) -> optax.GradientTransformation:
    """AdamW with int8 blockwise moment storage (bnb-equivalent)."""

    def init_fn(params):
        def zq(p):
            nblocks = _pad_len(p.size) // BLOCK
            return jnp.zeros((nblocks, BLOCK), jnp.int8)

        def zs(p):
            return jnp.zeros((_pad_len(p.size) // BLOCK,), jnp.float32)

        return Adam8bitState(
            count=jnp.zeros((), jnp.int32),
            m_q=jax.tree.map(zq, params), m_s=jax.tree.map(zs, params),
            v_q=jax.tree.map(zq, params), v_s=jax.tree.map(zs, params),
        )

    def update_fn(grads, state, params):
        count = state.count + 1
        lr = (learning_rate(count) if callable(learning_rate)
              else learning_rate)
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        def upd(g, mq, ms, vq, vs, p):
            g = g.astype(jnp.float32)
            m = dequantize_blockwise(mq, ms, g.shape)
            # Second moment is stored as sqrt(v): int8's 127 levels cover v's
            # squared dynamic range far too coarsely — small-v coordinates
            # would quantize to 0 and blow up as m/eps.
            sv = dequantize_blockwise(vq, vs, g.shape)
            v = b2 * jnp.square(sv) + (1 - b2) * jnp.square(g)
            m = b1 * m + (1 - b1) * g
            sv_new = jnp.sqrt(v)
            denom = sv_new / jnp.sqrt(bc2) + eps
            step = m / bc1 / denom
            # Coordinates whose sqrt(v) still quantizes to zero are
            # unresolvable this step: skip them rather than divide by ~eps.
            vq2, vs2 = quantize_blockwise(sv_new)
            resolvable = dequantize_blockwise(vq2, vs2, g.shape) > 0
            step = jnp.where(resolvable, step, 0.0)
            if weight_decay:
                step = step + weight_decay * p.astype(jnp.float32)
            mq2, ms2 = quantize_blockwise(m)
            # Updates stay f32: for bf16 param storage the per-step update is
            # sub-ulp and a cast here would flush it before the stochastic-
            # rounding apply in the trainer ever sees it.
            return -lr * step, mq2, ms2, vq2, vs2

        out = jax.tree.map(upd, grads, state.m_q, state.m_s, state.v_q,
                           state.v_s, params)
        # Unzip the per-leaf tuples.
        treedef = jax.tree.structure(grads)
        leaves = treedef.flatten_up_to(out)
        updates = treedef.unflatten([l[0] for l in leaves])
        new_state = Adam8bitState(
            count=count,
            m_q=treedef.unflatten([l[1] for l in leaves]),
            m_s=treedef.unflatten([l[2] for l in leaves]),
            v_q=treedef.unflatten([l[3] for l in leaves]),
            v_s=treedef.unflatten([l[4] for l in leaves]),
        )
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)
