"""Fused flash-attention Pallas kernel for TPU.

Targets the RDT cross-attention shape class (small query block: horizon+3 ≈
35–67 tokens; long KV: up to 4374 SigLIP image tokens or 1024 language tokens
— see ``/root/reference/VLA/models/rdt/blocks.py:116-123`` for the torch
flash path this replaces).  The whole query block fits one VMEM tile, so the
kernel is a single-pass online-softmax over KV chunks:

    grid = (B*H, num_kv_blocks)   — KV is the innermost (sequential) axis,
    scratch (m, l, acc) carries the running max / normalizer / weighted sum
    across KV blocks and is finalized on the last block.

Inputs are (B, L, H, D); the wrapper reshapes to (B*H, L, D) so the trailing
two block dims are (length, head_dim), padded to (8k, 128k) hardware tiles.
Padded KV positions are masked via the combined validity mask; padded D
columns contribute zeros.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, scale: float, num_kv_blocks: int):
    kv_idx = pl.program_id(1)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # Keep the MXU inputs in their storage dtype (bf16): f32 MXU issue rate
    # is 8x lower and the f32 accumulation comes free via
    # preferred_element_type.  The scale folds into q pre-matmul.
    q = q_ref[0]                                # (Lq, D) bf16
    k = k_ref[0]                                # (BK, D) bf16
    v = v_ref[0]                                # (BK, D) bf16
    valid = mask_ref[0, 0:1, :]                 # (1, BK) int32

    s = jax.lax.dot_general(
        (q.astype(jnp.float32) * scale).astype(q.dtype), k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Lq, BK) f32
    s = jnp.where(valid > 0, s, _NEG_INF)

    m_prev = m_scr[:, 0:1]                      # (Lq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # (Lq, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                      # (Lq, BK)
    # Zero fully-masked columns (exp(-1e30 - m) underflows to 0 already
    # unless the whole row is masked; the explicit where guards that case).
    p = jnp.where(valid > 0, p, 0.0)
    alpha = jnp.exp(m_prev - m_new)             # (Lq, 1)

    l_new = alpha * l_scr[:, 0:1] + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = alpha * acc_scr[:] + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    m_scr[:, 0:1] = m_new
    l_scr[:, 0:1] = l_new
    acc_scr[:] = acc_new

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[:, 0:1], 1e-30)
        o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_kv"))
def flash_cross_attention(q, k, v, kv_mask=None, scale=None, block_kv: int = 512):
    """Flash attention: q (B, Lq, H, D), k/v (B, Lkv, H, D) -> (B, Lq, H, D).

    ``kv_mask``: optional (B, Lkv) bool, True = valid. Handles ragged language
    conditions (``blocks.py:112-128``).
    """
    B, Lq, H, D = q.shape
    Lkv = k.shape[1]
    if scale is None:
        scale = D ** -0.5

    lq_pad = _round_up(max(Lq, 8), 8)
    d_pad = _round_up(D, 128)
    kv_pad = _round_up(Lkv, block_kv)

    def to_bhld(x, l_target):
        x = jnp.pad(x, ((0, 0), (0, l_target - x.shape[1]), (0, 0),
                        (0, d_pad - D)))
        x = jnp.swapaxes(x, 1, 2)               # (B, H, L, D)
        return x.reshape(B * H, l_target, d_pad)

    qp = to_bhld(q, lq_pad)
    kp = to_bhld(k, kv_pad)
    vp = to_bhld(v, kv_pad)

    if kv_mask is None:
        valid = (jnp.arange(kv_pad) < Lkv)[None, :]
        valid = jnp.broadcast_to(valid, (B, kv_pad))
    else:
        valid = jnp.pad(kv_mask.astype(bool), ((0, 0), (0, kv_pad - Lkv)))
    # Replicate to 8 sublane rows so the block shape is tile-aligned.
    valid = jnp.broadcast_to(valid.astype(jnp.int32)[:, None, :], (B, 8, kv_pad))

    num_kv_blocks = kv_pad // block_kv
    grid = (B * H, num_kv_blocks)

    kernel = functools.partial(
        _flash_kernel, scale=float(scale), num_kv_blocks=num_kv_blocks
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, lq_pad, d_pad), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d_pad), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d_pad), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_kv), lambda bh, i: (bh // H, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lq_pad, d_pad), lambda bh, i: (bh, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, lq_pad, d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((lq_pad, 128), jnp.float32),   # running max
            pltpu.VMEM((lq_pad, 128), jnp.float32),   # running normalizer
            pltpu.VMEM((lq_pad, d_pad), jnp.float32),  # weighted accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            # batch*heads is parallel; only the KV axis carries the running
            # softmax state and must stay sequential.
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(qp, kp, vp, valid)

    out = out.reshape(B, H, lq_pad, d_pad)[:, :, :Lq, :D]
    return jnp.swapaxes(out, 1, 2)
