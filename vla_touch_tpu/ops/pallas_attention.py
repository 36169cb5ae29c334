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


# ---- int8-KV flash attention ------------------------------------------------
#
# At B=1 serving the RDT cross-attention is HBM-bound on the cached KV
# reads (img condition: 28/2 blocks x 2 x 4374 x 2048 bf16 ≈ 0.5 GB per
# denoise step).  Storing the cache int8 halves those bytes.  The per-
# channel scales fold OUTSIDE the inner loop:
#
#   QK^T:  q · diag(sk) · k_i8^T  =  (q*sk) · k_i8^T   (fold into q once)
#   AV:    p · (v_i8*sv)          =  (p · v_i8) * sv   (fold into finalize)
#
# so the streamed tiles are pure int8, converted to bf16 in VMEM for the
# MXU (int8 values are exact in bf16; no extra quantization error beyond
# the int8 rounding itself).


def _flash_kernel_q8(q_ref, k_ref, v_ref, mask_ref, vs_ref, o_ref,
                     m_scr, l_scr, acc_scr, *, num_kv_blocks: int):
    kv_idx = pl.program_id(1)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                # (Lq, D) bf16, pre-scaled
    k = k_ref[0].astype(jnp.bfloat16)           # (BK, D) int8 -> bf16
    v = v_ref[0].astype(jnp.bfloat16)           # (BK, D) int8 -> bf16
    valid = mask_ref[0, 0:1, :]                 # (1, BK) int32

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = jnp.where(valid > 0, s, _NEG_INF)

    m_prev = m_scr[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.where(valid > 0, jnp.exp(s - m_new), 0.0)
    alpha = jnp.exp(m_prev - m_new)

    l_scr[:, 0:1] = alpha * l_scr[:, 0:1] + jnp.sum(p, axis=-1,
                                                    keepdims=True)
    acc_scr[:] = alpha * acc_scr[:] + jax.lax.dot_general(
        p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:, 0:1] = m_new

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[:, 0:1], 1e-30)
        # v per-channel dequant scale, folded once after the KV loop.
        o_ref[0] = (acc_scr[:] / denom * vs_ref[0, 0:1, :]).astype(
            o_ref.dtype)


def quantize_kv(k, v):
    """(B, L, H, D) bf16/f32 K and V -> int8 + per-(B, H, D) channel scales
    (amax over the KV-length axis)."""
    def q(x):
        xf = jnp.asarray(x, jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-8)
        xi = jnp.clip(jnp.round(xf * (127.0 / amax)), -127, 127)
        return xi.astype(jnp.int8), (amax[:, 0] / 127.0)   # (B, H, D)

    k_i8, sk = q(k)
    v_i8, sv = q(v)
    return k_i8, sk, v_i8, sv


@functools.partial(jax.jit,
                   static_argnames=("scale", "block_kv", "interpret"))
def flash_cross_attention_q8(q, k_i8, k_scale, v_i8, v_scale, kv_mask=None,
                             scale=None, block_kv: int = 512,
                             interpret: bool = False):
    """Flash attention over an int8-quantized KV cache.

    q (B, Lq, H, D) float; k_i8/v_i8 (B, Lkv, H, D) int8 with per-channel
    scales (B, H, D) from :func:`quantize_kv`.  Matches
    :func:`flash_cross_attention` on dequantized inputs up to int8 rounding.
    """
    B, Lq, H, D = q.shape
    Lkv = k_i8.shape[1]
    if scale is None:
        scale = D ** -0.5

    lq_pad = _round_up(max(Lq, 8), 8)
    d_pad = _round_up(D, 128)
    kv_pad = _round_up(Lkv, block_kv)

    # Fold the softmax scale AND K's dequant scale into q (f32, then bf16).
    qs = (q.astype(jnp.float32) * float(scale)
          * k_scale[:, None].astype(jnp.float32))       # (B, Lq, H, D)

    def to_bhld(x, l_target, pad_d=True):
        x = jnp.pad(x, ((0, 0), (0, l_target - x.shape[1]), (0, 0),
                        (0, (d_pad - D) if pad_d else 0)))
        x = jnp.swapaxes(x, 1, 2)
        return x.reshape(B * H, l_target, x.shape[-1])

    qp = to_bhld(qs.astype(jnp.bfloat16), lq_pad)
    kp = to_bhld(k_i8, kv_pad)
    vp = to_bhld(v_i8, kv_pad)
    vs = jnp.pad(v_scale.astype(jnp.float32),
                 ((0, 0), (0, 0), (0, d_pad - D))).reshape(B * H, 1, d_pad)
    # Tile-align the scale rows (8 sublanes).
    vs = jnp.broadcast_to(vs, (B * H, 8, d_pad))

    if kv_mask is None:
        valid = jnp.broadcast_to((jnp.arange(kv_pad) < Lkv)[None, :],
                                 (B, kv_pad))
    else:
        valid = jnp.pad(kv_mask.astype(bool), ((0, 0), (0, kv_pad - Lkv)))
    valid = jnp.broadcast_to(valid.astype(jnp.int32)[:, None, :],
                             (B, 8, kv_pad))

    num_kv_blocks = kv_pad // block_kv
    grid = (B * H, num_kv_blocks)

    out = pl.pallas_call(
        functools.partial(_flash_kernel_q8, num_kv_blocks=num_kv_blocks),
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
            pl.BlockSpec((1, 8, d_pad), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lq_pad, d_pad), lambda bh, i: (bh, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, lq_pad, d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((lq_pad, 128), jnp.float32),
            pltpu.VMEM((lq_pad, 128), jnp.float32),
            pltpu.VMEM((lq_pad, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, valid, vs)

    out = out.reshape(B, H, lq_pad, d_pad)[:, :, :Lq, :D]
    return jnp.swapaxes(out, 1, 2)


# ---- transposed-layout int8 KV (head_dim < 128) -----------------------------
#
# :func:`flash_cross_attention_q8` stores KV as (B*H, L, D) and must pad D
# to the 128-lane tile — at the RDT-1B head_dim of 64 the padded int8 reads
# cost as many HBM bytes as unpadded bf16, erasing the win (measured: the
# padded-q8 path is SLOWER end to end).  Storing KV TRANSPOSED as
# (B*H, D, L) puts D on the sublane axis (int8 tile (32, 128): D=64 is
# tile-exact) and the KV length on lanes, so the streamed bytes truly halve.
# In-kernel:
#     s   = q[:, :D] . k(D, BK)          (contract D, no padding read)
#     acc = v(D, BK) . p(Lq, BK)^T       (dot_general on the lane axis;
#                                         accumulator kept transposed (D, Lq))
# and the output de-transposes once outside (67x2048 — negligible).


def quantize_kv_t(k, v):
    """(B, L, H, D) -> transposed int8 cache (B*H... kept (B, H, D, L)) +
    per-(B, H, D) scales."""
    def q(x):
        xf = jnp.asarray(x, jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-8)
        xi = jnp.clip(jnp.round(xf * (127.0 / amax)), -127, 127)
        # (B, L, H, D) -> (B, H, D, L)
        return (jnp.transpose(xi.astype(jnp.int8), (0, 2, 3, 1)),
                amax[:, 0] / 127.0)

    k_t, sk = q(k)
    v_t, sv = q(v)
    return k_t, sk, v_t, sv


def _flash_kernel_q8t(q_ref, k_ref, v_ref, mask_ref, vs_ref, o_ref,
                      m_scr, l_scr, acc_scr, *, num_kv_blocks: int,
                      head_dim: int):
    kv_idx = pl.program_id(1)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0][:, :head_dim]                  # (Lq, D) bf16, pre-scaled
    k = k_ref[0].astype(jnp.bfloat16)           # (D, BK)
    v = v_ref[0].astype(jnp.bfloat16)           # (D, BK)
    valid = mask_ref[0, 0:1, :]                 # (1, BK)

    s = jax.lax.dot_general(q, k, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (Lq, BK)
    s = jnp.where(valid > 0, s, _NEG_INF)

    m_prev = m_scr[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.where(valid > 0, jnp.exp(s - m_new), 0.0)
    alpha = jnp.exp(m_prev - m_new)

    l_scr[:, 0:1] = alpha * l_scr[:, 0:1] + jnp.sum(p, axis=-1,
                                                    keepdims=True)
    # acc kept transposed: (D, Lq) += v (D, BK) . p^T (BK, Lq)
    acc_scr[:] = (alpha[:, 0][None, :] * acc_scr[:] + jax.lax.dot_general(
        v, p.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32))
    m_scr[:, 0:1] = m_new

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[:, 0:1], 1e-30)      # (Lq, 1)
        o_ref[0] = (acc_scr[:] * vs_ref[0][:, 0:1]
                    / denom[:, 0][None, :]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("scale", "block_kv", "interpret"))
def flash_cross_attention_q8t(q, k_t, k_scale, v_t, v_scale, kv_mask=None,
                              scale=None, block_kv: int = 512,
                              interpret: bool = False):
    """Flash attention over a TRANSPOSED int8 KV cache from
    :func:`quantize_kv_t` (k_t/v_t: (B, H, D, Lkv) int8, scales (B, H, D)).

    Requires head_dim % 32 == 0 (int8 sublane tile); RDT-1B's 64 qualifies.
    """
    B, Lq, H, D = q.shape
    Lkv = k_t.shape[3]
    assert D % 32 == 0, D
    if scale is None:
        scale = D ** -0.5

    lq_pad = _round_up(max(Lq, 8), 128)         # lanes of the acc/output
    d_pad = _round_up(D, 128)                   # lanes of the q input
    kv_pad = _round_up(Lkv, block_kv)

    qs = (q.astype(jnp.float32) * float(scale)
          * k_scale[:, None].astype(jnp.float32))
    qp = jnp.pad(qs.astype(jnp.bfloat16),
                 ((0, 0), (0, lq_pad - Lq), (0, 0), (0, d_pad - D)))
    qp = jnp.swapaxes(qp, 1, 2).reshape(B * H, lq_pad, d_pad)

    def kv_blocks(x):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, kv_pad - Lkv)))
        return x.reshape(B * H, D, kv_pad)

    kp, vp = kv_blocks(k_t), kv_blocks(v_t)
    vs = v_scale.astype(jnp.float32).reshape(B * H, D, 1)
    vs = jnp.pad(vs, ((0, 0), (0, 0), (0, 127)))   # lane-tile align

    if kv_mask is None:
        valid = jnp.broadcast_to((jnp.arange(kv_pad) < Lkv)[None, :],
                                 (B, kv_pad))
    else:
        valid = jnp.pad(kv_mask.astype(bool), ((0, 0), (0, kv_pad - Lkv)))
    valid = jnp.broadcast_to(valid.astype(jnp.int32)[:, None, :],
                             (B, 8, kv_pad))

    num_kv_blocks = kv_pad // block_kv
    grid = (B * H, num_kv_blocks)

    out = pl.pallas_call(
        functools.partial(_flash_kernel_q8t, num_kv_blocks=num_kv_blocks,
                          head_dim=D),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, lq_pad, d_pad), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, block_kv), lambda bh, i: (bh, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, block_kv), lambda bh, i: (bh, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_kv), lambda bh, i: (bh // H, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, 128), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, D, lq_pad), lambda bh, i: (bh, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, D, lq_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((lq_pad, 128), jnp.float32),
            pltpu.VMEM((lq_pad, 128), jnp.float32),
            pltpu.VMEM((D, lq_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, valid, vs)

    # (B*H, D, Lq) -> (B, Lq, H, D)
    out = out.reshape(B, H, D, lq_pad)[:, :, :, :Lq]
    return jnp.transpose(out, (0, 3, 1, 2))
