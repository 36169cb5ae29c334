"""Scaled-dot-product attention for TPU.

Replaces the reference's ``F.scaled_dot_product_attention`` /
``timm.Attention`` fused kernels (``/root/reference/VLA/models/rdt/blocks.py:
92,116-123``).  Two paths share one signature:

- ``_attention_xla``: plain einsum formulation; XLA fuses this well at the
  RDT sequence sizes (Q = horizon+3 ≈ 35–67 tokens; KV up to 4374 image
  tokens), keeping the whole (Q·KV) score tile in VMEM.
- ``_attention_pallas``: a fused Pallas flash-style kernel for the
  long-KV cross-attention case (enabled for large KV on TPU backends).

Layout convention: (B, L, H, D) for q/k/v — batch, length, heads, head_dim.
``kv_mask``: optional (B, L_kv) boolean, True = valid key/value token.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Lazy import so CPU test runs don't require Mosaic.
_NEG_INF = -1e30


def _attention_xla(q, k, v, kv_mask=None, scale=None):
    B, Lq, H, D = q.shape
    scale = D ** -0.5 if scale is None else scale
    qf = q.astype(jnp.float32) * scale
    scores = jnp.einsum("bqhd,bkhd->bhqk", qf, k.astype(jnp.float32))
    if kv_mask is not None:
        scores = jnp.where(kv_mask[:, None, None, :], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


def dot_product_attention(q, k, v, kv_mask=None, scale=None, use_pallas="auto"):
    """Fused attention dispatch.

    ``use_pallas``: "auto" picks the Pallas kernel on TPU when the KV length
    is large enough to pay off; True/False force a path.
    """
    if use_pallas == "auto":
        # Measured on v5e at both RDT shapes: 170m config (Lq=67, Lkv=4374,
        # H=16, D=72) XLA 1.09 ms vs Pallas 1.51 ms incl. dispatch; RDT-1B
        # config (H=32, D=64, in-jit chained) XLA 306 us vs Pallas 428 us.
        # The einsum path fuses well under XLA at this short-query/long-KV
        # class, so "auto" = XLA until the kernel wins at a shape we care
        # about.
        #
        # RETENTION DECISION (round 3): the Pallas kernel is kept as
        # measured-negative INFRASTRUCTURE, not as a production path.  Three
        # variants were benchmarked and all lose at the serving shapes
        # (bf16 tiled: above; int8-KV padded D->128: reads as many bytes as
        # bf16; int8-KV transposed: lane-axis contraction forces VREG
        # transposes, 266 ms).  It stays because (a) it is the template the
        # WINNING w4a8 nibble-streaming matmul kernel was built from, and
        # (b) self-attention over long sequences (planning-LLM prefill)
        # is the shape class where flash kernels do win; revisit there.
        use_pallas = False
    if use_pallas:
        from vla_touch_tpu.ops.pallas_attention import flash_cross_attention

        return flash_cross_attention(q, k, v, kv_mask=kv_mask, scale=scale)
    return _attention_xla(q, k, v, kv_mask=kv_mask, scale=scale)
