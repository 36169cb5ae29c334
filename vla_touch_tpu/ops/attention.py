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


# Largest f32 score tile XLA still keeps fused in VMEM (QK^T -> softmax ->
# PV without HBM materialization).  Measured on v5e at the RDT-1B serving
# shape (Lq=67, Lkv=4374, H=32, D=64): the B=1 tile (37.5 MB) fuses
# (0.58 ms/op); the B=4 tile (150 MB) spills and costs 1.96 ms/op, while
# chunking B=4 into 2 head groups (75 MB tiles, still fused) restores it
# (0.80 ms/op, 2.46x; 4 groups measured 0.83 ms).  See ROUND_NOTES
# "B>1 serving analysis".
_SCORE_TILE_BYTES = 80 * 1024 * 1024


def _head_groups(B: int, H: int, Lq: int, Lkv: int) -> int:
    """Smallest divisor of H whose per-group f32 score tile fits the
    measured fusion budget.

    Applies only in the serving regime (B <= 8, where the win was
    measured); large-batch training keeps XLA's own scheduling — the
    chunked program (and its transpose in backward) is an unmeasured
    change there."""
    if B > 8:
        return 1
    tile = B * H * Lq * Lkv * 4
    need = max(1, -(-tile // _SCORE_TILE_BYTES))
    g = min(need, H)
    while H % g:
        g += 1
    return g


def _attention_xla_dense(q, k, v, kv_mask=None, scale=None):
    B, Lq, H, D = q.shape
    scale = D ** -0.5 if scale is None else scale
    qf = q.astype(jnp.float32) * scale
    scores = jnp.einsum("bqhd,bkhd->bhqk", qf, k.astype(jnp.float32))
    if kv_mask is not None:
        scores = jnp.where(kv_mask[:, None, None, :], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


def _attention_xla(q, k, v, kv_mask=None, scale=None, head_groups=None):
    """Einsum attention, head-chunked when the f32 score tile would spill.

    ``head_groups``: explicit group count for tests; None = auto policy.
    Groups run sequentially under ``lax.map`` so each group's score tile
    stays within the fusion budget — this is what makes B>1 serving scale
    (measured model-level: B=4 denoise 131.9 -> 82.9 ms, full chunk
    145.8 -> 97.2 ms = 41 chunks/s).
    """
    B, Lq, H, D = q.shape
    Lkv = k.shape[1]
    g = _head_groups(B, H, Lq, Lkv) if head_groups is None else head_groups
    if g <= 1:
        return _attention_xla_dense(q, k, v, kv_mask=kv_mask, scale=scale)

    hg = H // g
    qg = q.reshape(B, Lq, g, hg, D).transpose(2, 0, 1, 3, 4)
    kg = k.reshape(B, Lkv, g, hg, D).transpose(2, 0, 1, 3, 4)
    vg = v.reshape(B, Lkv, g, hg, D).transpose(2, 0, 1, 3, 4)

    def one(args):
        qq, kk, vv = args
        return _attention_xla_dense(qq, kk, vv, kv_mask=kv_mask, scale=scale)

    out = jax.lax.map(one, (qg, kg, vg))       # (g, B, Lq, H/g, D)
    return out.transpose(1, 2, 0, 3, 4).reshape(B, Lq, H, D)


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
