"""Int8 weight quantization for the serving path.

The B=1 action-chunk denoise loop is weight-streaming bound on TPU (every
step reads all transformer weights from HBM); int8 storage halves the
traffic and v5e's MXU multiplies int8×int8→int32 natively.  Scheme:

- weights: per-output-channel symmetric int8
  (``w_i8 = round(w · 127 / max|w|_col)``);
- activations: dynamic per-token symmetric int8 at the matmul input;
- accumulation in int32, dequantized with the product of the two scales.

This is a serving-only transform (training stays bf16/f32 master weights);
:func:`quantize_linear` converts a flax Dense param dict, :func:`qdense`
applies it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_linear(p: dict) -> dict:
    """{'kernel' (in, out), 'bias'?} -> {'w_i8', 'scale' (out,), 'bias'?}."""
    w = jnp.asarray(p["kernel"], jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8)   # (out,)
    w_i8 = jnp.clip(jnp.round(w * (127.0 / amax)), -127, 127).astype(jnp.int8)
    out = {"w_i8": w_i8, "scale": (amax / 127.0).astype(jnp.float32)}
    if "bias" in p:
        out["bias"] = jnp.asarray(p["bias"], jnp.float32)
    return out


def qdense(x, qp: dict, out_dtype=jnp.bfloat16):
    """x (..., in) float -> (..., out) via int8×int8 matmul.

    Dynamic per-token activation quantization (amax over the feature axis).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8)
    x_i8 = jnp.clip(jnp.round(xf * (127.0 / amax)), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_i8, qp["w_i8"],
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * (amax / 127.0) * qp["scale"]
    if "bias" in qp:
        y = y + qp["bias"]
    return y.astype(out_dtype)


# ---- int4 (w4) grouped weight quantization ---------------------------------
#
# The serving denoise loop is weight-streaming bound even at int8 (the int8
# chunk sits ~1.7 ms/step above the streaming bound); int4 storage halves the
# weight bytes again.  Per-channel int4 is too coarse for the chunk-parity
# gate, so weights are quantized per (input-group, output-channel) with
# ``group_size`` contiguous input rows sharing one f32 scale — the standard
# group-wise w4 scheme (GPTQ/AWQ storage layout, re-derived for TPU: groups
# are PLANE-packed, two nibbles per byte, low-nibble plane = first half of
# the input rows, so unpacking is two arithmetic shifts and no sublane
# interleave).


def pick_group_size(K: int, requested: int = 128) -> int:
    """Smallest divisor of K that is ≥ requested, a multiple of 32 (aligned
    sublane slicing in the Pallas kernel) and leaves an even group count
    (plane packing needs the K/2 split on a group boundary).  E.g. K=1152 →
    192 (G=6); K∈{256, 2304, 4096, 4608} → 128."""
    cands = [d for d in range(32, K + 1, 32)
             if K % d == 0 and (K // d) % 2 == 0]
    if not cands:
        raise ValueError(f"no valid int4 group size for K={K}")
    at_least = [d for d in cands if d >= requested]
    return min(at_least) if at_least else max(cands)


def quantize_linear_w4(p: dict, group_size: int = 128,
                       clip_search: bool = True) -> dict:
    """{'kernel' (K, out), 'bias'?} -> {'w4_pack' (K//2, out) int8,
    'scale4' (G, out) f32, 'bias'?}  with G = K // group_size (group size
    auto-adjusted per :func:`pick_group_size`).

    Nibble range is symmetric [-7, 7] (the -8 code is unused).

    ``clip_search`` picks the per-group scale by MSE search instead of
    abs-max: abs-max wastes range on the single largest element (for a
    Gaussian group of 128 the expected max is ~3.3σ, putting the RMS
    rounding error at ~0.137σ); clipping at the MSE-optimal ~0.8·amax
    trades a little saturation error for a finer step (~0.11σ — a ~22%
    error cut, measured in tests/test_quant.py).  Search is over 8 static
    clip fractions, vectorized over all (group, channel) cells; runs once
    at quantize time, so the cost is irrelevant to serving.
    """
    w = jnp.asarray(p["kernel"], jnp.float32)
    K, N = w.shape
    group_size = pick_group_size(K, group_size)
    G = K // group_size
    wg = w.reshape(G, group_size, N)
    amax = jnp.maximum(jnp.max(jnp.abs(wg), axis=1), 1e-8)        # (G, N)
    if clip_search:
        best_err = None
        best_c = jnp.ones_like(amax)
        for c in (0.70, 0.75, 0.80, 0.85, 0.90, 0.95, 1.00):
            s = amax * (c / 7.0)
            q = jnp.clip(jnp.round(wg / s[:, None]), -7, 7)
            err = jnp.sum(jnp.square(wg - q * s[:, None]), axis=1)  # (G, N)
            if best_err is None:
                best_err, best_c = err, jnp.full_like(amax, c)
            else:
                take = err < best_err
                best_err = jnp.where(take, err, best_err)
                best_c = jnp.where(take, c, best_c)
        amax = amax * best_c
    w_i4 = jnp.clip(jnp.round(wg * (7.0 / amax[:, None])), -7, 7)
    w_i4 = w_i4.astype(jnp.int8).reshape(K, N)
    lo, hi = w_i4[: K // 2], w_i4[K // 2:]
    pack = jnp.bitwise_or(jnp.bitwise_and(lo, 0xF).astype(jnp.uint8),
                          (hi.astype(jnp.uint8) << 4)).astype(jnp.int8)
    # group_size is NOT stored: it is recoverable as K // scale4.shape[0]
    # (an int leaf would become a traced array under jit).
    out = {"w4_pack": pack, "scale4": (amax / 7.0).astype(jnp.float32)}
    if "bias" in p:
        out["bias"] = jnp.asarray(p["bias"], jnp.float32)
    return out


def unpack_w4(pack, K: int):
    """(K//2, N) plane-packed int8 -> (K, N) int8 in [-7, 7]."""
    lo = jnp.right_shift(jnp.left_shift(pack, 4), 4)   # arithmetic: sign-ext
    hi = jnp.right_shift(pack, 4)
    return jnp.concatenate([lo, hi], axis=0)


def qdense_w4(x, qp: dict, out_dtype=jnp.bfloat16):
    """x (..., K) float -> (..., out): dynamic per-token int8 activations ×
    group-wise int4 weights, int32 accumulation PER GROUP (the per-group
    scale must be applied before the cross-group sum).

    XLA path: one batched ``dot_general`` over the group axis; the (G, M, N)
    intermediate is tiny at serving M.  Large-M calls (the compute-bound
    condition precompute, where that intermediate would be hundreds of MB)
    dequantize the weight once to bf16 (a few MB) and run a plain matmul
    instead — strictly better numerics there (no activation quant).  The
    Pallas twin (:func:`vla_touch_tpu.ops.pallas_matmul.qdense_pallas_w4`)
    unpacks the nibbles in-kernel so streamed HBM weight reads are truly
    0.5 byte/param.
    """
    *lead, K = x.shape
    G = qp["scale4"].shape[0]
    gs = K // G
    M = 1
    for d in lead:
        M *= d
    if M > 512:
        w = unpack_w4(qp["w4_pack"], K).astype(jnp.float32)
        w = (w.reshape(G, gs, -1) * qp["scale4"][:, None, :]).reshape(K, -1)
        y = jnp.dot(x.reshape(M, K).astype(jnp.bfloat16),
                    w.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        if "bias" in qp:
            y = y + qp["bias"]
        return y.astype(out_dtype).reshape(*lead, -1)
    xf = x.reshape(M, K).astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8)
    x_i8 = jnp.clip(jnp.round(xf * (127.0 / amax)), -127, 127).astype(jnp.int8)
    w_i8 = unpack_w4(qp["w4_pack"], K)                       # (K, N) int8
    xg = x_i8.reshape(M, G, gs).transpose(1, 0, 2)           # (G, M, gs)
    wg = w_i8.reshape(G, gs, -1)                             # (G, gs, N)
    y = jax.lax.dot_general(
        xg, wg, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32).astype(jnp.float32)  # (G, M, N)
    y = jnp.sum(y * qp["scale4"][:, None, :], axis=0)
    y = y * (amax / 127.0)
    if "bias" in qp:
        y = y + qp["bias"]
    return y.astype(out_dtype).reshape(*lead, -1)


def quantize_tree_w4(params, should_quantize=None, group_size: int = 128,
                     clip_search: bool = True, w4_select=None):
    """Like :func:`quantize_tree` but group-wise int4; leaves with no valid
    group size (see :func:`pick_group_size`) fall back to int8.

    ``w4_select(path, leaf) -> bool`` (optional) chooses int4 vs int8 PER
    LEAF among the leaves ``should_quantize`` admits — the mixed-precision
    serving recipe (int4 where the chunk tolerates it, int8 elsewhere).
    Default ``None`` = int4 everywhere admissible."""
    def rec(node, path):
        if is_linear(node) and (should_quantize is None
                                or should_quantize(path, node)):
            if w4_select is not None and not w4_select(path, node):
                return quantize_linear(node)
            try:
                return quantize_linear_w4(node, group_size,
                                          clip_search=clip_search)
            except ValueError:
                return quantize_linear(node)
        if isinstance(node, dict):
            return {k: rec(v, path + (k,)) for k, v in node.items()}
        return node

    return rec(params, ())


def qdense_any(x, qp: dict, out_dtype=jnp.bfloat16):
    """Dispatch on the quantized-leaf layout (int8 vs grouped int4)."""
    if "w4_pack" in qp:
        return qdense_w4(x, qp, out_dtype=out_dtype)
    return qdense(x, qp, out_dtype=out_dtype)


def is_linear(p) -> bool:
    return isinstance(p, dict) and "kernel" in p and getattr(
        p["kernel"], "ndim", 0) == 2


def quantize_tree(params, should_quantize=None):
    """Replace every 2-D Dense leaf dict with its quantized form.

    ``should_quantize(path_tuple, leaf_dict) -> bool`` filters (default:
    quantize everything 2-D).  Non-linear leaves pass through unchanged.
    """
    def rec(node, path):
        if is_linear(node) and (should_quantize is None
                                or should_quantize(path, node)):
            return quantize_linear(node)
        if isinstance(node, dict):
            return {k: rec(v, path + (k,)) for k, v in node.items()}
        return node

    return rec(params, ())
