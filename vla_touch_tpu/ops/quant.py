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
