"""Pallas int8 weight-streaming matmul (w8a16) for the B=1 serving path.

The RDT denoise loop at batch 1 is weight-streaming bound: every step reads
~1 GB of transformer weights from HBM while the MXU sits mostly idle
(ROUND_NOTES: 3.6 ms/step vs the 2.9 ms bf16 streaming bound).  Int8 weight
storage halves the bytes, but XLA's int8 lowering did not realize the win
(it re-materializes dequantized tiles / adds activation-quant overhead).

This kernel guarantees the streaming contract: HBM weight reads are int8
bytes only, dequantized in VMEM on the VPU and fed to the bf16 MXU tile by
tile, with the (small, padded-M) activation resident across the whole grid.

Scheme (per output tile):
    y[:, j] = (x_bf16 @ w_i8[:, j].astype(bf16)) * scale[j] + bias[j]
i.e. weight-only quantization — activations stay bf16, so there is no
activation-quant error; accumulation is f32 on the MXU.

Replaces the role of torch's cuBLAS GEMMs in the reference hot loop
(``/root/reference/VLA/models/rdt/blocks.py:92,116-123``; the reference has
no quantized path at all — this is a TPU-serving addition).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _xla_int8_fallback(x, w_i8, scale, bias, out_dtype):
    from vla_touch_tpu.ops.quant import qdense

    qp = {"w_i8": w_i8, "scale": scale}
    if bias is not None:
        qp["bias"] = bias
    return qdense(x, qp, out_dtype=out_dtype)


def _xla_w4_fallback(x, w4_pack, scale4, bias, out_dtype):
    from vla_touch_tpu.ops.quant import qdense_w4

    qp = {"w4_pack": w4_pack, "scale4": scale4}
    if bias is not None:
        qp["bias"] = bias
    return qdense_w4(x, qp, out_dtype=out_dtype)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _w8a16_kernel(x_ref, w_ref, s_ref, b_ref, o_ref):
    # x_ref: (bm, K) bf16 — resident; w_ref: (K, bn) int8 — streamed;
    # s_ref/b_ref: (1, bn) f32 per-output-channel scale / bias.
    w = w_ref[...].astype(jnp.bfloat16)  # int8 values are exact in bf16
    acc = jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)
    o_ref[...] = (acc * s_ref[...] + b_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "block_m",
                                             "out_dtype"))
def w8a16_matmul(x, w_i8, scale, bias=None, *, block_n: int = 512,
                 block_m: int = 256, out_dtype=jnp.bfloat16):
    """``x (..., K) × w_i8 (K, N) → (..., N)`` with int8-streamed weights.

    ``scale`` (N,) f32: per-output-channel dequant scale (w ≈ w_i8 * scale).
    ``bias`` (N,) f32 optional.  K and N must be multiples of 128 (they are,
    for every RDT matmul: hidden 1152, mlp 4608, qkv 3456).
    """
    *lead, K = x.shape
    N = w_i8.shape[1]
    assert w_i8.shape[0] == K, (x.shape, w_i8.shape)
    assert K % 128 == 0 and N % 128 == 0, (K, N)

    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K).astype(jnp.bfloat16)
    Mp = _round_up(max(M, 8), 128)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))

    bm = min(block_m, Mp)
    bn = min(block_n, N)
    grid = (Mp // bm, _cdiv(N, bn))

    s2 = scale.reshape(1, N).astype(jnp.float32)
    b2 = (bias.reshape(1, N).astype(jnp.float32) if bias is not None
          else jnp.zeros((1, N), jnp.float32))

    out = pl.pallas_call(
        _w8a16_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K * 2 + K * N + Mp * N * 2,
            transcendentals=0,
        ),
    )(x2, w_i8, s2, b2)

    return out[:M].reshape(*lead, N)


def qdense_pallas(x, qp: dict, out_dtype=jnp.bfloat16):
    """Drop-in twin of :func:`vla_touch_tpu.ops.quant.qdense` backed by the
    Pallas streaming kernel (w8a16 instead of a8w8 — strictly lower error)."""
    return w8a16_matmul(x, qp["w_i8"], qp["scale"], qp.get("bias"),
                        out_dtype=out_dtype)


# ---- fused a8w8: in-kernel activation quant + int8 MXU + dequant -----------


def _a8w8_kernel(x_ref, w_ref, s_ref, b_ref, o_ref, xi_scr, rs_scr):
    # x_ref: (Mp, K) bf16 resident; w_ref: (K, bn) int8 streamed;
    # s_ref/b_ref: (1, bn) f32.  Scratch: xi (Mp, K) int8, rs (Mp, 128) f32.
    @pl.when(pl.program_id(0) == 0)
    def _quantize_x():
        xf = x_ref[...].astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-8)
        rs_scr[...] = jnp.broadcast_to(amax * (1.0 / 127.0), rs_scr.shape)
        xi_scr[...] = jnp.clip(jnp.round(xf * (127.0 / amax)),
                               -127, 127).astype(jnp.int8)

    acc = jnp.dot(xi_scr[...], w_ref[...], preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * rs_scr[:, 0:1] * s_ref[...] + b_ref[...]
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "out_dtype",
                                             "interpret"))
def a8w8_matmul(x, w_i8, scale, bias=None, *, block_n: int = 1152,
                out_dtype=jnp.bfloat16, interpret: bool = False):
    """Fused dynamic-int8 matmul: quantize activations per-token in-kernel,
    multiply int8 x int8 -> int32 on the MXU, dequantize on the way out.

    One kernel replaces XLA's abs-reduce + clamp/convert + int8-dot +
    rescale op chain (measured ~450 us/denoise-step of separate quant ops in
    the RDT serving path).  Weights stream as int8 — half the HBM bytes of
    the bf16 path.  Numerics identical to :func:`ops.quant.qdense`.
    """
    *lead, K = x.shape
    N = w_i8.shape[1]
    assert w_i8.shape[0] == K, (x.shape, w_i8.shape)
    if K % 128 or N % 128:
        # kernel-unfriendly dims (tiny-config adaptors): XLA int8 path
        return _xla_int8_fallback(x, w_i8, scale, bias, out_dtype)

    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K).astype(jnp.bfloat16)
    Mp = _round_up(max(M, 8), 32)          # int8 scratch needs 32-sublanes
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))

    # VMEM budget (v5e ~16 MiB): resident bf16 activation (Mp*K*2) + int8
    # scratch (Mp*K) + two double-buffered int8 weight blocks (2*K*bn) must
    # fit with headroom for the f32 accumulator/output tiles.
    budget = 12 * 1024 * 1024 - Mp * K * 3
    bn_cap = budget // (2 * K)
    if bn_cap < 128:
        # resident activation alone blows VMEM at this (M, K) — this
        # kernel targets the small-M serving regime; use XLA's int8 path.
        return _xla_int8_fallback(x, w_i8, scale, bias, out_dtype)
    bn = min(block_n, N, max(128, (bn_cap // 128) * 128))
    grid = (_cdiv(N, bn),)
    s2 = scale.reshape(1, N).astype(jnp.float32)
    b2 = (bias.reshape(1, N).astype(jnp.float32) if bias is not None
          else jnp.zeros((1, N), jnp.float32))

    out = pl.pallas_call(
        _a8w8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Mp, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, bn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((Mp, K), jnp.int8),
            pltpu.VMEM((Mp, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K * 2 + K * N + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, w_i8, s2, b2)

    return out[:M].reshape(*lead, N)


# ---- large-M tiled a8w8: the compute-bound int8 matmul ----------------------
#
# The serving path's FIXED cost is dominated by the 14 image-condition KV
# projections — (4374, 2048) x (2048, 4096) — which run at ~95% of the bf16
# MXU rate under XLA, so the only remaining 2x is the int8 MXU rate (v5e:
# 394 TOPS int8 vs 197 TFLOPS bf16), which XLA's int8 emitter does not reach
# at these shapes (measured 0.39 ms int8 == bf16).  This kernel is a plain
# tiled int8 matmul (per-token dynamic activation scales computed outside,
# per-channel weight scales) aiming for the native int8 rate.


def _i8mm_kernel(x_ref, w_ref, sx_ref, sw_ref, b_ref, o_ref):
    # x_ref (bm, K) int8; w_ref (K, bn) int8; sx_ref (bm, 1) f32 per-token;
    # sw_ref/b_ref (1, bn) f32.
    acc = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.int32)
    o_ref[...] = (acc.astype(jnp.float32) * sx_ref[...] * sw_ref[...]
                  + b_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                             "out_dtype", "interpret"))
def a8w8_matmul_large(x, w_i8, scale, bias=None, *, block_m: int = 512,
                      block_n: int = 512, out_dtype=jnp.bfloat16,
                      interpret: bool = False):
    """``x (..., K) x w_i8 (K, N) -> (..., N)`` for the compute-bound
    large-M regime (the resident-activation kernels above target small M).
    Numerics identical to :func:`vla_touch_tpu.ops.quant.qdense`."""
    *lead, K = x.shape
    N = w_i8.shape[1]
    assert w_i8.shape[0] == K, (x.shape, w_i8.shape)
    if K % 128 or N % block_n:
        # kernel-unfriendly dims: degrade to the XLA int8 path like the
        # sibling kernels instead of crashing the dispatch
        return _xla_int8_fallback(x, w_i8, scale, bias, out_dtype)

    M = 1
    for d in lead:
        M *= d
    xf = x.reshape(M, K).astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8)
    x_i8 = jnp.clip(jnp.round(xf * (127.0 / amax)), -127, 127).astype(jnp.int8)
    sx = (amax * (1.0 / 127.0)).astype(jnp.float32)            # (M, 1)
    Mp = _round_up(max(M, 8), block_m)
    if Mp != M:
        x_i8 = jnp.pad(x_i8, ((0, Mp - M), (0, 0)))
        sx = jnp.pad(sx, ((0, Mp - M), (0, 0)))

    bm, bn = block_m, block_n
    grid = (Mp // bm, N // bn)
    s2 = scale.reshape(1, N).astype(jnp.float32)
    b2 = (bias.reshape(1, N).astype(jnp.float32) if bias is not None
          else jnp.zeros((1, N), jnp.float32))

    out = pl.pallas_call(
        _i8mm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K + K * N + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_i8, w_i8, sx, s2, b2)

    return out[:M].reshape(*lead, N)


# ---- fused w4a8: in-kernel nibble unpack + grouped int8 MXU dots ------------
#
# Group-wise int4 weights (ops/quant.py::quantize_linear_w4 layout: planes of
# nibbles, low plane = first half of the input rows) streamed from HBM at
# 0.5 byte/param.  The unpack (two arithmetic shifts) happens in VMEM per
# weight block — this is the op XLA cannot fuse into a dot (its int4 support
# materializes the unpacked int8 tensor back to HBM), so Pallas is the only
# way the 2x-under-int8 streaming bound is reachable.  Accumulation is int32
# per input-group (the per-(group, out-channel) scale applies before the
# cross-group sum), f32 across groups.


def _w4a8_kernel(x_ref, wp_ref, s_ref, b_ref, o_ref, xi_scr, rs_scr,
                 *, G: int, gs: int):
    # x_ref (Mp, K) bf16 resident; wp_ref (K//2, bn) packed int8 streamed;
    # s_ref (G, bn) f32; b_ref (1, bn) f32.
    @pl.when(pl.program_id(0) == 0)
    def _quantize_x():
        xf = x_ref[...].astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-8)
        rs_scr[...] = jnp.broadcast_to(amax * (1.0 / 127.0), rs_scr.shape)
        xi_scr[...] = jnp.clip(jnp.round(xf * (127.0 / amax)),
                               -127, 127).astype(jnp.int8)

    Mp = x_ref.shape[0]
    bn = wp_ref.shape[1]
    half = G // 2
    if G <= 32:
        # Small group counts (the RDT serving shapes): unroll — Mosaic
        # pipelines the statically-known slices best.
        acc = jnp.zeros((Mp, bn), jnp.float32)
        for g in range(G):
            # low-nibble plane holds original rows [0, K/2), high the rest
            row = (g if g < half else g - half) * gs
            wp = wp_ref[pl.ds(row, gs), :].astype(jnp.int32)
            if g < half:
                w_g = jnp.right_shift(jnp.left_shift(wp, 28), 28)
            else:
                w_g = jnp.right_shift(wp, 4)
            part = jnp.dot(xi_scr[:, pl.ds(g * gs, gs)],
                           w_g.astype(jnp.int8),
                           preferred_element_type=jnp.int32)
            acc = acc + part.astype(jnp.float32) * s_ref[g, :][None, :]
    else:
        # Large group counts (LLM MLP projections: K 18944, G 148): a
        # rolled loop — full unrolling overflows the kernel's scoped-VMEM
        # stack (measured: 18.9 MB > the 16 MB limit at K=18944, bn=384).
        def body(g, acc):
            row = jax.lax.rem(g, half) * gs
            wp = wp_ref[pl.ds(row, gs), :].astype(jnp.int32)
            low = jnp.right_shift(jnp.left_shift(wp, 28), 28)
            high = jnp.right_shift(wp, 4)
            w_g = jnp.where(g < half, low, high)
            part = jnp.dot(xi_scr[:, pl.ds(g * gs, gs)],
                           w_g.astype(jnp.int8),
                           preferred_element_type=jnp.int32)
            return acc + part.astype(jnp.float32) * s_ref[pl.ds(g, 1), :]

        acc = jax.lax.fori_loop(0, G, body,
                                jnp.zeros((Mp, bn), jnp.float32))
    o_ref[...] = (acc * rs_scr[:, 0:1] + b_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "out_dtype",
                                             "interpret"))
def w4a8_matmul(x, w4_pack, scale4, bias=None, *, block_n: int = 512,
                out_dtype=jnp.bfloat16, interpret: bool = False):
    """``x (..., K) × int4-grouped w (K, N) → (..., N)``; weights stream
    packed (two nibbles per byte).  Numerics identical to
    :func:`vla_touch_tpu.ops.quant.qdense_w4`."""
    *lead, K = x.shape
    N = w4_pack.shape[1]
    G = scale4.shape[0]
    gs = K // G
    assert w4_pack.shape[0] * 2 == K and K % G == 0, (x.shape, w4_pack.shape)
    assert G % 2 == 0 and gs % 32 == 0 and N % 128 == 0, (G, gs, N)

    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K).astype(jnp.bfloat16)
    Mp = _round_up(max(M, 8), 32)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))

    budget = 12 * 1024 * 1024 - Mp * K * 3
    bn_cap = budget // K          # two double-buffered (K/2, bn) int8 blocks
    if bn_cap < 128:
        return _xla_w4_fallback(x, w4_pack, scale4, bias, out_dtype)
    bn = min(block_n, N, max(128, (bn_cap // 128) * 128))
    grid = (_cdiv(N, bn),)
    b2 = (bias.reshape(1, N).astype(jnp.float32) if bias is not None
          else jnp.zeros((1, N), jnp.float32))

    out = pl.pallas_call(
        functools.partial(_w4a8_kernel, G=G, gs=gs),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Mp, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K // 2, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, bn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((Mp, K), jnp.int8),
            pltpu.VMEM((Mp, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K * 2 + K * N // 2 + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, w4_pack, scale4.astype(jnp.float32), b2)

    return out[:M].reshape(*lead, N)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _w4a8_matmul_diff(out_dtype, interpret, x, w4_pack, scale4, bias):
    """w4a8_matmul with a differentiation rule: forward runs the Pallas
    kernel; backward is the vjp of the numerically-identical XLA
    expression (``qdense_w4``), so gradients through a w4-quantized base
    (the QLoRA training flow) match the unfused path exactly instead of
    hitting pallas_call's missing differentiation rule.  The quantized
    weight/scale leaves are frozen (zero cotangent)."""
    return w4a8_matmul(x, w4_pack, scale4, bias, out_dtype=out_dtype,
                       interpret=interpret)


def _w4a8_diff_fwd(out_dtype, interpret, x, w4_pack, scale4, bias):
    y = w4a8_matmul(x, w4_pack, scale4, bias, out_dtype=out_dtype,
                    interpret=interpret)
    return y, (x, w4_pack, scale4, bias)


def _w4a8_diff_bwd(out_dtype, interpret, res, g):
    import numpy as onp

    from vla_touch_tpu.ops.quant import qdense_w4

    x, w4_pack, scale4, bias = res

    def ref(xx, bb):
        qp = {"w4_pack": w4_pack, "scale4": scale4}
        if bb is not None:
            qp["bias"] = bb
        return qdense_w4(xx, qp, out_dtype=out_dtype)

    _, vjp = jax.vjp(ref, x, bias)
    dx, dbias = vjp(g)
    dw = onp.zeros(w4_pack.shape, dtype=jax.dtypes.float0)
    return dx, dw, jnp.zeros_like(scale4), dbias


_w4a8_matmul_diff.defvjp(_w4a8_diff_fwd, _w4a8_diff_bwd)


def _silu_mul(g, u):
    """The megakernels' silu placement: g/u in the activation dtype (the
    unfused chain's bf16 intermediates), the LOGISTIC in f32 — Mosaic
    cannot lower a bf16 logistic at the 7B tile shapes ('vector.broadcast'
    f32->bf16 verification error on v5e) — and the product cast back.
    Used by the kernels AND their fallback/differentiation references so
    the kernel == reference contract stays exact; one extra rounding vs
    XLA's bf16 ``jax.nn.silu``."""
    gf = g.astype(jnp.float32)
    return (gf * jax.nn.sigmoid(gf)).astype(g.dtype) * u


# ---- w4 SwiGLU-MLP megakernel: gateup + silu*mul + down in ONE launch -------
#
# The B=1 w4 decode is bounded by pallas_call launch overhead once the
# qkv/gateup concat fusion lands (ROUND_NOTES: ~0.5 byte/param streaming is
# already realized per-matmul; the residue is per-launch fixed cost).  This
# kernel runs the whole SwiGLU MLP — the two biggest weight streams of every
# decoder layer — as one launch: phase 1 streams the fused gate|up planes
# tile by tile, materializing silu(g)*u into a VMEM scratch; a barrier step
# quantizes the activation per token (identical semantics to the unfused
# qdense_w4 input quant); phase 2 streams the down planes consuming the int8
# scratch.  Besides the saved launch, the intermediate activation never
# round-trips HBM.


def _w4_group_dot_unrolled(xi_ref, wp_ref, s_ref, G, gs, Mp, bn):
    """Grouped int4 dot of xi_ref (Mp, G*gs) with an unpacked-on-the-fly
    packed block ref ((G*gs)//2, bn); unrolled over groups (G <= 32)."""
    half = G // 2
    acc = jnp.zeros((Mp, bn), jnp.float32)
    for g in range(G):
        row = (g if g < half else g - half) * gs
        w32 = wp_ref[pl.ds(row, gs), :].astype(jnp.int32)
        if g < half:
            w_g = jnp.right_shift(jnp.left_shift(w32, 28), 28)
        else:
            w_g = jnp.right_shift(w32, 4)
        part = jnp.dot(xi_ref[:, pl.ds(g * gs, gs)],
                       w_g.astype(jnp.int8),
                       preferred_element_type=jnp.int32)
        acc = acc + part.astype(jnp.float32) * s_ref[g, :][None, :]
    return acc


def _w4_group_dot_rolled(xi_ref, wp_ref, s_ref, G, gs, Mp, bn):
    """Rolled (lax.fori_loop) variant for large G (scoped-VMEM limit)."""
    half = G // 2

    def body(g, acc):
        row = jax.lax.rem(g, half) * gs
        w32 = wp_ref[pl.ds(row, gs), :].astype(jnp.int32)
        low = jnp.right_shift(jnp.left_shift(w32, 28), 28)
        high = jnp.right_shift(w32, 4)
        w_g = jnp.where(g < half, low, high)
        part = jnp.dot(xi_ref[:, pl.ds(g * gs, gs)],
                       w_g.astype(jnp.int8),
                       preferred_element_type=jnp.int32)
        return acc + part.astype(jnp.float32) * s_ref[pl.ds(g, 1), :]

    return jax.lax.fori_loop(0, G, body, jnp.zeros((Mp, bn), jnp.float32))


def _w4_swiglu_kernel(x_ref, g_ref, u_ref, gs_ref, us_ref, gb_ref, ub_ref,
                      dw_ref, ds_ref, db_ref, o_ref,
                      xi_scr, xrs_scr, act_scr, ai_scr, ars_scr,
                      *, Gg: int, gsg: int, Gd: int, gsd: int, Tg: int,
                      bn_g: int):
    t = pl.program_id(0)
    Mp = x_ref.shape[0]
    bn_d = dw_ref.shape[1]

    @pl.when(t == 0)
    def _quantize_x():
        xf = x_ref[...].astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-8)
        xrs_scr[...] = jnp.broadcast_to(amax * (1.0 / 127.0), xrs_scr.shape)
        xi_scr[...] = jnp.clip(jnp.round(xf * (127.0 / amax)),
                               -127, 127).astype(jnp.int8)

    @pl.when(t < Tg)
    def _gate_up():
        dot = (_w4_group_dot_unrolled if Gg <= 32 else _w4_group_dot_rolled)
        g_acc = dot(xi_scr, g_ref, gs_ref, Gg, gsg, Mp, bn_g)
        u_acc = dot(xi_scr, u_ref, us_ref, Gg, gsg, Mp, bn_g)
        # dequant -> bf16 cast of g/u (the unfused chain's intermediates),
        # then _silu_mul (f32 logistic — see its docstring)
        g_b = (g_acc * xrs_scr[:, 0:1] + gb_ref[...]).astype(act_scr.dtype)
        u_b = (u_acc * xrs_scr[:, 0:1] + ub_ref[...]).astype(act_scr.dtype)
        col = t * bn_g
        act_scr[:, pl.ds(col, bn_g)] = _silu_mul(g_b, u_b)

    @pl.when(t == Tg)
    def _quantize_act():
        af = act_scr[...].astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(af), axis=1, keepdims=True), 1e-8)
        ars_scr[...] = jnp.broadcast_to(amax * (1.0 / 127.0), ars_scr.shape)
        ai_scr[...] = jnp.clip(jnp.round(af * (127.0 / amax)),
                               -127, 127).astype(jnp.int8)

    @pl.when(t >= Tg)
    def _down():
        dot = (_w4_group_dot_unrolled if Gd <= 32 else _w4_group_dot_rolled)
        acc = dot(ai_scr, dw_ref, ds_ref, Gd, gsd, Mp, bn_d)
        o_ref[...] = (acc * ars_scr[:, 0:1] + db_ref[...]).astype(o_ref.dtype)


def _swiglu_vmem_bytes(Mp, K, F, Gg, Gd, bn_g, bn_d):
    """Estimated VMEM residency: resident activations/scratches + two
    double-buffered packed blocks per streamed input."""
    scratch = Mp * K * 3 + Mp * F * 3 + Mp * 256 * 4
    gu = 2 * 2 * ((K // 2) * bn_g + Gg * bn_g * 4 + bn_g * 4)
    dn = 2 * ((F // 2) * bn_d + Gd * bn_d * 4 + bn_d * 4)
    out = 2 * Mp * bn_d * 2
    return scratch + gu + dn + out


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def w4_swiglu_mlp(x, gu_qp: dict, down_qp: dict, *,
                  out_dtype=jnp.bfloat16, interpret: bool = False):
    """``down(silu(gate(x)) * up(x))`` over grouped-int4 weights in ONE
    pallas_call.  ``gu_qp`` is the fused gate|up leaf
    (:func:`vla_touch_tpu.planning.llm.fuse_quantized_layers` layout:
    columns [0, F) = gate, [F, 2F) = up); ``down_qp`` the (F, K) down
    projection.  Numerics identical to the unfused qdense_w4 chain
    (same per-token activation quant on x and on silu(g)*u)."""
    *lead, K = x.shape
    N2 = gu_qp["w4_pack"].shape[1]
    F = N2 // 2
    N = down_qp["w4_pack"].shape[1]
    Gg = gu_qp["scale4"].shape[0]
    Gd = down_qp["scale4"].shape[0]
    gsg, gsd = K // Gg, F // Gd

    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K).astype(jnp.bfloat16)
    Mp = _round_up(max(M, 8), 32)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))

    # pick tile widths that divide F / N and fit the VMEM budget
    bn_g = bn_d = None
    for cand_g in (512, 256, 128):
        if F % cand_g:
            continue
        for cand_d in (256, 128):
            if N % cand_d:
                continue
            if _swiglu_vmem_bytes(Mp, K, F, Gg, Gd, cand_g, cand_d) \
                    <= 12 * 1024 * 1024:
                bn_g, bn_d = cand_g, cand_d
                break
        if bn_g is not None:
            break
    ok = (bn_g is not None and N2 % 2 == 0 and gsg % 32 == 0
          and gsd % 32 == 0 and Gg % 2 == 0 and Gd % 2 == 0
          and down_qp["w4_pack"].shape[0] * 2 == F)
    if not ok:
        # unfused fallback: two streaming launches, same numerics — via the
        # dispatching entry so kernel-unfriendly dims degrade to XLA's
        # qdense_w4 instead of tripping the raw kernel's layout asserts
        act = qdense_pallas_w4(x, gu_qp, out_dtype=jnp.bfloat16,
                               interpret=interpret)
        g, u = jnp.split(act, 2, axis=-1)
        return qdense_pallas_w4(_silu_mul(g, u), down_qp,
                                out_dtype=out_dtype, interpret=interpret)

    Tg = F // bn_g
    Td = N // bn_d
    gub = (gu_qp["bias"].reshape(1, N2).astype(jnp.float32)
           if "bias" in gu_qp else jnp.zeros((1, N2), jnp.float32))
    db = (down_qp["bias"].reshape(1, N).astype(jnp.float32)
          if "bias" in down_qp else jnp.zeros((1, N), jnp.float32))

    def gate_idx(t):
        return (0, jnp.minimum(t, Tg - 1))

    def up_idx(t):
        return (0, Tg + jnp.minimum(t, Tg - 1))

    def down_idx(t):
        return (0, jnp.maximum(t - Tg, 0))

    out = pl.pallas_call(
        functools.partial(_w4_swiglu_kernel, Gg=Gg, gsg=gsg, Gd=Gd,
                          gsd=gsd, Tg=Tg, bn_g=bn_g),
        grid=(Tg + Td,),
        in_specs=[
            pl.BlockSpec((Mp, K), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K // 2, bn_g), gate_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((K // 2, bn_g), up_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((Gg, bn_g), gate_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((Gg, bn_g), up_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn_g), gate_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn_g), up_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((F // 2, bn_d), down_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((Gd, bn_d), down_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn_d), down_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, bn_d), down_idx,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((Mp, K), jnp.int8),
            pltpu.VMEM((Mp, 128), jnp.float32),
            pltpu.VMEM((Mp, F), jnp.bfloat16),
            pltpu.VMEM((Mp, F), jnp.int8),
            pltpu.VMEM((Mp, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N2 + 2 * Mp * F * N,
            bytes_accessed=(Mp * K * 2 + K * N2 // 2 + F * N // 2
                            + Mp * N * 2),
            transcendentals=Mp * F,
        ),
        interpret=interpret,
    )(x2, gu_qp["w4_pack"], gu_qp["w4_pack"], gu_qp["scale4"],
      gu_qp["scale4"], gub, gub, down_qp["w4_pack"], down_qp["scale4"], db)

    return out[:M].reshape(*lead, N)


# ---- w4 post-attention megakernel: o + residual + norm + SwiGLU MLP --------
#
# Everything a decoder layer does AFTER attention, as one launch:
#     x2 = x + o(att);  h = rmsnorm(x2) * w;  y = x2 + down(silu(g(h))*u(h))
# With the qkv concat fusion this takes a w4 decode layer to TWO pallas
# launches (qkv, post-attention) — attention itself stays in XLA where the
# fused small-shape einsums are already optimal.  Decode-serving only
# (resident-activation design); prompt/training paths keep the unfused ops.


def _w4_postattn_kernel(x_ref, att_ref, ow_ref, os_ref, ob_ref, nw_ref,
                        g_ref, u_ref, gs_ref, us_ref, gb_ref, ub_ref,
                        dw_ref, ds_ref, db_ref, o_ref,
                        ati_scr, ars_scr, x2_scr, hi_scr, hrs_scr,
                        act_scr, ai_scr, qrs_scr,
                        *, Go: int, gso: int, Gg: int, gsg: int, Gd: int,
                        gsd: int, To: int, Tg: int, bn_o: int, bn_g: int,
                        eps: float):
    t = pl.program_id(0)
    Mp = x_ref.shape[0]
    bn_d = dw_ref.shape[1]

    @pl.when(t == 0)
    def _quantize_att():
        af = att_ref[...].astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(af), axis=1, keepdims=True), 1e-8)
        ars_scr[...] = jnp.broadcast_to(amax * (1.0 / 127.0), ars_scr.shape)
        ati_scr[...] = jnp.clip(jnp.round(af * (127.0 / amax)),
                                -127, 127).astype(jnp.int8)

    @pl.when(t < To)
    def _o_proj():
        dot = (_w4_group_dot_unrolled if Go <= 32 else _w4_group_dot_rolled)
        acc = dot(ati_scr, ow_ref, os_ref, Go, gso, Mp, bn_o)
        col = t * bn_o
        o_out = (acc * ars_scr[:, 0:1] + ob_ref[...]).astype(x2_scr.dtype)
        x2_scr[:, pl.ds(col, bn_o)] = x_ref[:, pl.ds(col, bn_o)] + o_out

    @pl.when(t == To)
    def _norm_and_quantize_h():
        # the exact _rmsnorm sequence: f32 mean-of-squares, rsqrt, * w,
        # cast back — then the per-token int8 quant the gate/up dot needs
        x2 = x2_scr[...].astype(jnp.float32)
        y = x2 * jax.lax.rsqrt(jnp.mean(jnp.square(x2), axis=1,
                                        keepdims=True) + eps)
        h = (y * nw_ref[...]).astype(x2_scr.dtype).astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(h), axis=1, keepdims=True), 1e-8)
        hrs_scr[...] = jnp.broadcast_to(amax * (1.0 / 127.0), hrs_scr.shape)
        hi_scr[...] = jnp.clip(jnp.round(h * (127.0 / amax)),
                               -127, 127).astype(jnp.int8)

    @pl.when(jnp.logical_and(t >= To, t < To + Tg))
    def _gate_up():
        dot = (_w4_group_dot_unrolled if Gg <= 32 else _w4_group_dot_rolled)
        g_acc = dot(hi_scr, g_ref, gs_ref, Gg, gsg, Mp, bn_g)
        u_acc = dot(hi_scr, u_ref, us_ref, Gg, gsg, Mp, bn_g)
        g_b = (g_acc * hrs_scr[:, 0:1] + gb_ref[...]).astype(act_scr.dtype)
        u_b = (u_acc * hrs_scr[:, 0:1] + ub_ref[...]).astype(act_scr.dtype)
        col = (t - To) * bn_g
        act_scr[:, pl.ds(col, bn_g)] = _silu_mul(g_b, u_b)

    @pl.when(t == To + Tg)
    def _quantize_act():
        af = act_scr[...].astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(af), axis=1, keepdims=True), 1e-8)
        qrs_scr[...] = jnp.broadcast_to(amax * (1.0 / 127.0), qrs_scr.shape)
        ai_scr[...] = jnp.clip(jnp.round(af * (127.0 / amax)),
                               -127, 127).astype(jnp.int8)

    @pl.when(t >= To + Tg)
    def _down():
        dot = (_w4_group_dot_unrolled if Gd <= 32 else _w4_group_dot_rolled)
        acc = dot(ai_scr, dw_ref, ds_ref, Gd, gsd, Mp, bn_d)
        col = (t - To - Tg) * bn_d
        mlp = (acc * qrs_scr[:, 0:1] + db_ref[...]).astype(o_ref.dtype)
        o_ref[...] = x2_scr[:, pl.ds(col, bn_d)].astype(o_ref.dtype) + mlp


def _postattn_vmem_bytes(Mp, Ka, D, F, Go, Gg, Gd, bn_o, bn_g, bn_d):
    scratch = (Mp * Ka * 3 + Mp * D * 2 * 2 + Mp * D + Mp * F * 3
               + Mp * 128 * 4 * 3)
    ow = 2 * ((Ka // 2) * bn_o + Go * bn_o * 4 + bn_o * 4)
    gu = 2 * 2 * ((D // 2) * bn_g + Gg * bn_g * 4 + bn_g * 4)
    dn = 2 * ((F // 2) * bn_d + Gd * bn_d * 4 + bn_d * 4)
    return scratch + ow + gu + dn + 2 * Mp * bn_d * 2 + D * 4


@functools.partial(jax.jit, static_argnames=("eps", "out_dtype",
                                             "interpret"))
def w4_postattn_fused(x, att, o_qp: dict, gu_qp: dict, down_qp: dict,
                      norm_w, *, eps: float = 1e-6,
                      out_dtype=jnp.bfloat16, interpret: bool = False):
    """``x + o(att)`` then ``rmsnorm`` then the SwiGLU MLP with its
    residual, all in ONE pallas_call over grouped-int4 weights — the whole
    post-attention half of a decoder layer (see module comment).  Falls
    back to the composed per-op dispatchers when the shapes don't fit."""
    *lead, Ka = att.shape
    D = x.shape[-1]
    N2 = gu_qp["w4_pack"].shape[1]
    F = N2 // 2
    Go = o_qp["scale4"].shape[0]
    Gg = gu_qp["scale4"].shape[0]
    Gd = down_qp["scale4"].shape[0]
    gso, gsg, gsd = Ka // Go, D // Gg, F // Gd

    M = 1
    for d in lead:
        M *= d
    Mp = _round_up(max(M, 8), 32)

    bn_o = bn_g = bn_d = None
    for co in (512, 256, 128):
        if D % co:
            continue
        for cg in (512, 256, 128):
            if F % cg:
                continue
            for cd in (256, 128):
                if D % cd:
                    continue
                if _postattn_vmem_bytes(Mp, Ka, D, F, Go, Gg, Gd, co, cg,
                                        cd) <= 12 * 1024 * 1024:
                    bn_o, bn_g, bn_d = co, cg, cd
                    break
            if bn_o is not None:
                break
        if bn_o is not None:
            break
    ok = (bn_o is not None and M <= 32 and N2 % 2 == 0
          and o_qp["w4_pack"].shape[1] == D
          and down_qp["w4_pack"].shape[1] == D
          and all(g % 2 == 0 for g in (Go, Gg, Gd))
          and all(s % 32 == 0 for s in (gso, gsg, gsd)))
    if not ok:
        # composed fallback — numerically the same op sequence, through the
        # dispatching entries so kernel-unfriendly dims reach XLA
        x2 = x + qdense_pallas_w4(att, o_qp, out_dtype=x.dtype,
                                  interpret=interpret)
        xf = x2.astype(jnp.float32)
        h = (xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), -1, keepdims=True)
                                + eps) * norm_w).astype(x2.dtype)
        return (x2 + w4_swiglu_mlp(h, gu_qp, down_qp, out_dtype=x2.dtype,
                                   interpret=interpret)).astype(out_dtype)

    x2 = x.reshape(M, D).astype(jnp.bfloat16)
    a2 = att.reshape(M, Ka).astype(jnp.bfloat16)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
        a2 = jnp.pad(a2, ((0, Mp - M), (0, 0)))

    To, Tg, Td = D // bn_o, F // bn_g, D // bn_d
    ob = (o_qp["bias"].reshape(1, D).astype(jnp.float32)
          if "bias" in o_qp else jnp.zeros((1, D), jnp.float32))
    gub = (gu_qp["bias"].reshape(1, N2).astype(jnp.float32)
           if "bias" in gu_qp else jnp.zeros((1, N2), jnp.float32))
    db = (down_qp["bias"].reshape(1, D).astype(jnp.float32)
          if "bias" in down_qp else jnp.zeros((1, D), jnp.float32))
    nw = jnp.asarray(norm_w, jnp.float32).reshape(1, D)

    def o_idx(t):
        return (0, jnp.minimum(t, To - 1))

    def gate_idx(t):
        return (0, jnp.clip(t - To, 0, Tg - 1))

    def up_idx(t):
        return (0, Tg + jnp.clip(t - To, 0, Tg - 1))

    def down_idx(t):
        return (0, jnp.maximum(t - To - Tg, 0))

    out = pl.pallas_call(
        functools.partial(_w4_postattn_kernel, Go=Go, gso=gso, Gg=Gg,
                          gsg=gsg, Gd=Gd, gsd=gsd, To=To, Tg=Tg,
                          bn_o=bn_o, bn_g=bn_g, eps=float(eps)),
        grid=(To + Tg + Td,),
        in_specs=[
            pl.BlockSpec((Mp, D), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, Ka), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ka // 2, bn_o), o_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((Go, bn_o), o_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn_o), o_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D // 2, bn_g), gate_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((D // 2, bn_g), up_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((Gg, bn_g), gate_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((Gg, bn_g), up_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn_g), gate_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn_g), up_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((F // 2, bn_d), down_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((Gd, bn_d), down_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn_d), down_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, bn_d), down_idx,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, D), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((Mp, Ka), jnp.int8),
            pltpu.VMEM((Mp, 128), jnp.float32),
            pltpu.VMEM((Mp, D), jnp.bfloat16),
            pltpu.VMEM((Mp, D), jnp.int8),
            pltpu.VMEM((Mp, 128), jnp.float32),
            pltpu.VMEM((Mp, F), jnp.bfloat16),
            pltpu.VMEM((Mp, F), jnp.int8),
            pltpu.VMEM((Mp, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * (Ka * D + D * N2 + F * D),
            bytes_accessed=(Mp * (Ka + D) * 2 + Ka * D // 2 + D * N2 // 2
                            + F * D // 2 + Mp * D * 2),
            transcendentals=Mp * (F + 1),
        ),
        interpret=interpret,
    )(x2, a2, o_qp["w4_pack"], o_qp["scale4"], ob, nw,
      gu_qp["w4_pack"], gu_qp["w4_pack"], gu_qp["scale4"], gu_qp["scale4"],
      gub, gub, down_qp["w4_pack"], down_qp["scale4"], db)

    return out[:M].reshape(*x.shape[:-1], D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _w4_swiglu_diff(out_dtype, interpret, x, gu_qp, down_qp):
    """w4_swiglu_mlp with the same differentiation contract as
    :func:`_w4a8_matmul_diff`: forward = the megakernel, backward = the vjp
    of the numerically-identical XLA composition."""
    return w4_swiglu_mlp(x, gu_qp, down_qp, out_dtype=out_dtype,
                         interpret=interpret)


def _w4_swiglu_ref(x, gu_qp, down_qp, out_dtype):
    from vla_touch_tpu.ops.quant import qdense_w4

    act = qdense_w4(x, gu_qp, out_dtype=jnp.bfloat16)
    g, u = jnp.split(act, 2, axis=-1)
    return qdense_w4(_silu_mul(g, u), down_qp, out_dtype=out_dtype)


def _w4_postattn_ref(x, att, o_qp, gu_qp, down_qp, norm_w, eps,
                     out_dtype=jnp.bfloat16):
    """The unfused op/dtype ladder :func:`w4_postattn_fused` implements —
    THE parity reference for the megakernel.  Every cast matches the kernel
    exactly, including :func:`_silu_mul` (f32 logistic, product cast): a
    one-ulp silu difference propagates through the down-projection's
    per-token int8 activation quant and flips quant buckets, which is why a
    plain ``jax.nn.silu`` bf16 chain is NOT a valid reference (the round-3
    red test on the bench TPU was exactly that — 6.25%% of elements one
    quant step off)."""
    from vla_touch_tpu.ops.quant import qdense_w4

    x2 = x + qdense_w4(att, o_qp, out_dtype=x.dtype)
    xf = x2.astype(jnp.float32)
    h = (xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), -1, keepdims=True)
                            + eps) * norm_w).astype(x2.dtype)
    return (x2 + _w4_swiglu_ref(h, gu_qp, down_qp, x2.dtype)).astype(
        out_dtype)


def _w4_swiglu_fwd(out_dtype, interpret, x, gu_qp, down_qp):
    y = w4_swiglu_mlp(x, gu_qp, down_qp, out_dtype=out_dtype,
                      interpret=interpret)
    return y, (x, gu_qp, down_qp)


def _w4_swiglu_bwd(out_dtype, interpret, res, g):
    import numpy as onp

    x, gu_qp, down_qp = res
    _, vjp = jax.vjp(lambda xx: _w4_swiglu_ref(xx, gu_qp, down_qp,
                                               out_dtype), x)
    (dx,) = vjp(g)

    def frozen(tree):
        return jax.tree.map(
            lambda a: (onp.zeros(a.shape, dtype=jax.dtypes.float0)
                       if jnp.issubdtype(a.dtype, jnp.integer)
                       else jnp.zeros_like(a)), tree)

    return dx, frozen(gu_qp), frozen(down_qp)


_w4_swiglu_diff.defvjp(_w4_swiglu_fwd, _w4_swiglu_bwd)


def qdense_pallas_swiglu(x, gu_qp: dict, down_qp: dict,
                         out_dtype=jnp.bfloat16, interpret=False):
    """Dispatching entry for the SwiGLU megakernel: small-M w4 decode calls
    hit the single-launch kernel; everything else composes the per-matmul
    dispatchers (so large-M prompt/train paths keep their XLA fallbacks)."""
    M = 1
    for d in x.shape[:-1]:
        M *= d
    w4 = "w4_pack" in gu_qp and "w4_pack" in down_qp
    if not w4 or M > 32:
        act = qdense_pallas_w4(x, gu_qp, out_dtype=jnp.bfloat16,
                               interpret=interpret)
        g, u = jnp.split(act, 2, axis=-1)
        return qdense_pallas_w4(_silu_mul(g, u), down_qp,
                                out_dtype=out_dtype, interpret=interpret)
    return _w4_swiglu_diff(out_dtype, interpret, x, gu_qp, down_qp)


def qdense_pallas_w4(x, qp: dict, out_dtype=jnp.bfloat16, interpret=False):
    """Layout-dispatching Pallas drop-in for
    :func:`vla_touch_tpu.ops.quant.qdense_any`: grouped-int4 leaves hit the
    w4a8 nibble-streaming kernel, int8 leaves the fused a8w8 kernel; large-M
    (compute-bound precompute) calls fall back to XLA."""
    M = 1
    for d in x.shape[:-1]:
        M *= d
    if "w4_pack" not in qp:
        return qdense_pallas_a8w8(x, qp, out_dtype=out_dtype,
                                  interpret=interpret)
    K = x.shape[-1]
    N = qp["w4_pack"].shape[1]
    G = qp["scale4"].shape[0]
    if M > 512 or (K // G) % 32 or N % 128:
        # compute-bound precompute (large M) or kernel-unfriendly dims:
        # the XLA grouped-dot path handles every valid w4 layout
        from vla_touch_tpu.ops.quant import qdense_w4

        return qdense_w4(x, qp, out_dtype=out_dtype)
    return _w4a8_matmul_diff(out_dtype, interpret, x, qp["w4_pack"],
                             qp["scale4"], qp.get("bias"))


def qdense_pallas_a8w8(x, qp: dict, out_dtype=jnp.bfloat16, interpret=False):
    """a8w8 drop-in for :func:`vla_touch_tpu.ops.quant.qdense` (same scheme,
    one fused kernel).

    The kernel keeps the whole (Mp, K) activation + int8 scratch resident in
    VMEM — correct for the B=1 serving regime it targets (M ≲ 100 tokens)
    but a VMEM blowup for the long-condition precompute matmuls (the
    4374-token image adaptor).  Large-M calls fall back to the XLA int8
    path, which is compute-bound there anyway.
    """
    M = 1
    for d in x.shape[:-1]:
        M *= d
    if M > 512:
        from vla_touch_tpu.ops.quant import qdense

        return qdense(x, qp, out_dtype=out_dtype)
    return a8w8_matmul(x, qp["w_i8"], qp["scale"], qp.get("bias"),
                       out_dtype=out_dtype, interpret=interpret)
