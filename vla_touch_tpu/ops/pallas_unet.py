"""Fused UNet-1D residual block: one Pallas launch per block.

Why: the BRIDGeR refine (10-step SDE over two UNet-1Ds,
``models/controllers/interpolants.py::sde_sample``) measured ~12 ms on
v5e — the LARGEST stage of the chunk+refine path — while its FLOPs
(~2 GFLOP/step) and weight bytes (~60 MB/step) are both trivial.  The
compiled scan body holds ~970 HLO instructions / ~40 matmul ops per step
on (2, 16, ≤512) tensors: the cost is kernel count, not math.  Each
``ConditionalResidualBlock1D`` (conv5 → GroupNorm → Mish → FiLM → conv5 →
GroupNorm → Mish → +residual, ``unet1d.py:47-78``) is ~8 XLA kernels;
this module computes the whole block in ONE ``pallas_call``:

- the k-tap convolutions become shift-matrix matmuls: ``y = Σ_d (S_d @ h)
  @ W[d]`` with ``S_d`` built from iota in-kernel — every op is a clean
  2-D MXU matmul on (T, C) tiles, no in-kernel padding;
- GroupNorm statistics ride matmuls with a group one-hot (C, G) matrix
  (sublane reduce + two lane-space matmuls), f32;
- FiLM / Mish are elementwise on values already in VMEM.

The grid dimension is the STACKED-NETWORK axis: the serving path
evaluates the v and s UNets of the stochastic interpolant on the same
input (``bridge.py::vs_fused``), so weights carry a leading S and each
grid step streams one network's block weights (~7 MB VMEM at C=512).

The reference delegates this network to cuDNN
(``conditional_unet_1D.py:40-105``); there is no reference kernel to
mirror — parity is pinned against the flax module in
``tests/test_pallas_unet.py`` (interpret mode).

MEASURED RESULT (v5e, tools/bench_bridge.py, 10-step SDE refine p50):
the tap-stacked Conv1d (``ops/nn.py::_TapConv1d``) alone cut the refine
12.0 -> 8.3 ms; this kernel on top of it measured 8.7 ms — a small
NEGATIVE (streaming each block's bf16 weights through VMEM per launch
costs more than the remaining launch overhead it removes).  It is kept
opt-in (``bridge_predict(unet_impl='fused')``) as the platform's
fused-block recipe should batch/shape regimes change.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _resblock_kernel(x_ref, cond_ref, w0_ref, b0_ref, g0w_ref, g0b_ref,
                     fw_ref, fb_ref, w1_ref, b1_ref, g1w_ref, g1b_ref,
                     wr_ref, br_ref, o_ref, *, k, n_groups, eps, has_res):
    """One stacked-network slice of the fused residual block.

    Shapes (refs are the per-grid-step blocks, leading S sliced to 1):
      x (1, B, T, Cin) bf16/f32; cond (1, B, G);
      w0 (1, k, Cin, C); w1 (1, k, C, C); fw (1, G, 2C); wr (1, 1, Cin, C)
      (all-zero dummy when ``has_res`` is False); out (1, B, T, C).
    """
    _, B, T, Cin = x_ref.shape
    C = w0_ref.shape[-1]
    gs = C // n_groups

    # shift matrices S_d[t, u] = 1 iff u == t + d - k//2, so (S_d @ h)[t]
    # = h[t + d - k//2] (cross-correlation; zero padding implicit:
    # out-of-range rows are simply absent)
    it = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    iu = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)

    # GroupNorm one-hot (C, n_groups) and its transpose, f32
    ic = jax.lax.broadcasted_iota(jnp.int32, (C, n_groups), 0)
    ig = jax.lax.broadcasted_iota(jnp.int32, (C, n_groups), 1)
    m_g = (ic // gs == ig).astype(jnp.float32)

    def conv(h, w_ref3, b_ref):
        """Σ_d (S_d @ h) @ W[d] + b : (T, Ci) -> (T, C) in f32.
        Vector operands arrive as (1, 1, C) refs (Mosaic's last-two-dims
        blocking rule) — ``ref[0]`` is the broadcastable (1, C) row."""
        acc = jnp.zeros((T, C), jnp.float32)
        hb = h.astype(jnp.bfloat16)
        for d in range(k):
            s_d = (iu == it + (d - k // 2)).astype(jnp.bfloat16)
            # (it, iu) ordering above makes this u == t + (d - k//2);
            # Mosaic requires a 32-bit matmul accumulator, so the shift
            # matmul accumulates f32 and is cast back for the MXU matmul
            sh = jax.lax.dot(s_d, hb, preferred_element_type=jnp.float32)
            acc = acc + jax.lax.dot(sh.astype(jnp.bfloat16),
                                    w_ref3[d].astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
        return acc + b_ref[0].astype(jnp.float32)

    def groupnorm(y, w_ref, b_ref):
        """torch GroupNorm over (T, group-channels) jointly, f32."""
        s = jnp.sum(y, axis=0, keepdims=True) @ m_g          # (1, G)
        s2 = jnp.sum(y * y, axis=0, keepdims=True) @ m_g
        cnt = float(T * gs)
        mean = s / cnt
        var = s2 / cnt - mean * mean
        mean_c = mean @ m_g.T                                # (1, C)
        rstd_c = jax.lax.rsqrt(var + eps) @ m_g.T
        yn = (y - mean_c) * rstd_c
        return yn * w_ref[0].astype(jnp.float32) \
            + b_ref[0].astype(jnp.float32)

    for b in range(B):
        x_b = x_ref[0, b].astype(jnp.float32)                # (T, Cin)
        h = conv(x_b, w0_ref[0], b0_ref[0])
        h = _mish(groupnorm(h, g0w_ref[0], g0b_ref[0]))

        cond_b = _mish(cond_ref[0, b:b + 1].astype(jnp.float32))  # (1, G)
        film = jax.lax.dot(cond_b.astype(jnp.bfloat16),
                           fw_ref[0].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32) \
            + fb_ref[0].astype(jnp.float32)                   # (1, 2C)
        h = film[:, :C] * h + film[:, C:]

        h = conv(h, w1_ref[0], b1_ref[0])
        h = _mish(groupnorm(h, g1w_ref[0], g1b_ref[0]))

        if has_res:
            res = jax.lax.dot(x_b.astype(jnp.bfloat16),
                              wr_ref[0, 0].astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32) \
                + br_ref[0].astype(jnp.float32)
        else:
            res = x_b
        o_ref[0, b] = (h + res).astype(o_ref.dtype)


def _leaves(p, has_res):
    w0 = p["block0"]["conv"]["conv"]["kernel"]
    b0 = p["block0"]["conv"]["conv"]["bias"]
    g0w, g0b = p["block0"]["gn"]["weight"], p["block0"]["gn"]["bias"]
    fw, fb = p["cond_encoder"]["kernel"], p["cond_encoder"]["bias"]
    w1 = p["block1"]["conv"]["conv"]["kernel"]
    b1 = p["block1"]["conv"]["conv"]["bias"]
    g1w, g1b = p["block1"]["gn"]["weight"], p["block1"]["gn"]["bias"]
    if has_res:
        wr = p["residual_conv"]["conv"]["kernel"]
        br = p["residual_conv"]["conv"]["bias"]
    else:
        C = w0.shape[-1]
        Cin = w0.shape[-2]
        lead = w0.shape[:-3]
        wr = jnp.zeros(lead + (1, Cin, C), w0.dtype)
        br = jnp.zeros(lead + (C,), w0.dtype)
    return [w0, b0, g0w, g0b, fw, fb, w1, b1, g1w, g1b, wr, br]


def resblock_fused(x, cond, params: dict, *, kernel_size: int = 5,
                   n_groups: int = 8, eps: float = 1e-5,
                   out_dtype=None, interpret: bool = False):
    """Fused ``ConditionalResidualBlock1D`` forward.

    x (B, T, Cin) — or (S, B, T, Cin) when per-network activations have
    already diverged; cond (B, G) or (S, B, G) likewise.  ``params`` is
    either the flax block subtree, or the same with a leading
    stacked-network axis S on every leaf (``jnp.stack`` of the v/s nets)
    — the output then gains a leading S: (S, B, T, C).
    """
    stacked = params["cond_encoder"]["kernel"].ndim == 3
    has_res = "residual_conv" in params
    leaves = _leaves(params, has_res)
    if not stacked:
        leaves = [l[None] for l in leaves]
    # Mosaic blocks over the LAST TWO dims: per-network vectors (S, C)
    # must land as (S, 1, C) so each grid block is a (1, C) row.
    leaves = [l[:, None] if l.ndim == 2 else l for l in leaves]
    # The MXU matmuls consume the conv/FiLM weights in bf16 anyway; stream
    # them from HBM in bf16 so the double-buffered per-block VMEM stays
    # inside the 16 MB scoped budget at C=512 (f32 up-blocks hit 24 MB).
    leaves = [l.astype(jnp.bfloat16) if l.ndim == 4 else l for l in leaves]
    S = leaves[0].shape[0]
    if x.ndim == 3:
        x = jnp.broadcast_to(x[None], (S,) + x.shape)
    if cond.ndim == 2:
        cond = jnp.broadcast_to(cond[None], (S,) + cond.shape)
    _, B, T, Cin = x.shape
    C = leaves[0].shape[-1]
    G = cond.shape[-1]
    out_dtype = out_dtype or x.dtype

    def wspec(shape):
        # one network's slice per grid step
        return pl.BlockSpec((1,) + shape,
                            lambda s: (s,) + (0,) * len(shape))

    in_specs = [
        wspec((B, T, Cin)),                               # x (per net)
        wspec((B, G)),                                    # cond (per net)
        wspec((kernel_size, Cin, C)), wspec((1, C)),
        wspec((1, C)), wspec((1, C)),
        wspec((G, 2 * C)), wspec((1, 2 * C)),
        wspec((kernel_size, C, C)), wspec((1, C)),
        wspec((1, C)), wspec((1, C)),
        wspec((1, Cin, C)), wspec((1, C)),
    ]
    kernel = partial(_resblock_kernel, k=kernel_size, n_groups=n_groups,
                     eps=eps, has_res=has_res)
    out = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, B, T, C), lambda s: (s, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((S, B, T, C), out_dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x, cond, *leaves)
    return out if stacked else out[0]


def resblock_ref(x, cond, params: dict, *, kernel_size: int = 5,
                 n_groups: int = 8, eps: float = 1e-5, dtype=jnp.float32):
    """XLA reference: the flax block's math on one (possibly stacked)
    param set — used by parity tests and the non-TPU fallback."""
    from vla_touch_tpu.models.controllers.unet1d import (
        ConditionalResidualBlock1D)

    stacked = params["cond_encoder"]["kernel"].ndim == 3
    C = params["block0"]["conv"]["conv"]["kernel"].shape[-1]
    block = ConditionalResidualBlock1D(C, kernel_size=kernel_size,
                                       n_groups=n_groups, dtype=dtype)
    if stacked:
        return jax.vmap(
            lambda p, xx, cc: block.apply({"params": p}, xx, cc),
            in_axes=(0, 0 if x.ndim == 4 else None,
                     0 if cond.ndim == 3 else None))(params, x, cond)
    return block.apply({"params": params}, x, cond)
