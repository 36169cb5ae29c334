"""Serving-path UNet-1D forward: fused residual blocks, stacked networks.

Pure-function mirror of ``ConditionalUnet1D.__call__`` (``unet1d.py``)
consuming the SAME flax parameter tree — the pattern of
``models/rdt/quant_serve.py`` — evaluated for S stacked networks at once
(the v/s nets of the stochastic interpolant share the architecture and
the input, ``bridge.py::vs_fused``).  The 10 conditional residual blocks
run through the fused Pallas kernel (``ops/pallas_unet.resblock_fused``,
one launch per block instead of ~8 XLA kernels); the cheap glue
(timestep MLP, stride-2 down/up-sampling, final head) stays XLA under
``vmap`` over the stacked axis.

Training and the parity surface keep the flax module; equivalence is
pinned by ``tests/test_pallas_unet.py::test_unet_serve_matches_flax``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vla_touch_tpu.models.controllers.unet1d import (
    Conv1dBlock, ConvTranspose1d)
from vla_touch_tpu.ops.nn import mish
from vla_touch_tpu.ops.pos_embed import sinusoidal_pos_emb
from vla_touch_tpu.ops.pallas_unet import resblock_fused, resblock_ref


def _dense_s(p, x):
    """Stacked Dense: x (S, B, I) @ kernel (S, I, O) + bias (S, O)."""
    return jnp.einsum("sbi,sio->sbo", x, p["kernel"]) + p["bias"][:, None]


def _conv_s(p, x, stride=1, padding=0):
    """Stacked 1-D conv: x (S, B, T, Ci), kernel (S, k, Ci, F)."""
    S, k = p["kernel"].shape[:2]
    xp = jnp.pad(x, ((0, 0), (0, 0), (padding, padding), (0, 0)))
    T_out = (xp.shape[2] - k) // stride + 1
    taps = [xp[:, :, d: d + (T_out - 1) * stride + 1: stride]
            for d in range(k)]
    xt = jnp.concatenate(taps, axis=-1)        # (S, B, T_out, k*Ci)
    w = p["kernel"].reshape(S, -1, p["kernel"].shape[-1])
    return (jnp.einsum("sbti,sif->sbtf", xt, w)
            + p["bias"][:, None, None])


def _block(p, x, cond, *, kernel_size, n_groups, fused, interpret, dtype):
    if fused:
        return resblock_fused(x, cond, p, kernel_size=kernel_size,
                              n_groups=n_groups, out_dtype=dtype,
                              interpret=interpret)
    return resblock_ref(x, cond, p, kernel_size=kernel_size,
                        n_groups=n_groups, dtype=dtype)


def unet_forward_stacked(params, sample, timestep, global_cond, *,
                         down_dims=(256, 512, 512), kernel_size: int = 5,
                         n_groups: int = 8,
                         diffusion_step_embed_dim: int = 256,
                         dtype=jnp.bfloat16, fused: bool = True,
                         interpret: bool = False):
    """params: S-stacked ConditionalUnet1D trees (``jax.tree.map(stack)``);
    sample (B, T, D); timestep (B,); global_cond (B, G).
    Returns (S, B, T, D)."""
    S = params["step_fc1"]["kernel"].shape[0]
    B, T, D = sample.shape
    kw = dict(kernel_size=kernel_size, n_groups=n_groups, fused=fused,
              interpret=interpret, dtype=dtype)

    t_emb = sinusoidal_pos_emb(timestep, diffusion_step_embed_dim,
                               dtype=dtype)                  # (B, dsed)
    t_emb = jnp.broadcast_to(t_emb[None], (S,) + t_emb.shape)
    t_emb = _dense_s(params["step_fc2"],
                     mish(_dense_s(params["step_fc1"], t_emb)))
    cond = jnp.concatenate(
        [t_emb, jnp.broadcast_to(global_cond.astype(dtype)[None],
                                 (S, B, global_cond.shape[-1]))], -1)

    all_dims = [D] + list(down_dims)
    in_out = list(zip(all_dims[:-1], all_dims[1:]))

    x = jnp.broadcast_to(sample.astype(dtype)[None], (S, B, T, D))
    skips = []
    for i, (_, dim_out) in enumerate(in_out):
        is_last = i >= len(in_out) - 1
        x = _block(params[f"down{i}_res0"], x, cond, **kw)
        x = _block(params[f"down{i}_res1"], x, cond, **kw)
        skips.append(x)
        if not is_last:
            x = _conv_s(params[f"down{i}_down"]["conv"], x,
                        stride=2, padding=1)

    x = _block(params["mid0"], x, cond, **kw)
    x = _block(params["mid1"], x, cond, **kw)

    for i, (dim_in, dim_out) in enumerate(reversed(in_out[1:])):
        x = jnp.concatenate([x, skips.pop()], axis=-1)
        x = _block(params[f"up{i}_res0"], x, cond, **kw)
        x = _block(params[f"up{i}_res1"], x, cond, **kw)
        if i < len(in_out) - 1:
            p_up = params[f"up{i}_up"]
            feats = p_up["conv"]["kernel"].shape[-1]
            mod = ConvTranspose1d(feats, 4, dtype=dtype, param_dtype=dtype)
            x = jax.vmap(lambda p, xx: mod.apply(
                {"params": jax.tree.map(lambda a: a.astype(dtype), p)},
                xx))(p_up, x)

    fb = params["final_block"]
    mod_fb = Conv1dBlock(fb["conv"]["conv"]["kernel"].shape[-1],
                         kernel_size, n_groups, dtype=dtype,
                         param_dtype=dtype)
    x = jax.vmap(lambda p, xx: mod_fb.apply(
        {"params": jax.tree.map(lambda a: a.astype(dtype), p)}, xx))(fb, x)
    x = _conv_s(params["final_conv"]["conv"], x)
    return x
