"""FiLM-conditioned temporal UNet-1D for action-chunk diffusion.

TPU-native redesign of the controller network
(``/root/reference/VLA/residual_controller/bridge/networks/conditional_unet_1D.py``):
channels-last (B, T, C) layout so the time axis rides the sublane dimension
and channel matmuls hit the MXU, with the same architecture contract —

  down path over ``down_dims`` (two FiLM residual blocks + stride-2 conv),
  two mid blocks, up path with skip concatenation + transposed-conv
  upsampling, final Conv1dBlock + pointwise conv.

``SITripleUnet`` bundles the three identical b/v/s networks of the
stochastic-interpolants model (``conditional_unet_1D_si.py:4-50``), with
``down_dims=(256, 512, 512)``.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as fnn

from vla_touch_tpu.ops.nn import Conv1d, ConvTranspose1d, GroupNorm, mish
from vla_touch_tpu.ops.pos_embed import sinusoidal_pos_emb


class Conv1dBlock(fnn.Module):
    """Conv1d -> GroupNorm -> Mish (reference :40-55)."""

    features: int
    kernel_size: int
    n_groups: int = 8
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x):
        x = Conv1d(self.features, self.kernel_size,
                   padding=self.kernel_size // 2, dtype=self.dtype,
                   param_dtype=self.param_dtype, name="conv")(x)
        x = GroupNorm(self.n_groups, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="gn")(x)
        return mish(x)


class ConditionalResidualBlock1D(fnn.Module):
    """Two Conv1dBlocks with FiLM modulation after the first (reference :58-105).

    The conditioning MLP is Mish -> Linear(cond_dim, 2*C); the first half of
    its output is the per-channel scale, the second half the bias.
    """

    features: int
    kernel_size: int = 3
    n_groups: int = 8
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x, cond):
        out = Conv1dBlock(self.features, self.kernel_size, self.n_groups,
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name="block0")(x)
        embed = fnn.Dense(2 * self.features, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name="cond_encoder")(mish(cond))
        scale = embed[:, None, : self.features]
        bias = embed[:, None, self.features:]
        out = scale * out + bias
        out = Conv1dBlock(self.features, self.kernel_size, self.n_groups,
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name="block1")(out)
        if x.shape[-1] != self.features:
            x = Conv1d(self.features, 1, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="residual_conv")(x)
        return out + x


class ConditionalUnet1D(fnn.Module):
    """The full UNet.  ``use_timestep`` toggles between the diffusion variant
    (with sinusoidal step encoder, reference :108-247) and the plain residual
    variant (reference :250-368)."""

    input_dim: int
    down_dims: Sequence[int] = (256, 512, 1024)
    kernel_size: int = 5
    n_groups: int = 8
    diffusion_step_embed_dim: int = 256
    use_timestep: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, sample, timestep=None, global_cond=None):
        """sample: (B, T, input_dim); timestep: (B,) float; global_cond (B, G)."""
        kw = dict(kernel_size=self.kernel_size, n_groups=self.n_groups,
                  dtype=self.dtype, param_dtype=self.param_dtype)
        feats = []
        if self.use_timestep:
            dsed = self.diffusion_step_embed_dim
            t_emb = sinusoidal_pos_emb(timestep, dsed, dtype=self.dtype)
            t_emb = fnn.Dense(dsed * 4, dtype=self.dtype,
                              param_dtype=self.param_dtype, name="step_fc1")(t_emb)
            t_emb = mish(t_emb)
            t_emb = fnn.Dense(dsed, dtype=self.dtype,
                              param_dtype=self.param_dtype, name="step_fc2")(t_emb)
            feats.append(t_emb)
        if global_cond is not None:
            feats.append(global_cond)
        cond = jnp.concatenate(feats, axis=-1) if feats else None

        all_dims = [self.input_dim] + list(self.down_dims)
        in_out = list(zip(all_dims[:-1], all_dims[1:]))

        x = sample
        skips = []
        for i, (_, dim_out) in enumerate(in_out):
            is_last = i >= len(in_out) - 1
            x = ConditionalResidualBlock1D(dim_out, **kw, name=f"down{i}_res0")(x, cond)
            x = ConditionalResidualBlock1D(dim_out, **kw, name=f"down{i}_res1")(x, cond)
            skips.append(x)
            if not is_last:
                x = Conv1d(dim_out, 3, stride=2, padding=1, dtype=self.dtype,
                           param_dtype=self.param_dtype, name=f"down{i}_down")(x)

        x = ConditionalResidualBlock1D(all_dims[-1], **kw, name="mid0")(x, cond)
        x = ConditionalResidualBlock1D(all_dims[-1], **kw, name="mid1")(x, cond)

        for i, (dim_in, dim_out) in enumerate(reversed(in_out[1:])):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ConditionalResidualBlock1D(dim_in, **kw, name=f"up{i}_res0")(x, cond)
            x = ConditionalResidualBlock1D(dim_in, **kw, name=f"up{i}_res1")(x, cond)
            # Mirror of the reference loop: is_last only when the up path is
            # shorter than len(in_out), which never triggers for >=2 levels.
            is_last = i >= len(in_out) - 1
            if not is_last:
                x = ConvTranspose1d(dim_in, 4, stride=2, padding=1,
                                    dtype=self.dtype,
                                    param_dtype=self.param_dtype,
                                    name=f"up{i}_up")(x)

        x = Conv1dBlock(self.down_dims[0], self.kernel_size, self.n_groups,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="final_block")(x)
        x = Conv1d(self.input_dim, 1, dtype=self.dtype,
                   param_dtype=self.param_dtype, name="final_conv")(x)
        return x


class SITripleUnet(fnn.Module):
    """b/v/s network bundle for stochastic interpolants
    (``conditional_unet_1D_si.py:4-50``)."""

    input_dim: int
    down_dims: Sequence[int] = (256, 512, 512)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(input_dim=self.input_dim, down_dims=self.down_dims,
                  dtype=self.dtype, param_dtype=self.param_dtype)
        self.b_net = ConditionalUnet1D(**kw)
        self.v_net = ConditionalUnet1D(**kw)
        self.s_net = ConditionalUnet1D(**kw)

    def __call__(self, sample, timestep, global_cond):
        """Evaluate all three heads (used for training-loss initialization)."""
        return (
            self.b_net(sample, timestep, global_cond),
            self.v_net(sample, timestep, global_cond),
            self.s_net(sample, timestep, global_cond),
        )

    def apply_b(self, sample, timestep, global_cond):
        return self.b_net(sample, timestep, global_cond)

    def apply_v(self, sample, timestep, global_cond):
        return self.v_net(sample, timestep, global_cond)

    def apply_s(self, sample, timestep, global_cond):
        return self.s_net(sample, timestep, global_cond)
