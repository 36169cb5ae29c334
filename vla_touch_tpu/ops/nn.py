"""Core neural-net building blocks as flax.linen modules.

TPU-native equivalents of the compiled-library primitives the reference
consumes (SURVEY.md §2.8): timm ``Attention``/``Mlp``/``RmsNorm`` and the
masked ``CrossAttention`` of ``/root/reference/VLA/models/rdt/blocks.py``,
plus the Conv1d/GroupNorm/Mish blocks of the controller UNet
(``conditional_unet_1D.py:22-105``) and an ``lax.scan`` LSTM
(``lstm_step_controller.py:66-73``).

Conventions:

- ``param_dtype`` holds master weights (default float32); ``dtype`` is the
  compute/activation dtype (bfloat16 on TPU for the big models).
- Normalization statistics are always accumulated in float32 regardless of
  compute dtype.
- Parameter names mirror the torch module names (``qkv``, ``proj``, ``fc1``…)
  so checkpoint porting is a pure key-prefix rewrite.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn

from vla_touch_tpu.ops.attention import dot_product_attention


def gelu_tanh(x):
    """GELU with tanh approximation — matches ``nn.GELU(approximate='tanh')``."""
    return fnn.gelu(x, approximate=True)


def mish(x):
    """Mish activation: x * tanh(softplus(x)) — matches ``nn.Mish``."""
    return x * jnp.tanh(jax.nn.softplus(x))


class RmsNorm(fnn.Module):
    """RMSNorm with learnable scale (timm ``RmsNorm`` semantics).

    y = x / sqrt(mean(x^2) + eps) * weight, statistics in float32.
    """

    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        weight = self.param("weight", fnn.initializers.ones, (dim,), self.param_dtype)
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + self.eps)
        return (y * weight.astype(jnp.float32)).astype(self.dtype)


class Mlp(fnn.Module):
    """timm-style MLP: fc1 -> act -> fc2 (both with bias).

    ``zero_init_output`` zero-initializes fc2 (the DiT final-layer
    convention, reference ``model.py:119-121``).
    """

    hidden_features: int
    out_features: Optional[int] = None
    act: Callable = gelu_tanh
    zero_init_output: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x):
        out_dim = self.out_features or x.shape[-1]
        x = fnn.Dense(self.hidden_features, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="fc1")(x)
        x = self.act(x)
        kernel_init = (fnn.initializers.zeros if self.zero_init_output
                       else fnn.linear.default_kernel_init)
        x = fnn.Dense(out_dim, dtype=self.dtype, kernel_init=kernel_init,
                      param_dtype=self.param_dtype, name="fc2")(x)
        return x


class SelfAttention(fnn.Module):
    """timm ``Attention``-equivalent: fused qkv, optional per-head qk RMSNorm.

    Reference: ``blocks.py:151-154`` (qkv_bias=True, qk_norm=True,
    norm_layer=RmsNorm).
    """

    num_heads: int
    qkv_bias: bool = True
    qk_norm: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x):
        B, N, C = x.shape
        assert C % self.num_heads == 0
        head_dim = C // self.num_heads
        qkv = fnn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, D)
        if self.qk_norm:
            q = RmsNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                        name="q_norm")(q)
            k = RmsNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                        name="k_norm")(k)
        out = dot_product_attention(q, k, v)  # (B, N, H, D)
        out = out.reshape(B, N, C)
        return fnn.Dense(C, dtype=self.dtype, param_dtype=self.param_dtype,
                         name="proj")(out)


class CrossAttention(fnn.Module):
    """Masked cross-attention: queries from x, keys/values from condition c.

    Reference: ``blocks.py:72-138`` — separate ``q`` and fused ``kv``
    projections, per-head qk RMSNorm, boolean KV mask (True = valid).
    """

    num_heads: int
    qkv_bias: bool = True
    qk_norm: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x, c, mask=None):
        B, N, C = x.shape
        L = c.shape[1]
        head_dim = C // self.num_heads
        q = fnn.Dense(C, use_bias=self.qkv_bias, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="q")(x)
        kv = fnn.Dense(2 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="kv")(c)
        q = q.reshape(B, N, self.num_heads, head_dim)
        kv = kv.reshape(B, L, 2, self.num_heads, head_dim)
        k, v = kv[:, :, 0], kv[:, :, 1]
        if self.qk_norm:
            q = RmsNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                        name="q_norm")(q)
            k = RmsNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                        name="k_norm")(k)
        out = dot_product_attention(q, k, v, kv_mask=mask)
        out = out.reshape(B, N, C)
        return fnn.Dense(C, dtype=self.dtype, param_dtype=self.param_dtype,
                         name="proj")(out)


class GroupNorm(fnn.Module):
    """GroupNorm over channels-last input (..., C), torch semantics."""

    num_groups: int = 8
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x):
        # x: (B, T, C). Normalize each group over (T, C/G) jointly, matching
        # torch.nn.GroupNorm on (B, C, T).
        B, T, C = x.shape
        G = self.num_groups
        assert C % G == 0
        weight = self.param("weight", fnn.initializers.ones, (C,), self.param_dtype)
        bias = self.param("bias", fnn.initializers.zeros, (C,), self.param_dtype)
        xf = x.astype(jnp.float32).reshape(B, T, G, C // G)
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.var(xf, axis=(1, 3), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y.reshape(B, T, C)
        y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(self.dtype)


class Conv1d(fnn.Module):
    """1-D convolution on channels-last (B, T, C) input, torch-compatible.

    ``stride``/``padding`` follow ``torch.nn.Conv1d`` conventions.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    impl: str = "auto"    # "taps" = one tap-stacked matmul, "lax" = XLA conv

    @fnn.compact
    def __call__(self, x):
        # The controller UNets run on tiny tensors (B<=4, T<=16, C<=512):
        # XLA's conv lowering at those shapes emits several kernels per
        # conv and the 10-step SDE becomes kernel-latency bound.  The
        # tap-stacked form gathers the k shifted views once (layout ops
        # that fuse) and runs ONE (B*T, k*Cin) x (k*Cin, F) MXU matmul —
        # identical math, same parameter tree ("conv"/kernel of shape
        # (k, Cin, F), the fnn.Conv convention).
        use_taps = self.impl == "taps" or (
            self.impl == "auto" and x.shape[1] <= 64)
        if use_taps:
            return _TapConv1d(
                features=self.features, kernel_size=self.kernel_size,
                stride=self.stride, padding=self.padding,
                use_bias=self.use_bias, dtype=self.dtype,
                param_dtype=self.param_dtype, name="conv")(x)
        return fnn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)


class _TapConv1d(fnn.Module):
    """fnn.Conv-compatible 1-D conv computed as one tap-stacked matmul.

    Parameter names, shapes and initializers match ``fnn.Conv`` exactly
    (kernel (k, Cin, F) lecun-normal, bias (F,) zeros), so checkpoints and
    torch ports are interchangeable between the two implementations."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        Cin = x.shape[-1]
        kernel = self.param("kernel", fnn.initializers.lecun_normal(),
                            (k, Cin, self.features), self.param_dtype)
        xp = jnp.pad(x, ((0, 0), (self.padding, self.padding), (0, 0)))
        T_out = (xp.shape[1] - k) // s + 1
        if k == 1 and s == 1:
            xt = xp
        else:
            taps = [xp[:, d: d + (T_out - 1) * s + 1: s] for d in range(k)]
            xt = jnp.concatenate(taps, axis=-1)          # (B, T_out, k*Cin)
        w = kernel.astype(self.dtype).reshape(k * Cin, self.features)
        y = xt.astype(self.dtype) @ w
        if self.use_bias:
            bias = self.param("bias", fnn.initializers.zeros,
                              (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        return y


class ConvTranspose1d(fnn.Module):
    """Transposed 1-D convolution matching ``torch.nn.ConvTranspose1d``
    (kernel 4, stride 2, padding 1 doubles the length)."""

    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x):
        # torch output length: (T-1)*stride - 2*padding + kernel_size.
        # flax ConvTranspose with padding=((p0, p1),) pads the *output*; torch's
        # `padding` removes rows. Use explicit equivalent padding.
        pad = self.kernel_size - 1 - self.padding
        y = fnn.ConvTranspose(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=[(pad, pad)],
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        # flax/torch length bookkeeping differs by stride-1 rows at the end.
        expected = (x.shape[1] - 1) * self.stride - 2 * self.padding + self.kernel_size
        return y[:, :expected, :]


class LSTMCellTorch(fnn.Module):
    """A single LSTM cell with torch gate ordering (i, f, g, o) and
    torch-style double bias (b_ih + b_hh), so reference checkpoints port 1:1.

    Carry is (h, c); input x: (B, input_dim).
    """

    hidden_size: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, carry, x):
        h_prev, c_prev = carry
        H = self.hidden_size
        gates = (
            fnn.Dense(4 * H, dtype=self.dtype, param_dtype=self.param_dtype,
                      name="ih")(x)
            + fnn.Dense(4 * H, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="hh")(h_prev)
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = fnn.sigmoid(i), fnn.sigmoid(f), fnn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c_prev + i * g
        h = o * jnp.tanh(c)
        return (h, c), h


class StackedLSTM(fnn.Module):
    """Multi-layer unidirectional LSTM over a sequence, as ``lax.scan``.

    Equivalent to ``torch.nn.LSTM(batch_first=True, bidirectional=False)``
    at inference (dropout between layers is train-only in torch and the
    reference runs eval for prediction).  Also exposes single-step
    application for the stateful control loop.
    """

    hidden_size: int
    num_layers: int = 2
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.cells = [
            LSTMCellTorch(self.hidden_size, dtype=self.dtype,
                          param_dtype=self.param_dtype, name=f"layer{i}")
            for i in range(self.num_layers)
        ]

    def init_carry(self, batch: int):
        zeros = jnp.zeros((batch, self.hidden_size), self.dtype)
        return tuple((zeros, zeros) for _ in range(self.num_layers))

    def __call__(self, xs, carry=None):
        """xs: (B, T, D) -> (ys (B, T, H), final carry)."""
        B = xs.shape[0]
        if carry is None:
            carry = self.init_carry(B)
        # scan over time: move T to leading axis.
        xs_t = jnp.swapaxes(xs, 0, 1)
        carry, ys = fnn.scan(
            lambda mdl, c, x: mdl.step_fn(c, x),
            variable_broadcast="params",
            split_rngs={"params": False},
        )(self, carry, xs_t)
        return jnp.swapaxes(ys, 0, 1), carry

    def step_fn(self, carry, x_t):
        """One time step through all layers. carry: tuple of (h, c) pairs."""
        new_carry = []
        inp = x_t
        for cell, layer_carry in zip(self.cells, carry):
            layer_carry, inp = cell(layer_carry, inp)
            new_carry.append(layer_carry)
        return tuple(new_carry), inp
