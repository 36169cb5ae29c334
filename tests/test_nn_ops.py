"""NN building-block parity vs torch layers configured like the reference."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from vla_touch_tpu.ops import nn as vnn
from vla_touch_tpu.utils import torch_port as tp

torch.manual_seed(0)


def _np(t):
    return t.detach().numpy()


def test_rmsnorm_matches_torch(rng):
    x = rng.normal(size=(2, 5, 64)).astype(np.float32)
    ref = tnn.RMSNorm(64, eps=1e-6)
    with torch.no_grad():
        ref.weight.copy_(torch.randn(64))
    got = vnn.RmsNorm().apply(
        {"params": tp.rmsnorm(_np(ref.weight))}, jnp.asarray(x)
    )
    want = _np(ref(torch.from_numpy(x)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_gelu_tanh_and_mish(rng):
    x = rng.normal(size=(64,)).astype(np.float32) * 3
    np.testing.assert_allclose(
        np.asarray(vnn.gelu_tanh(jnp.asarray(x))),
        _np(tnn.GELU(approximate="tanh")(torch.from_numpy(x))),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(vnn.mish(jnp.asarray(x))),
        _np(tnn.Mish()(torch.from_numpy(x))),
        atol=1e-6,
    )


def test_mlp_matches_torch(rng):
    x = rng.normal(size=(3, 7, 32)).astype(np.float32)
    fc1 = tnn.Linear(32, 64)
    fc2 = tnn.Linear(64, 16)
    ref = tnn.Sequential(fc1, tnn.GELU(approximate="tanh"), fc2)
    params = {
        "fc1": tp.linear(_np(fc1.weight), _np(fc1.bias)),
        "fc2": tp.linear(_np(fc2.weight), _np(fc2.bias)),
    }
    got = vnn.Mlp(hidden_features=64, out_features=16).apply(
        {"params": params}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got), _np(ref(torch.from_numpy(x))),
                               atol=1e-5)


class _TorchTimmAttention(tnn.Module):
    """Independent transcription of timm Attention with qk RmsNorm
    (the configuration at blocks.py:151-154)."""

    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim ** -0.5
        self.qkv = tnn.Linear(dim, dim * 3, bias=True)
        self.q_norm = tnn.RMSNorm(self.head_dim, eps=1e-6)
        self.k_norm = tnn.RMSNorm(self.head_dim, eps=1e-6)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, self.head_dim)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        q, k = self.q_norm(q), self.k_norm(k)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


def test_self_attention_matches_torch(rng):
    dim, heads = 64, 4
    x = rng.normal(size=(2, 9, dim)).astype(np.float32)
    ref = _TorchTimmAttention(dim, heads)
    sd = {k: _np(v) for k, v in ref.state_dict().items()}
    params = tp.timm_attention(sd)
    got = vnn.SelfAttention(num_heads=heads).apply(
        {"params": params}, jnp.asarray(x)
    )
    with torch.no_grad():
        want = _np(ref(torch.from_numpy(x)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


class _TorchCrossAttention(tnn.Module):
    """Transcription of blocks.py:72-138 (qkv_bias=True, qk_norm=True)."""

    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim ** -0.5
        self.q = tnn.Linear(dim, dim, bias=True)
        self.kv = tnn.Linear(dim, dim * 2, bias=True)
        self.q_norm = tnn.RMSNorm(self.head_dim, eps=1e-6)
        self.k_norm = tnn.RMSNorm(self.head_dim, eps=1e-6)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x, c, mask=None):
        B, N, C = x.shape
        _, L, _ = c.shape
        q = self.q(x).reshape(B, N, self.num_heads, self.head_dim).permute(0, 2, 1, 3)
        kv = self.kv(c).reshape(B, L, 2, self.num_heads, self.head_dim)
        kv = kv.permute(2, 0, 3, 1, 4)
        k, v = kv.unbind(0)
        q, k = self.q_norm(q), self.k_norm(k)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        if mask is not None:
            attn = attn.masked_fill(
                ~mask.reshape(B, 1, 1, L), float("-inf")
            )
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


def test_cross_attention_matches_torch_with_ragged_mask(rng):
    dim, heads = 64, 4
    x = rng.normal(size=(2, 7, dim)).astype(np.float32)
    c = rng.normal(size=(2, 13, dim)).astype(np.float32)
    mask = np.ones((2, 13), bool)
    mask[0, 5:] = False
    mask[1, 11:] = False
    ref = _TorchCrossAttention(dim, heads)
    sd = {k: _np(v) for k, v in ref.state_dict().items()}
    params = tp.cross_attention(sd)
    got = vnn.CrossAttention(num_heads=heads).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(c), jnp.asarray(mask)
    )
    with torch.no_grad():
        want = _np(ref(torch.from_numpy(x), torch.from_numpy(c),
                       torch.from_numpy(mask)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_groupnorm_matches_torch(rng):
    # torch GroupNorm works on (B, C, T); ours on (B, T, C).
    x = rng.normal(size=(2, 16, 24)).astype(np.float32)  # (B, T, C)
    ref = tnn.GroupNorm(8, 24)
    with torch.no_grad():
        ref.weight.copy_(torch.randn(24))
        ref.bias.copy_(torch.randn(24))
    want = _np(ref(torch.from_numpy(x).transpose(1, 2))).transpose(0, 2, 1)
    got = vnn.GroupNorm(num_groups=8).apply(
        {"params": tp.groupnorm(_np(ref.weight), _np(ref.bias))}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_conv1d_matches_torch(rng):
    for k, s, p in [(5, 1, 2), (3, 2, 1), (1, 1, 0)]:
        x = rng.normal(size=(2, 16, 6)).astype(np.float32)  # (B, T, C)
        ref = tnn.Conv1d(6, 10, k, s, p)
        want = _np(ref(torch.from_numpy(x).transpose(1, 2))).transpose(0, 2, 1)
        got = vnn.Conv1d(features=10, kernel_size=k, stride=s, padding=p).apply(
            {"params": {"conv": tp.conv1d(_np(ref.weight), _np(ref.bias))}},
            jnp.asarray(x),
        )
        assert got.shape == want.shape, (k, s, p)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_conv_transpose1d_matches_torch(rng):
    x = rng.normal(size=(2, 8, 6)).astype(np.float32)
    ref = tnn.ConvTranspose1d(6, 10, 4, 2, 1)
    want = _np(ref(torch.from_numpy(x).transpose(1, 2))).transpose(0, 2, 1)
    got = vnn.ConvTranspose1d(features=10, kernel_size=4, stride=2, padding=1).apply(
        {"params": {"conv": tp.conv_transpose1d(_np(ref.weight), _np(ref.bias))}},
        jnp.asarray(x),
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_stacked_lstm_matches_torch(rng):
    B, T, D, H, L = 3, 11, 8, 16, 2
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    ref = tnn.LSTM(input_size=D, hidden_size=H, num_layers=L,
                   batch_first=True, bidirectional=False)
    sd = {k: _np(v) for k, v in ref.state_dict().items()}
    params = tp.lstm(sd, num_layers=L)
    model = vnn.StackedLSTM(hidden_size=H, num_layers=L)
    ys, carry = model.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        want, (hn, cn) = ref(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ys), _np(want), atol=1e-5)
    # Final hidden state of the last layer matches too.
    np.testing.assert_allclose(np.asarray(carry[-1][0]), _np(hn[-1]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(carry[-1][1]), _np(cn[-1]), atol=1e-5)


def test_lstm_step_equals_sequence(rng):
    """Stateful single-step application must reproduce the sequence result
    (the control loop depends on this, lstm_step_controller.py:232-286)."""
    B, T, D, H, L = 2, 6, 8, 16, 2
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    model = vnn.StackedLSTM(hidden_size=H, num_layers=L)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    ys_seq, _ = model.apply({"params": params}, jnp.asarray(x))
    carry = model.init_carry(B)
    outs = []
    for t in range(T):
        carry, y = model.apply({"params": params}, carry, jnp.asarray(x[:, t]),
                               method=vnn.StackedLSTM.step_fn)
        outs.append(y)
    np.testing.assert_allclose(
        np.asarray(jnp.stack(outs, axis=1)), np.asarray(ys_seq), atol=1e-6
    )


def test_pallas_attention_matches_xla_interpret(rng):
    """Flash kernel (interpreter mode on CPU) vs the einsum path."""
    from vla_touch_tpu.ops import pallas_attention as pa
    from vla_touch_tpu.ops.attention import _attention_xla
    import jax.experimental.pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    B, Lq, Lkv, H, D = 2, 35, 300, 4, 72
    q = jnp.asarray(rng.normal(size=(B, Lq, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Lkv, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Lkv, H, D)), jnp.float32)
    mask = np.ones((B, Lkv), bool)
    mask[0, 100:] = False
    mask = jnp.asarray(mask)

    ref = _attention_xla(q, k, v, kv_mask=mask)
    with pltpu.force_tpu_interpret_mode():
        got = pa.flash_cross_attention(q, k, v, kv_mask=mask, block_kv=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pallas_attention_q8_matches_dequantized_xla(rng):
    """int8-KV flash kernel (interpret mode) vs the einsum path on the
    DEQUANTIZED cache: identical math, so agreement is tight; vs the f32
    cache the only error is int8 rounding."""
    from vla_touch_tpu.ops import pallas_attention as pa
    from vla_touch_tpu.ops.attention import _attention_xla
    from jax.experimental.pallas import tpu as pltpu

    B, Lq, Lkv, H, D = 1, 35, 300, 4, 64
    q = jnp.asarray(rng.normal(size=(B, Lq, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Lkv, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Lkv, H, D)), jnp.float32)
    mask = np.ones((B, Lkv), bool)
    mask[0, 250:] = False
    mask = jnp.asarray(mask)

    k_i8, sk, v_i8, sv = pa.quantize_kv(k, v)
    assert k_i8.dtype == jnp.int8 and sk.shape == (B, H, D)
    k_dq = k_i8.astype(jnp.float32) * sk[:, None]
    v_dq = v_i8.astype(jnp.float32) * sv[:, None]
    ref_dq = _attention_xla(q, k_dq, v_dq, kv_mask=mask)
    ref_f32 = _attention_xla(q, k, v, kv_mask=mask)

    with pltpu.force_tpu_interpret_mode():
        got = pa.flash_cross_attention_q8(q, k_i8, sk, v_i8, sv,
                                          kv_mask=mask, block_kv=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_dq),
                               atol=5e-3)
    # int8 rounding error vs the unquantized cache stays small
    err = np.abs(np.asarray(got) - np.asarray(ref_f32)).max()
    assert err < 0.05, err


def test_pallas_attention_q8t_matches_dequantized_xla(rng):
    """Transposed-layout int8-KV kernel (D on sublanes, KV length on lanes)
    vs the einsum path on the dequantized cache."""
    from vla_touch_tpu.ops import pallas_attention as pa
    from vla_touch_tpu.ops.attention import _attention_xla
    from jax.experimental.pallas import tpu as pltpu

    B, Lq, Lkv, H, D = 1, 35, 300, 4, 64
    q = jnp.asarray(rng.normal(size=(B, Lq, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Lkv, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Lkv, H, D)), jnp.float32)
    mask = np.ones((B, Lkv), bool)
    mask[0, 250:] = False
    mask = jnp.asarray(mask)

    k_t, sk, v_t, sv = pa.quantize_kv_t(k, v)
    assert k_t.shape == (B, H, D, Lkv) and k_t.dtype == jnp.int8
    k_dq = jnp.transpose(k_t.astype(jnp.float32), (0, 3, 1, 2)) * sk[:, None]
    v_dq = jnp.transpose(v_t.astype(jnp.float32), (0, 3, 1, 2)) * sv[:, None]
    ref_dq = _attention_xla(q, k_dq, v_dq, kv_mask=mask)
    ref_f32 = _attention_xla(q, k, v, kv_mask=mask)

    with pltpu.force_tpu_interpret_mode():
        got = pa.flash_cross_attention_q8t(q, k_t, sk, v_t, sv,
                                           kv_mask=mask, block_kv=128)
    assert got.shape == q.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_dq),
                               atol=5e-3)
    err = np.abs(np.asarray(got) - np.asarray(ref_f32)).max()
    assert err < 0.05, err


def test_attention_head_chunking_matches_dense(rng):
    """The head-chunked serving path (B>1 score-tile fix) must equal the
    dense path exactly, including ragged kv masks."""
    from vla_touch_tpu.ops.attention import _attention_xla

    B, Lq, Lkv, H, D = 2, 9, 33, 8, 16
    q = jnp.asarray(rng.normal(size=(B, Lq, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Lkv, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Lkv, H, D)), jnp.float32)
    mask = np.ones((B, Lkv), bool)
    mask[0, 20:] = False
    mask[1, 5:] = False
    mask = jnp.asarray(mask)

    dense = _attention_xla(q, k, v, kv_mask=mask, head_groups=1)
    for g in (2, 4, 8):
        chunked = _attention_xla(q, k, v, kv_mask=mask, head_groups=g)
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense),
                                   atol=1e-6, rtol=1e-6)


def test_attention_head_group_policy():
    """Auto policy: B=1 at the RDT-1B serving shape stays dense (37.5 MB
    tile, preserving the measured fused regime); B=4 (150 MB) chunks into
    2 groups; group count always divides H."""
    from vla_touch_tpu.ops.attention import _head_groups

    assert _head_groups(1, 32, 67, 4374) == 1
    assert _head_groups(2, 32, 67, 4374) == 1      # 75 MB still fuses
    assert _head_groups(4, 32, 67, 4374) == 2
    assert _head_groups(8, 32, 67, 4374) == 4
    # non-power-of-two head counts round up to a divisor of H, and the
    # per-group tile always lands within the budget
    g = _head_groups(8, 12, 67, 4374)
    assert 12 % g == 0
    assert (8 * 12 * 67 * 4374 * 4) / g <= 80 * 1024 * 1024
    # training regime (B > 8): policy stays dense — the chunked program
    # is only measured for serving batches
    assert _head_groups(16, 12, 67, 4374) == 1
    assert _head_groups(64, 32, 67, 4374) == 1
