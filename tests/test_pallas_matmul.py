"""Pallas int8 matmul kernels (interpret mode): numerics vs the XLA qdense
reference, M-padding, and the VMEM-driven block_n cap for large K."""

import jax.numpy as jnp
import numpy as np
import pytest

from vla_touch_tpu.ops.pallas_matmul import a8w8_matmul, w8a16_matmul
from vla_touch_tpu.ops.quant import qdense, quantize_linear


def _qp(rng, K, N):
    return quantize_linear({
        "kernel": rng.normal(size=(K, N)).astype(np.float32) * 0.05,
        "bias": rng.normal(size=(N,)).astype(np.float32) * 0.01,
    })


@pytest.mark.parametrize("M,K,N", [
    (67, 256, 384),      # RDT serving M (padded to sublane multiple)
    (1, 128, 128),       # minimal
    (67, 8192, 1024),    # large K -> bn capped to 512 (two grid steps)
])
def test_a8w8_matches_xla_qdense(rng, M, K, N):
    qp = _qp(rng, K, N)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    want = qdense(x, qp, out_dtype=jnp.float32)
    got = a8w8_matmul(x, qp["w_i8"], qp["scale"], qp["bias"],
                      out_dtype=jnp.float32, interpret=True)
    assert got.shape == (M, N)
    # Same scheme (per-token dynamic int8 x per-channel int8) -> identical
    # quantized integers; only the dequant-accumulate order differs.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_a8w8_batched_leading_dims(rng):
    qp = _qp(rng, 128, 256)
    x = jnp.asarray(rng.normal(size=(2, 9, 128)), jnp.bfloat16)
    got = a8w8_matmul(x, qp["w_i8"], qp["scale"], qp["bias"],
                      out_dtype=jnp.float32, interpret=True)
    want = qdense(x, qp, out_dtype=jnp.float32)
    assert got.shape == (2, 9, 256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_a8w8_no_bias(rng):
    qp = _qp(rng, 128, 128)
    qp.pop("bias")
    x = jnp.asarray(rng.normal(size=(5, 128)), jnp.bfloat16)
    got = a8w8_matmul(x, qp["w_i8"], qp["scale"], None,
                      out_dtype=jnp.float32, interpret=True)
    want = qdense(x, qp, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_w8a16_weight_only_error_smaller_than_a8w8(rng):
    """w8a16 keeps activations bf16 -> strictly no activation-quant error;
    vs the f32 matmul it must be at least as accurate as the a8w8 scheme."""
    K, N = 256, 512
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.05
    b = rng.normal(size=(N,)).astype(np.float32) * 0.01
    qp = quantize_linear({"kernel": w, "bias": b})
    x = rng.normal(size=(33, K)).astype(np.float32)
    exact = x @ w + b
    # interpret=True not plumbed for w8a16 (it has no scratch); emulate its
    # math: bf16 activation x dequantized-int8 weights.
    got16 = np.asarray(
        jnp.asarray(x, jnp.bfloat16) @
        (jnp.asarray(qp["w_i8"], jnp.bfloat16) *
         jnp.asarray(qp["scale"], jnp.float32)).astype(jnp.bfloat16)
        + b, np.float32)
    got8 = np.asarray(a8w8_matmul(jnp.asarray(x, jnp.bfloat16), qp["w_i8"],
                                  qp["scale"], qp["bias"],
                                  out_dtype=jnp.float32, interpret=True))
    err16 = np.abs(got16 - exact).max()
    err8 = np.abs(got8 - exact).max()
    assert err16 <= err8 * 1.5 + 1e-6, (err16, err8)


def test_a8w8_matmul_large_matches_qdense(rng):
    """The large-M tiled kernel == the XLA int8 path (same integers)."""
    from vla_touch_tpu.ops.pallas_matmul import a8w8_matmul_large
    from vla_touch_tpu.ops.quant import qdense, quantize_linear

    K, N, M = 256, 512, 300
    p = {"kernel": jnp.asarray(rng.normal(size=(K, N)) * 0.05, jnp.float32),
         "bias": jnp.asarray(rng.normal(size=(N,)) * 0.01, jnp.float32)}
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    qp = quantize_linear(p)
    want = qdense(x, qp, out_dtype=jnp.float32)
    got = a8w8_matmul_large(x, qp["w_i8"], qp["scale"], qp["bias"],
                            block_m=128, block_n=256, out_dtype=jnp.float32,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_qdense_w4_large_m_dequant_path(rng):
    """Large-M w4 calls dequantize to bf16 (no (G, M, N) intermediate, no
    activation-quant error) and stay close to the small-M grouped-int path."""
    from vla_touch_tpu.ops.quant import quantize_linear_w4, qdense_w4

    K, N = 256, 128
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.1
    b = rng.normal(size=(N,)).astype(np.float32) * 0.01
    qp = quantize_linear_w4({"kernel": w, "bias": b})
    x_small = jnp.asarray(rng.normal(size=(16, K)), jnp.float32)
    x_big = jnp.concatenate([x_small] * 64, axis=0)          # M=1024 > 512
    y_small = np.asarray(qdense_w4(x_small, qp, out_dtype=jnp.float32))
    y_big = np.asarray(qdense_w4(x_big, qp, out_dtype=jnp.float32))[:16]
    # both approximate the same dequantized-weight product; they differ only
    # by the small path's activation quantization
    rel = np.linalg.norm(y_big - y_small) / np.linalg.norm(y_small)
    assert rel < 0.05, rel
