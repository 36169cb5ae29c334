"""Fused UNet-1D residual-block kernel: parity vs the flax block."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_touch_tpu.models.controllers.unet1d import (
    ConditionalResidualBlock1D)
from vla_touch_tpu.ops.pallas_unet import resblock_fused, resblock_ref


def _init_block(key, B, T, Cin, C, G, k=5):
    block = ConditionalResidualBlock1D(C, kernel_size=k)
    x = jax.random.normal(key, (B, T, Cin), jnp.float32)
    cond = jax.random.normal(jax.random.fold_in(key, 1), (B, G), jnp.float32)
    params = block.init(jax.random.fold_in(key, 2), x, cond)["params"]
    return block, params, x, cond


@pytest.mark.parametrize("B,T,Cin,C", [(1, 16, 10, 64), (2, 16, 64, 64),
                                       (2, 8, 96, 64), (1, 4, 64, 32)])
def test_resblock_fused_matches_flax(B, T, Cin, C):
    block, params, x, cond = _init_block(jax.random.PRNGKey(0), B, T, Cin,
                                         C, 48)
    want = block.apply({"params": params}, x, cond)
    got = resblock_fused(x, cond, params, interpret=True,
                         out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=2e-2)
    # the XLA reference twin is the exact flax math
    ref = resblock_ref(x, cond, params)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_resblock_fused_stacked_matches_vmap(rng):
    """Stacked v/s networks via the grid axis == vmap over param stacks."""
    key = jax.random.PRNGKey(3)
    _, p1, x, cond = _init_block(key, 2, 16, 64, 64, 48)
    _, p2, _, _ = _init_block(jax.random.PRNGKey(4), 2, 16, 64, 64, 48)
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), p1, p2)
    got = resblock_fused(x, cond, stacked, interpret=True,
                         out_dtype=jnp.float32)
    want = resblock_ref(x, cond, stacked)
    assert got.shape == (2, 2, 16, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=2e-2)


def test_resblock_fused_no_residual_conv():
    """Cin == C drops the 1x1 residual conv (identity residual)."""
    block, params, x, cond = _init_block(jax.random.PRNGKey(5), 1, 16, 64,
                                         64, 32)
    assert "residual_conv" not in params
    want = block.apply({"params": params}, x, cond)
    got = resblock_fused(x, cond, params, interpret=True,
                         out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=2e-2)


def _stacked_unet(key, input_dim=10, down_dims=(32, 64, 64), B=2, T=16,
                  G=48):
    from vla_touch_tpu.models.controllers.unet1d import ConditionalUnet1D

    unet = ConditionalUnet1D(input_dim=input_dim, down_dims=down_dims,
                             dtype=jnp.float32)
    x = jax.random.normal(key, (B, T, input_dim), jnp.float32)
    t = jnp.asarray([0.3, 0.7])[:B]
    cond = jax.random.normal(jax.random.fold_in(key, 1), (B, G), jnp.float32)
    p1 = unet.init(jax.random.fold_in(key, 2), x, t, cond)["params"]
    p2 = unet.init(jax.random.fold_in(key, 3), x, t, cond)["params"]
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), p1, p2)
    return unet, (p1, p2), stacked, x, t, cond


def test_unet_serve_matches_flax():
    """The serving mirror (fused=False, f32) reproduces the flax module
    per stacked network exactly-ish; fused interpret mode within kernel
    tolerance."""
    from vla_touch_tpu.models.controllers import unet1d_serve as US

    unet, (p1, p2), stacked, x, t, cond = _stacked_unet(jax.random.PRNGKey(0))
    want = jnp.stack([unet.apply({"params": p1}, x, t, cond),
                      unet.apply({"params": p2}, x, t, cond)])
    got = US.unet_forward_stacked(stacked, x, t, cond,
                                  down_dims=(32, 64, 64),
                                  dtype=jnp.float32, fused=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    got_f = US.unet_forward_stacked(stacked, x, t, cond,
                                    down_dims=(32, 64, 64),
                                    dtype=jnp.float32, fused=True,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want),
                               atol=5e-2, rtol=5e-2)
