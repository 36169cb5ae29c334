"""UNet-1D parity vs the torch oracle + interpolants math tests."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from tests.torch_ref.unet1d_torch import TorchConditionalUnet1D
from vla_touch_tpu.models.controllers.unet1d import ConditionalUnet1D, SITripleUnet
from vla_touch_tpu.utils import torch_port as tp

torch.manual_seed(0)


def test_unet1d_parity_si_config(rng):
    """The BRIDGeR configuration: input_dim=10, cond=256, down_dims=(256,512,512)."""
    B, T, D, G = 2, 16, 10, 256
    down_dims = (256, 512, 512)
    ref = TorchConditionalUnet1D(D, G, down_dims=down_dims)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = tp.unet1d(sd, num_levels=len(down_dims))

    model = ConditionalUnet1D(input_dim=D, down_dims=down_dims)
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    cond = rng.normal(size=(B, G)).astype(np.float32)
    t = np.array([0.3, 0.7], np.float32)

    got = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                      jnp.asarray(cond))
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(t),
                   torch.from_numpy(cond)).numpy()
    assert got.shape == want.shape == (B, T, D)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-4)


def test_unet1d_param_count_matches_torch():
    down_dims = (256, 512, 512)
    ref = TorchConditionalUnet1D(10, 256, down_dims=down_dims)
    n_torch = sum(p.numel() for p in ref.parameters())
    model = ConditionalUnet1D(input_dim=10, down_dims=down_dims)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 10)),
                        jnp.zeros((1,)), jnp.zeros((1, 256)))["params"]
    n_jax = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert n_jax == n_torch


def test_si_triple_unet_heads_are_independent(rng):
    model = SITripleUnet(input_dim=4, down_dims=(32, 64))
    x = jnp.asarray(rng.normal(size=(2, 8, 4)), jnp.float32)
    t = jnp.asarray([0.5, 0.5], jnp.float32)
    c = jnp.asarray(rng.normal(size=(2, 16)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, t, c)["params"]
    b, v, s = model.apply({"params": params}, x, t, c)
    assert b.shape == v.shape == s.shape == x.shape
    # Different random inits -> heads differ.
    assert not np.allclose(np.asarray(b), np.asarray(v))
    # Per-head application matches the bundle.
    v2 = model.apply({"params": params}, x, t, c, method=SITripleUnet.apply_v)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))
