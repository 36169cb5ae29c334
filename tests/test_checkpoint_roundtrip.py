"""RDT checkpoint round-trip: reference torch layout <-> our params.

This is the weight-porting fidelity surface (SURVEY hard part #2): a
checkpoint written by :func:`save_rdt_checkpoint` must load into the
reference key layout and back bit-identically, and a reference-layout state
dict (from the torch oracle) must produce identical forwards after the
round trip.
"""

import jax
import numpy as np
import pytest
import torch

from tests.torch_ref.rdt_torch import TorchRDT
from vla_touch_tpu.config import rdt_tiny
from vla_touch_tpu.utils import torch_port as tp

torch.manual_seed(0)
TINY = rdt_tiny()


def _oracle_state_dict():
    m = TINY
    ref = TorchRDT(m.output_dim, m.horizon, m.hidden_size, m.depth,
                   m.num_heads, m.max_lang_cond_len, m.img_cond_len)
    model_sd = {f"model.{k}": v.detach().numpy()
                for k, v in ref.state_dict().items()}
    # Adaptors in reference Sequential layout (mlp2x/mlp2x/mlp3x).
    rng = np.random.default_rng(0)
    h = m.hidden_size
    for name, din, depth in [("lang_adaptor", m.lang_token_dim, 2),
                             ("img_adaptor", m.img_token_dim, 2),
                             ("state_adaptor", m.state_token_dim * 2, 3)]:
        dims = [din] + [h] * depth
        for i in range(depth):
            model_sd[f"{name}.{2 * i}.weight"] = rng.normal(
                size=(dims[i + 1], dims[i])).astype(np.float32)
            model_sd[f"{name}.{2 * i}.bias"] = rng.normal(
                size=(dims[i + 1],)).astype(np.float32)
    return model_sd


def test_roundtrip_bit_identical():
    sd = _oracle_state_dict()
    params = tp.rdt_runner(sd, depth=TINY.depth)
    back = tp.rdt_runner_to_torch(params)
    assert set(back) == set(sd), (
        set(sd) - set(back), set(back) - set(sd))
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_loaded_params_run_forward(rng):
    from vla_touch_tpu.models.rdt.runner import RDTRunnerModule
    import jax.numpy as jnp

    sd = _oracle_state_dict()
    params = tp.rdt_runner(sd, depth=TINY.depth)
    module = RDTRunnerModule(TINY)
    B, Ll = 1, 5
    out = module.apply(
        {"params": params},
        jnp.asarray(rng.normal(size=(B, Ll, TINY.lang_token_dim)), jnp.float32),
        jnp.asarray(rng.normal(size=(B, TINY.img_cond_len,
                                     TINY.img_token_dim)), jnp.float32),
        jnp.asarray(rng.normal(size=(B, TINY.horizon + 1,
                                     TINY.state_token_dim * 2)), jnp.float32),
        jnp.full((B,), 10.0), jnp.zeros((B,), jnp.int32))
    assert out.shape == (B, TINY.horizon, TINY.output_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_safetensors_save_load(tmp_path):
    pytest.importorskip("safetensors")
    sd = _oracle_state_dict()
    params = tp.rdt_runner(sd, depth=TINY.depth)
    path = str(tmp_path / "model.safetensors")
    tp.save_rdt_checkpoint(path, params)
    params2 = tp.load_rdt_checkpoint(path, depth=TINY.depth)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
