"""LSTM residual controller: torch parity + step/sequence consistency +
checkpoint roundtrip (the lstm_step_test conformance surface)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from vla_touch_tpu.config import LSTMControllerConfig
from vla_touch_tpu.models.controllers import lstm as L
from vla_touch_tpu.utils import torch_port as tp
from vla_touch_tpu.utils.normalization import normalize_actions

torch.manual_seed(0)

CFG = LSTMControllerConfig(state_dim=10, hidden_dim=64, num_layers=2,
                           force_dim=3, image_model="dinov2-small")


class TorchLSTMController(tnn.Module):
    """Transcription of the reference architecture
    (lstm_step_controller.py:44-96) as a torch oracle."""

    def __init__(self, cfg):
        super().__init__()
        h = cfg.hidden_dim
        self.force_encoder = tnn.Sequential(
            tnn.Linear(cfg.force_dim, h // 2), tnn.GELU(),
            tnn.Linear(h // 2, h // 2))
        self.obs_encoder = tnn.Sequential(
            tnn.Linear(cfg.obs_dim, h), tnn.GELU(),
            tnn.Linear(h, h), tnn.GELU(), tnn.Linear(h, h))
        self.lstm = tnn.LSTM(input_size=h // 2 + cfg.state_dim, hidden_size=h,
                             num_layers=cfg.num_layers, batch_first=True,
                             dropout=0.1)
        self.output_head = tnn.Sequential(
            tnn.Linear(h + h, h), tnn.LayerNorm(h), tnn.GELU(),
            tnn.Dropout(cfg.dropout), tnn.Linear(h, cfg.state_dim))

    def forward(self, obs_cond, vla_n, force_seq):
        f = self.force_encoder(force_seq)
        out, _ = self.lstm(torch.cat([f, vla_n], dim=-1))
        obs = obs_cond.unsqueeze(1).repeat(1, out.shape[1], 1)
        delta = self.output_head(torch.cat([out, obs], dim=-1))
        return vla_n + delta


def _port_params(ref: TorchLSTMController, cfg) -> dict:
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    return {
        "force_fc1": tp.linear(sd["force_encoder.0.weight"], sd["force_encoder.0.bias"]),
        "force_fc2": tp.linear(sd["force_encoder.2.weight"], sd["force_encoder.2.bias"]),
        "obs_fc1": tp.linear(sd["obs_encoder.0.weight"], sd["obs_encoder.0.bias"]),
        "obs_fc2": tp.linear(sd["obs_encoder.2.weight"], sd["obs_encoder.2.bias"]),
        "obs_fc3": tp.linear(sd["obs_encoder.4.weight"], sd["obs_encoder.4.bias"]),
        "lstm": tp.lstm(sd, num_layers=cfg.num_layers, prefix="lstm."),
        "head_fc1": tp.linear(sd["output_head.0.weight"], sd["output_head.0.bias"]),
        "head_norm": tp.layernorm(sd["output_head.1.weight"], sd["output_head.1.bias"]),
        "head_fc2": tp.linear(sd["output_head.4.weight"], sd["output_head.4.bias"]),
    }


def _dummy_stats(d):
    return {
        "vla_mins": np.zeros(d, np.float32), "vla_maxs": np.ones(d, np.float32),
        "action_mins": np.zeros(d, np.float32), "action_maxs": np.ones(d, np.float32),
    }


def test_sequence_forward_matches_torch(rng):
    B, T = 3, 8
    ref = TorchLSTMController(CFG).eval()
    params = _port_params(ref, CFG)
    obs_cond = rng.normal(size=(B, CFG.hidden_dim)).astype(np.float32)
    vla_n = rng.normal(size=(B, T, CFG.state_dim)).astype(np.float32)
    force = rng.normal(size=(B, T, CFG.force_dim)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(obs_cond), torch.from_numpy(vla_n),
                   torch.from_numpy(force)).numpy()
    got = L.LSTMControllerModule(CFG).apply(
        {"params": params}, jnp.asarray(obs_cond), jnp.asarray(vla_n),
        jnp.asarray(force))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_obs_encoder_matches_torch(rng):
    B = 4
    ref = TorchLSTMController(CFG).eval()
    params = _port_params(ref, CFG)
    state = rng.normal(size=(B, CFG.state_dim)).astype(np.float32)
    f1 = rng.normal(size=(B, CFG.visual_dim)).astype(np.float32)
    f2 = rng.normal(size=(B, CFG.visual_dim)).astype(np.float32)
    with torch.no_grad():
        want = ref.obs_encoder(torch.from_numpy(
            np.concatenate([f1, f2, state], -1))).numpy()
    got = L.lstm_encode_obs(CFG, params, jnp.asarray(state), jnp.asarray(f1),
                            jnp.asarray(f2))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_step_matches_sequence_and_denormalization(rng):
    """predict (stateful steps) over T must equal predict_sequence, and the
    output must be denormalize(vla_n + delta) with 'expert' stats."""
    B, T = 2, 6
    st = L.init_lstm_controller(CFG, jax.random.PRNGKey(0))
    stats = _dummy_stats(CFG.state_dim)
    obs_cond = jnp.asarray(rng.normal(size=(B, CFG.hidden_dim)), jnp.float32)
    vla = jnp.asarray(rng.normal(size=(B, T, CFG.state_dim)), jnp.float32)
    force = jnp.asarray(rng.normal(size=(B, T, CFG.force_dim)), jnp.float32)

    seq = L.lstm_predict_sequence(CFG, st.params, stats, obs_cond, vla, force)
    assert seq.shape == (B, T, CFG.state_dim)

    module = L.LSTMControllerModule(CFG)
    carry = module.bind({"params": st.params}).init_carry(B)
    vla_n = normalize_actions(vla, stats, "vla")
    outs = []
    for t in range(T):
        carry, refined = L.lstm_step_predict(
            CFG, st.params, stats, carry, obs_cond, vla_n[:, t], force[:, t])
        outs.append(refined)
    step_out = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(step_out), np.asarray(seq), atol=1e-5)


def test_loss_decreases_under_training(rng):
    """Sanity: a few Adam steps reduce the MSE loss on a fixed batch."""
    import optax

    st = L.init_lstm_controller(CFG, jax.random.PRNGKey(0))
    B, T = 8, 6
    batch = {
        "obs_cond": jnp.asarray(rng.normal(size=(B, CFG.hidden_dim)), jnp.float32),
        "vla_act": jnp.asarray(rng.normal(size=(B, T, CFG.state_dim)), jnp.float32),
        "forces": jnp.asarray(rng.normal(size=(B, T, CFG.force_dim)), jnp.float32),
    }
    batch["expert_act"] = batch["vla_act"] * 1.1 + 0.05

    opt = optax.adam(1e-3)
    opt_state = opt.init(st.params)
    params = st.params

    @jax.jit
    def step(params, opt_state):
        loss, g = jax.value_and_grad(
            lambda p: L.lstm_loss(CFG, p, batch))(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_checkpoint_roundtrip(tmp_path, rng):
    st = L.init_lstm_controller(CFG, jax.random.PRNGKey(1))
    st.stats = _dummy_stats(CFG.state_dim)
    L.save_lstm_controller(str(tmp_path / "ck"), st)
    st2 = L.load_lstm_controller(str(tmp_path / "ck"))
    assert st2.cfg == CFG
    for a, b in zip(jax.tree.leaves(st.params), jax.tree.leaves(st2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    B, T = 2, 4
    obs = jnp.asarray(rng.normal(size=(B, CFG.hidden_dim)), jnp.float32)
    vla = jnp.asarray(rng.normal(size=(B, T, CFG.state_dim)), jnp.float32)
    force = jnp.asarray(rng.normal(size=(B, T, CFG.force_dim)), jnp.float32)
    a = L.lstm_predict_sequence(CFG, st.params, st.stats, obs, vla, force)
    b = L.lstm_predict_sequence(st2.cfg, st2.params, st2.stats, obs, vla, force)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
