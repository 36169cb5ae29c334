"""Tactile LSTM residual controller.

TPU-native equivalent of
``/root/reference/VLA/residual_controller/lstm_step_controller.py``: a force
MLP encoder, an observation MLP over [DinoV2 CLS x2, state], a 2-layer
unidirectional LSTM over [force_emb ⊕ normalized VLA action], and an output
head on [lstm_out ⊕ obs_cond] predicting a residual delta.

Two execution modes mirror the reference:

- training/sequence: full chunk through ``lax.scan``
  (reference ``forward``/``predict_sequence``);
- stateful single step for the control loop, carrying (h, c) in HBM between
  ticks (reference ``predict`` :232-286) — the carry is an explicit pytree,
  so no retracing across ticks.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn

from vla_touch_tpu.config import LSTMControllerConfig
from vla_touch_tpu.ops.nn import StackedLSTM
from vla_touch_tpu.utils import checkpoint as ckpt
from vla_touch_tpu.utils.normalization import denormalize_actions, normalize_actions


class LSTMControllerModule(fnn.Module):
    cfg: LSTMControllerConfig
    dtype: jnp.dtype = jnp.float32
    deterministic: bool = True  # disables dropout (eval mode)

    def setup(self):
        h = self.cfg.hidden_dim
        self.force_fc1 = fnn.Dense(h // 2, dtype=self.dtype)
        self.force_fc2 = fnn.Dense(h // 2, dtype=self.dtype)
        self.obs_fc1 = fnn.Dense(h, dtype=self.dtype)
        self.obs_fc2 = fnn.Dense(h, dtype=self.dtype)
        self.obs_fc3 = fnn.Dense(h, dtype=self.dtype)
        self.lstm = StackedLSTM(hidden_size=h, num_layers=self.cfg.num_layers,
                                dtype=self.dtype)
        self.head_fc1 = fnn.Dense(h, dtype=self.dtype)
        self.head_norm = fnn.LayerNorm(dtype=self.dtype)
        self.head_drop = fnn.Dropout(rate=self.cfg.dropout)
        self.head_fc2 = fnn.Dense(self.cfg.state_dim, dtype=self.dtype)

    def encode_force(self, force):
        x = self.force_fc1(force)
        x = fnn.gelu(x, approximate=False)
        return self.force_fc2(x)

    def encode_obs(self, state, cam1_feat, cam2_feat):
        x = jnp.concatenate([cam1_feat, cam2_feat, state], axis=-1)
        x = fnn.gelu(self.obs_fc1(x), approximate=False)
        x = fnn.gelu(self.obs_fc2(x), approximate=False)
        return self.obs_fc3(x)

    def _head(self, lstm_out, obs_cond):
        x = jnp.concatenate([lstm_out, obs_cond], axis=-1)
        x = self.head_fc1(x)
        x = self.head_norm(x)
        x = fnn.gelu(x, approximate=False)
        x = self.head_drop(x, deterministic=self.deterministic)
        return self.head_fc2(x)

    def __call__(self, obs_cond, vla_actions_n, force_seq):
        """Sequence mode (training): returns refined *normalized* actions.

        obs_cond (B, H); vla_actions_n (B, T, D) already normalized;
        force_seq (B, T, force_dim).  Mirrors ``forward`` (:170-213).
        """
        f_emb = self.encode_force(force_seq)              # (B, T, h/2)
        lstm_in = jnp.concatenate([f_emb, vla_actions_n], axis=-1)
        lstm_out, _ = self.lstm(lstm_in)                  # (B, T, h)
        obs_b = jnp.broadcast_to(obs_cond[:, None, :],
                                 lstm_out.shape[:2] + obs_cond.shape[-1:])
        delta = self._head(lstm_out, obs_b)
        return vla_actions_n + delta

    def init_carry(self, batch: int):
        return self.lstm.init_carry(batch)

    def init_all(self, state, cam1_feat, cam2_feat, vla_actions_n, force_seq):
        """Touch every submodule once so ``init`` creates all parameters."""
        obs_cond = self.encode_obs(state, cam1_feat, cam2_feat)
        return self(obs_cond, vla_actions_n, force_seq)

    def step(self, carry, vla_action_n, force, obs_cond):
        """One control tick: (carry, action_n (B,D), force (B,F), obs (B,h))
        -> (new_carry, refined normalized action)."""
        f_emb = self.encode_force(force)
        lstm_in = jnp.concatenate([f_emb, vla_action_n], axis=-1)
        carry, lstm_out = self.lstm.step_fn(carry, lstm_in)
        delta = self._head(lstm_out, obs_cond)
        return carry, vla_action_n + delta


@dataclasses.dataclass
class LSTMControllerState:
    cfg: LSTMControllerConfig
    params: dict
    stats: Optional[dict] = None


def init_lstm_controller(cfg: LSTMControllerConfig, key) -> LSTMControllerState:
    module = LSTMControllerModule(cfg)
    B, T = 1, 4
    variables = module.init(
        {"params": key},
        jnp.zeros((B, cfg.state_dim)),
        jnp.zeros((B, cfg.visual_dim)),
        jnp.zeros((B, cfg.visual_dim)),
        jnp.zeros((B, T, cfg.state_dim)),
        jnp.zeros((B, T, cfg.force_dim)),
        method=LSTMControllerModule.init_all,
    )
    return LSTMControllerState(cfg=cfg, params=variables["params"])


@partial(jax.jit, static_argnames=("cfg",))
def lstm_encode_obs(cfg: LSTMControllerConfig, params, state, cam1_feat, cam2_feat):
    return LSTMControllerModule(cfg).apply(
        {"params": params}, state, cam1_feat, cam2_feat,
        method=LSTMControllerModule.encode_obs)


@partial(jax.jit, static_argnames=("cfg",))
def lstm_step_predict(cfg: LSTMControllerConfig, params, stats, carry,
                      obs_cond, vla_action_n, force):
    """Stateful single-step refinement, denormalized output
    (reference ``predict`` :232-286).  ``vla_action_n`` is normalized VLA."""
    module = LSTMControllerModule(cfg)
    carry, refined_n = module.apply(
        {"params": params}, carry, vla_action_n, force,
        obs_cond, method=LSTMControllerModule.step)
    return carry, denormalize_actions(refined_n, stats, "expert")


@partial(jax.jit, static_argnames=("cfg",))
def lstm_predict_sequence(cfg: LSTMControllerConfig, params, stats, obs_cond,
                          vla_actions, force_seq):
    """Step-by-step rollout over a chunk with fresh carry
    (reference ``predict_sequence`` :288-319) as one lax.scan.

    ``vla_actions`` are raw (unnormalized); output is denormalized."""
    module = LSTMControllerModule(cfg)
    vla_n = normalize_actions(vla_actions, stats, "vla")
    carry0 = module.bind({"params": params}).init_carry(vla_actions.shape[0])

    def body(carry, xs):
        act_n, force = xs
        carry, refined_n = module.apply(
            {"params": params}, carry, act_n, force, obs_cond,
            method=LSTMControllerModule.step)
        return carry, refined_n

    xs = (jnp.swapaxes(vla_n, 0, 1), jnp.swapaxes(force_seq, 0, 1))
    _, refined_n = jax.lax.scan(body, carry0, xs)
    refined_n = jnp.swapaxes(refined_n, 0, 1)
    return denormalize_actions(refined_n, stats, "expert")


def lstm_loss(cfg: LSTMControllerConfig, params, batch, dropout_key=None):
    """MSE between refined and expert actions, both normalized
    (reference ``get_loss`` :321-337)."""
    module = LSTMControllerModule(cfg, deterministic=dropout_key is None)
    rngs = {"dropout": dropout_key} if dropout_key is not None else {}
    pred = module.apply({"params": params}, batch["obs_cond"],
                        batch["vla_act"], batch["forces"], rngs=rngs)
    return jnp.mean(jnp.square(pred - batch["expert_act"]))


def save_lstm_controller(path: str, st: LSTMControllerState) -> None:
    os.makedirs(path, exist_ok=True)
    ckpt.save_pytree(os.path.join(path, "tactile_controller.msgpack"), st.params)
    if st.stats is not None:
        ckpt.save_stats(os.path.join(path, "stats.json"), st.stats)
    ckpt.save_json(os.path.join(path, "model_args.json"),
                   dataclasses.asdict(st.cfg))


def load_lstm_controller(path: str, cfg: Optional[LSTMControllerConfig] = None,
                         ) -> LSTMControllerState:
    if cfg is None:
        cfg = LSTMControllerConfig(**ckpt.load_json(
            os.path.join(path, "model_args.json")))
    st = init_lstm_controller(cfg, jax.random.PRNGKey(0))
    params = ckpt.load_pytree(
        os.path.join(path, "tactile_controller.msgpack"), st.params)
    stats = None
    stats_path = os.path.join(path, "stats.json")
    if os.path.exists(stats_path):
        stats = ckpt.load_stats(stats_path)
    return LSTMControllerState(cfg=cfg, params=params, stats=stats)
