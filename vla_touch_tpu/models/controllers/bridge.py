"""BRIDGeR diffusion refinement controller.

TPU-native equivalent of
``/root/reference/VLA/residual_controller/bridge_controller.py`` (and its
no-visual ablation ``bridge_controller_no_visual.py``): a 3-layer GELU MLP
encodes [DinoV2 CLS x2, state, force] into a 256-D conditioning vector; a
stochastic-interpolants triple-UNet transports the normalized VLA action
chunk (prior x₀) to an expert-like chunk; padded min-max normalization on
both ends.  The whole ``predict`` pipeline — encode, normalize, 10-step SDE,
denormalize — is one jitted function with the SDE compiled as ``lax.scan``.

EMA'd UNet weights are used at sample time (``bridge_model.py:267``).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from vla_touch_tpu.config import BridgeControllerConfig
from vla_touch_tpu.models.controllers import interpolants as SI
from vla_touch_tpu.models.controllers.unet1d import SITripleUnet
from vla_touch_tpu.utils import checkpoint as ckpt
from vla_touch_tpu.utils import ema as ema_lib
from vla_touch_tpu.utils.normalization import denormalize_actions, normalize_actions


class BridgeControllerModule(fnn.Module):
    """Trainable pieces: observation encoder, optional force decoder
    (auxiliary reconstruction head), and the b/v/s UNet bundle."""

    cfg: BridgeControllerConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        h = self.cfg.hidden_dim
        self.state_encoder = [
            fnn.Dense(h, dtype=self.dtype, name="se_fc1"),
            fnn.Dense(h, dtype=self.dtype, name="se_fc2"),
            fnn.Dense(h, dtype=self.dtype, name="se_fc3"),
        ]
        if self.cfg.use_force:
            self.force_decoder = [
                fnn.Dense(h, dtype=self.dtype, name="fd_fc1"),
                fnn.Dense(h // 2, dtype=self.dtype, name="fd_fc2"),
                fnn.Dense(self.cfg.force_dim, dtype=self.dtype, name="fd_fc3"),
            ]
        self.si = SITripleUnet(
            input_dim=self.cfg.state_dim,
            down_dims=tuple(self.cfg.unet_down_dims),
            dtype=self.dtype,
        )

    def encode_obs(self, state, cam1_feat=None, cam2_feat=None, forces=None):
        """[cam1, cam2, state(, force)] -> obs_cond (B, hidden_dim).

        Feature order matches ``bridge_controller.py:112-134``.
        """
        parts = []
        if self.cfg.use_visual:
            parts += [cam1_feat, cam2_feat]
        parts.append(state)
        if self.cfg.use_force:
            parts.append(forces)
        x = jnp.concatenate(parts, axis=-1)
        x = self.state_encoder[0](x)
        x = fnn.gelu(x, approximate=False)
        x = self.state_encoder[1](x)
        x = fnn.gelu(x, approximate=False)
        return self.state_encoder[2](x)

    def decode_force(self, obs_cond):
        """Auxiliary force reconstruction (``bridge_controller.py:136-145``)."""
        x = self.force_decoder[0](obs_cond)
        x = fnn.gelu(x, approximate=False)
        x = self.force_decoder[1](x)
        x = fnn.gelu(x, approximate=False)
        return self.force_decoder[2](x)

    # SI heads (bound to this module's parameters).
    def apply_v(self, x, t, cond):
        return self.si.apply_v(x, t, cond)

    def apply_s(self, x, t, cond):
        return self.si.apply_s(x, t, cond)

    def apply_b(self, x, t, cond):
        return self.si.apply_b(x, t, cond)

    def __call__(self, state, vla_chunk, cam1_feat=None, cam2_feat=None,
                 forces=None):
        """Initialization path: touches every submodule once."""
        obs = self.encode_obs(state, cam1_feat, cam2_feat, forces)
        t = jnp.zeros((state.shape[0],), jnp.float32)
        outs = self.si(vla_chunk, t, obs)
        if self.cfg.use_force:
            self.decode_force(obs)
        return outs[0]


@dataclasses.dataclass
class BridgeControllerState:
    """Deployable controller: parameters + UNet EMA + normalization stats."""

    cfg: BridgeControllerConfig
    params: dict
    ema: ema_lib.EmaState
    stats: Optional[dict] = None


def init_bridge_controller(cfg: BridgeControllerConfig, key) -> BridgeControllerState:
    module = BridgeControllerModule(cfg)
    B = 1
    kwargs = {}
    if cfg.use_visual:
        kwargs = dict(cam1_feat=jnp.zeros((B, cfg.visual_dim)),
                      cam2_feat=jnp.zeros((B, cfg.visual_dim)))
    if cfg.use_force:
        kwargs["forces"] = jnp.zeros((B, cfg.force_dim))
    params = module.init(
        key, jnp.zeros((B, cfg.state_dim)),
        jnp.zeros((B, cfg.horizon, cfg.state_dim)), **kwargs
    )["params"]
    # EMA tracks the SI nets only (torch_ema over net.parameters(),
    # bridge_model.py:433).
    return BridgeControllerState(cfg=cfg, params=params,
                                 ema=ema_lib.init(params["si"]))


def _si_nets(module: BridgeControllerModule, params: dict, si_params: dict):
    """Bind (x, t, cond)->pred callables for the SDE/losses, with the UNet
    parameters overridable (EMA at sample time, live at train time)."""
    merged = dict(params)
    merged["si"] = si_params

    def head(name):
        def f(x, t, cond):
            return module.apply({"params": merged}, x, t, cond,
                                method=getattr(BridgeControllerModule,
                                               f"apply_{name}"))
        return f

    return {k: head(k) for k in ("v", "s", "b")}


@partial(jax.jit, static_argnames=("cfg", "diffuse_steps", "unroll",
                                   "unet_impl"))
def bridge_predict(cfg: BridgeControllerConfig, params, ema_shadow, stats,
                   key, state, vla_actions, cam1_feat=None, cam2_feat=None,
                   forces=None, diffuse_steps: Optional[int] = None,
                   unroll: Optional[int] = None, unet_impl: str = "auto"):
    """Refine a VLA chunk (reference ``DiffusionController.predict``).

    state (B, state_dim); vla_actions (B, H, state_dim); returns (B, H,
    state_dim) in raw action units.
    """
    module = BridgeControllerModule(cfg)
    obs_cond = module.apply(
        {"params": params}, state, cam1_feat, cam2_feat, forces,
        method=BridgeControllerModule.encode_obs,
    )
    vla_n = normalize_actions(vla_actions, stats, "vla")
    nets = _si_nets(module, params, ema_shadow)

    if cfg.interpolant.sde_type == "vs":
        # Stack the v/s UNet parameters and evaluate both as one batched
        # program per SDE step (identical architectures, SURVEY §2.2).
        from vla_touch_tpu.models.controllers.unet1d import ConditionalUnet1D

        inf_dtype = (jnp.bfloat16 if cfg.inference_dtype == "bfloat16"
                     else jnp.float32)
        unet = ConditionalUnet1D(input_dim=cfg.state_dim,
                                 down_dims=tuple(cfg.unet_down_dims),
                                 dtype=inf_dtype)
        stacked = jax.tree.map(lambda v, s: jnp.stack([v, s]),
                               ema_shadow["v_net"], ema_shadow["s_net"])
        # Cast the weight tree ONCE outside the SDE scan: the stacked v/s
        # tree is 68.5M params, and streaming it f32 from HBM costs
        # ~0.33 ms per SDE step (274 MB) vs ~0.17 ms in bf16 — do not
        # rely on XLA hoisting the per-use casts out of the loop body.
        if inf_dtype != jnp.float32:
            stacked = jax.tree.map(
                lambda a: a.astype(inf_dtype)
                if a.dtype == jnp.float32 else a, stacked)

        # The SDE step is kernel-count bound (~970 HLO instructions / ~40
        # matmuls per step on (2, 16, <=512) tensors).  Two attacks were
        # measured on v5e (tools/bench_bridge.py, 10-step refine p50):
        # the tap-stacked Conv1d (ops/nn.py::_TapConv1d, one MXU matmul
        # per conv) cut the refine 12.0 -> 8.3 ms and is the default; the
        # fused-resblock Pallas kernel (ops/pallas_unet.py, one launch
        # per block) measured NEGATIVE on top of it (8.7 ms, its f32->bf16
        # weight streaming buys less than the launch fusion saves) and
        # unroll>1 is a wash (8.1-9.5 ms).  'auto' therefore = flax taps;
        # the kernel stays opt-in via unet_impl='fused'.
        use_fused = unet_impl == "fused"
        if use_fused:
            from vla_touch_tpu.models.controllers import unet1d_serve as US

            def vs_fused(x, t, c):
                out = US.unet_forward_stacked(
                    stacked, x, t, c, down_dims=tuple(cfg.unet_down_dims),
                    dtype=inf_dtype, fused=True)
                return out[0], out[1]
        else:
            def vs_fused(x, t, c):
                out = jax.vmap(
                    lambda p: unet.apply({"params": p}, x, t, c))(stacked)
                return out[0], out[1]

        nets = dict(nets, vs_fused=vs_fused)

    refined_n = SI.sde_sample(cfg.interpolant, nets, vla_n, obs_cond, key,
                              diffuse_steps or cfg.interpolant.diffusion_steps,
                              unroll=unroll)
    return denormalize_actions(refined_n, stats, "expert")


def bridge_loss(cfg: BridgeControllerConfig, params, key, batch):
    """Training loss: v+s+b implicit losses on normalized actions
    (``bridge_train.py`` batch prep + ``bridge_model.get_loss``).

    ``batch``: dict with normalized ``expert_act``/``vla_act`` (B, H, D),
    ``state`` (B, D), optional ``cam1_feat``/``cam2_feat``/``forces``.
    Returns (total, SILosses).
    """
    module = BridgeControllerModule(cfg)
    obs_cond = module.apply(
        {"params": params}, batch["state"], batch.get("cam1_feat"),
        batch.get("cam2_feat"), batch.get("forces"),
        method=BridgeControllerModule.encode_obs,
    )
    nets = _si_nets(module, params, params["si"])
    losses = SI.si_training_loss(cfg.interpolant, key, nets, obs_cond,
                                 batch["expert_act"], batch.get("vla_act"))
    return losses.total, losses


def bridge_force_reconstruction_loss(cfg: BridgeControllerConfig, params,
                                     obs_cond, target_force):
    module = BridgeControllerModule(cfg)
    pred = module.apply({"params": params}, obs_cond,
                        method=BridgeControllerModule.decode_force)
    return jnp.mean(jnp.square(pred - target_force))


# ---- checkpoint I/O (reference contract: controller + bridge_model + stats) ---


def save_bridge_controller(path: str, st: BridgeControllerState) -> None:
    os.makedirs(path, exist_ok=True)
    ckpt.save_pytree(os.path.join(path, "controller.msgpack"), st.params)
    ckpt.save_pytree(os.path.join(path, "bridge_model.msgpack"),
                     {"ema": st.ema.shadow,
                      "num_updates": np.asarray(st.ema.num_updates)})
    if st.stats is not None:
        ckpt.save_stats(os.path.join(path, "stats.json"), st.stats)
    ckpt.save_json(os.path.join(path, "model_args.json"),
                   dataclasses.asdict(st.cfg))


def load_bridge_controller(path: str, cfg: Optional[BridgeControllerConfig] = None,
                           ) -> BridgeControllerState:
    if cfg is None:
        raw = ckpt.load_json(os.path.join(path, "model_args.json"))
        from vla_touch_tpu.config import InterpolantConfig
        raw["interpolant"] = InterpolantConfig(**raw["interpolant"])
        raw["unet_down_dims"] = tuple(raw["unet_down_dims"])
        cfg = BridgeControllerConfig(**raw)
    st = init_bridge_controller(cfg, jax.random.PRNGKey(0))
    params = ckpt.load_pytree(os.path.join(path, "controller.msgpack"), st.params)
    blob = ckpt.load_pytree(
        os.path.join(path, "bridge_model.msgpack"),
        {"ema": st.ema.shadow, "num_updates": np.asarray(st.ema.num_updates)},
    )
    stats = None
    stats_path = os.path.join(path, "stats.json")
    if os.path.exists(stats_path):
        stats = ckpt.load_stats(stats_path)
    return BridgeControllerState(
        cfg=cfg, params=params,
        ema=ema_lib.EmaState(shadow=blob["ema"],
                             num_updates=jnp.asarray(blob["num_updates"])),
        stats=stats,
    )
