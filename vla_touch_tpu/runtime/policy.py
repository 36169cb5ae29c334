"""Deployment policy wrapper: the VLA inference API.

TPU-native equivalent of
``/root/reference/VLA/scripts/franka_model_eef.py`` (and the joint-space /
ALOHA variants, which differ only in state indices and gripper scale):
``step(proprio, images, text_embeds)`` packs the low-dim state into the
128-D unified vector with its availability mask, preprocesses and
SigLIP-encodes the 6-image window (2 frames × [exterior, right wrist, left
wrist]; missing cameras become the SigLIP-mean background), runs the
compiled DPM-Solver++ ``predict_action``, and unpacks the chunk back to
robot joint space.

The whole device path — image normalize, SigLIP, adaptors, denoise scan,
unpack — is ONE jitted function; the host only supplies raw uint8 frames
and the proprio vector.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


from vla_touch_tpu.models.encoders.vit import SIGLIP_SO400M, SiglipVisionEncoder, ViTConfig
from vla_touch_tpu.models.rdt import runner as R
from vla_touch_tpu.utils import state_vec as SV

# SigLIP image mean (= std = 0.5): background value for missing cameras is
# mean*255 (reference step(): background_color).
_SIGLIP_MEAN = 0.5


@dataclasses.dataclass(frozen=True)
class PolicyConfig:
    rdt: R.RDTRunnerConfig = dataclasses.field(default_factory=R.RDTRunnerConfig)
    vision: ViTConfig = SIGLIP_SO400M
    state_indices: tuple = tuple(SV.FRANKA_EEF_STATE_INDICES)
    # Per-dim proprio scale divided out before packing (reference gripper
    # /255 convention, franka_model_eef.py:179-182).
    state_scale: tuple = tuple([1.0] * 9 + [255.0])
    # Per-dim ACTION scale multiplied back on unpack; None = same as
    # state_scale.  The joint-space Franka uses different gripper scales for
    # proprio vs action (4.7888 / 13.9231, franka_model.py:174,212).
    action_scale: tuple = None
    control_frequency: float = 10.0
    image_size: int = 384
    img_history_size: int = 2
    num_cameras: int = 3


def franka_eef_policy_config(**kw) -> PolicyConfig:
    return PolicyConfig(**kw)


def franka_joint_policy_config(**kw) -> PolicyConfig:
    """8-D joint-space variant (franka_model.py:15,174,212): gripper
    proprio normalizes by 4.7888, gripper ACTION rescales by 13.9231."""
    return PolicyConfig(
        state_indices=tuple(SV.FRANKA_JOINT_STATE_INDICES),
        state_scale=tuple([1.0] * 7 + [4.7888]),
        action_scale=tuple([1.0] * 7 + [13.9231]), **kw)


def aloha_policy_config(**kw) -> PolicyConfig:
    return PolicyConfig(
        state_indices=tuple(SV.ALOHA_STATE_INDICES),
        state_scale=tuple([1.0] * 13 + [1.0]),
        control_frequency=25.0, **kw)


@partial(jax.jit, static_argnames=("cfg",))
def policy_step(cfg: PolicyConfig, rdt_params, vision_params, key,
                proprio, images, image_mask, text_embeds, text_mask):
    """One action-chunk inference.

    proprio: (B, D_low) raw robot state;
    images: (B, 6, S, S, 3) uint8/float frames ordered
        [ext_{t-1}, right_{t-1}, left_{t-1}, ext_t, right_t, left_t];
    image_mask: (B, 6) bool — False frames are replaced by the background;
    text_embeds: (B, L, 4096); text_mask: (B, L) bool.

    Returns (B, horizon, D_low) actions in raw robot units.
    """
    m = cfg.rdt.model
    B = proprio.shape[0]
    dtype = m.compute_dtype

    # ---- images: mask/normalize on device, encode with SigLIP ------------
    from vla_touch_tpu.utils.image import siglip_normalize

    x = siglip_normalize(images)
    x = jnp.where(image_mask[:, :, None, None, None], x, 0.0)  # bg = mean
    S = cfg.image_size
    flat = x.reshape(B * 6, S, S, 3)
    tokens = SiglipVisionEncoder(cfg.vision, dtype=dtype).apply(
        {"params": vision_params}, flat)            # (B*6, 729, 1152)
    img_tokens = tokens.reshape(B, -1, tokens.shape[-1])

    # ---- state pack -------------------------------------------------------
    scale = jnp.asarray(cfg.state_scale, jnp.float32)
    low = proprio.astype(jnp.float32) / scale
    idx = jnp.asarray(cfg.state_indices, jnp.int32)
    state = jnp.zeros((B, m.state_token_dim), jnp.float32).at[:, idx].set(low)
    mask = jnp.zeros((B, m.state_token_dim), jnp.float32).at[:, idx].set(1.0)

    chunk = R.rdt_predict_action(
        cfg.rdt, rdt_params, key,
        text_embeds.astype(dtype), text_mask, img_tokens.astype(dtype),
        state[:, None, :].astype(dtype), mask[:, None, :],
        jnp.full((B,), cfg.control_frequency, jnp.float32))

    # ---- unpack ------------------------------------------------------------
    out_scale = jnp.asarray(
        cfg.action_scale if cfg.action_scale is not None else cfg.state_scale,
        jnp.float32)
    return chunk[:, :, idx] * out_scale


class RoboticDiffusionTransformerModel:
    """Stateful convenience wrapper with the reference class name/API."""

    def __init__(self, cfg: PolicyConfig, rdt_params, vision_params):
        self.cfg = cfg
        self.rdt_params = rdt_params
        self.vision_params = vision_params
        self._key = jax.random.PRNGKey(0)

    @classmethod
    def create(cls, cfg: Optional[PolicyConfig] = None, seed: int = 0,
               rdt_params=None, vision_params=None):
        cfg = cfg or PolicyConfig()
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        if rdt_params is None:
            rdt_params = jax.jit(lambda k: R.init_rdt(cfg.rdt, k))(k1)
        if vision_params is None:
            dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
            vision_params = SiglipVisionEncoder(cfg.vision).init(k2, dummy)["params"]
        return cls(cfg, rdt_params, vision_params)

    def step(self, proprio, images: Sequence, text_embeds,
             text_mask=None) -> np.ndarray:
        """images: list of 6 HxWx3 uint8 arrays or None (missing camera)."""
        cfg = self.cfg
        S = cfg.image_size
        frames = np.zeros((1, 6, S, S, 3), np.uint8)
        mask = np.zeros((1, 6), bool)
        from vla_touch_tpu.utils.image import pad_and_resize_for_siglip

        for i, img in enumerate(images):
            if img is None:
                continue
            frames[0, i] = pad_and_resize_for_siglip(np.asarray(img), S)
            mask[0, i] = True

        proprio = np.asarray(proprio, np.float32).reshape(1, -1)
        text_embeds = np.asarray(text_embeds, np.float32)
        if text_embeds.ndim == 2:
            text_embeds = text_embeds[None]
        if text_mask is None:
            text_mask = np.ones(text_embeds.shape[:2], bool)

        self._key, k = jax.random.split(self._key)
        out = policy_step(cfg, self.rdt_params, self.vision_params, k,
                          jnp.asarray(proprio), jnp.asarray(frames),
                          jnp.asarray(mask), jnp.asarray(text_embeds),
                          jnp.asarray(text_mask))
        return np.asarray(out)


def create_model(cfg: Optional[PolicyConfig] = None, **kw):
    """Reference-named factory (franka_model_eef.py:28-37)."""
    return RoboticDiffusionTransformerModel.create(cfg, **kw)
