"""Runtime DinoV2 feature extractor for the controllers.

Wraps :class:`DinoV2Encoder` with the reference wrapper's input handling
(``/root/reference/VLA/residual_controller/visual_encoder.py:56-106``):
accepts [B,H,W,C] or [B,T,H,W,C] channels-last frames, applies the /255 and
ImageNet-normalization heuristics, returns pooled CLS embeddings.

Weights come either from a ported HF checkpoint
(:func:`vla_touch_tpu.utils.torch_port.dinov2_from_hf`) or random init
(tests / training from scratch).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vla_touch_tpu.models.encoders.vit import (
    DINOV2_BASE,
    DINOV2_SMALL,
    DinoV2Encoder,
    ViTConfig,
)

_CONFIGS = {"dinov2-small": DINOV2_SMALL, "dinov2-base": DINOV2_BASE}


def config_for(name: str) -> ViTConfig:
    return _CONFIGS[name]


@partial(jax.jit, static_argnames=("cfg",))
def encode_images(cfg: ViTConfig, params, images):
    """images: (B, H, W, C) or (B, T, H, W, C), uint8 or [0,1] float.

    Returns (B, D) (last frame used when a time axis is present, matching
    the controllers' use of the current frame)."""
    if images.ndim == 5:
        images = images[:, -1]
    x = images.astype(jnp.float32)
    # Reference heuristics: /255 if still in byte range, ImageNet-normalize
    # unless the input already looks normalized (mean < 0.5).
    x = jnp.where(jnp.max(x) > 1.0, x / 255.0, x)
    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
    normalized = (x - mean) / std
    x = jnp.where(jnp.mean(x) < 0.5, x, normalized)
    return DinoV2Encoder(cfg).apply({"params": params}, x)


def init_params(name: str, key) -> dict:
    cfg = config_for(name)
    dummy = jnp.zeros((1, 42, 42, 3), jnp.float32)
    return DinoV2Encoder(cfg).init(key, dummy)["params"]


def save_params(ckpt_dir: str, name: str, params: dict) -> str:
    """Persist the encoder weights alongside a controller checkpoint so
    eval/deployment reconstructs the SAME visual features the controller was
    trained against."""
    import os

    from vla_touch_tpu.utils import checkpoint as ckpt

    path = os.path.join(ckpt_dir, f"image_encoder_{name}.msgpack")
    ckpt.save_pytree(path, params)
    return path


def load_params(ckpt_dir: str, name: str):
    """Load persisted encoder weights; None when the checkpoint predates
    encoder persistence (caller falls back with a warning)."""
    import os

    from vla_touch_tpu.utils import checkpoint as ckpt

    path = os.path.join(ckpt_dir, f"image_encoder_{name}.msgpack")
    if not os.path.exists(path):
        # Legacy unnamed file from earlier checkpoints.
        path = os.path.join(ckpt_dir, "image_encoder.msgpack")
    if not os.path.exists(path):
        return None
    target = init_params(name, jax.random.PRNGKey(0))
    return ckpt.load_pytree(path, target)
