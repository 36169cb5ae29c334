"""Sparsh tactile MAE-ViT encoder (optional path).

Equivalent of ``/root/reference/VLA/residual_controller/tactile/sparsh/
sparsh_encoder.py``: Meta's Sparsh tactile representation — an MAE-pretrained
ViT over 6-channel (two stacked RGB frames) 320×240 GelSight input, patch 16
— loaded from a checkpoint with key-prefix surgery (``:49-104``).

The reference depends on the external ``sparsh`` package; here the encoder
is the in-repo :class:`ViTEncoder` with a 6-channel config, and the loader
performs the same prefix surgery on a torch checkpoint when one is supplied
(the optional dependency is the *weights*, not the code).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from vla_touch_tpu.models.encoders.vit import ViTConfig, ViTEncoder

# ViT-base MAE over 320x240 6-channel input, patch 16 -> 20x15 = 300 patches.
# (Our grid pos-embed assumes square grids; Sparsh inputs are center-cropped
# to 240x240 -> 15x15 here, documented deviation.)
SPARSH_VIT_B = ViTConfig(hidden_size=768, num_layers=12, num_heads=12,
                         mlp_dim=3072, patch_size=16, image_size=240,
                         num_channels=6, use_layerscale=False)


class SparshEncoder(fnn.Module):
    """Pooled tactile embedding from stacked frame pairs."""

    cfg: ViTConfig = SPARSH_VIT_B
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, frames_pair):
        """frames_pair: (B, H, W, 6) — two RGB frames stacked channelwise."""
        tokens = ViTEncoder(self.cfg, dtype=self.dtype, name="vit")(
            frames_pair)
        return tokens[:, 0]  # pooled CLS


def strip_prefix(sd: dict, prefixes=("model.", "module.", "encoder.")) -> dict:
    """Key-prefix surgery (reference ``sparsh_encoder.py:49-104``): drop
    wrapper prefixes so MAE-checkpoint keys match the bare ViT."""
    out = {}
    for k, v in sd.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
        out[k] = v
    return out


def load_pretrained_encoder(checkpoint_path: Optional[str] = None,
                            cfg: ViTConfig = SPARSH_VIT_B, key=None):
    """Encoder params: from a Sparsh torch checkpoint when given, random
    init otherwise (the checkpoint is an optional external artifact)."""
    module = SparshEncoder(cfg)
    key = key if key is not None else jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.num_channels))
    params = module.init(key, dummy)["params"]
    if checkpoint_path is None:
        return params
    import torch

    from vla_touch_tpu.utils import torch_port as tp

    raw = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
    sd = strip_prefix({k: v.numpy() for k, v in raw.items()})
    vit: dict = dict(params["vit"])
    if "patch_embed.proj.weight" in sd:
        vit["patch_embed"] = tp.conv2d(sd["patch_embed.proj.weight"],
                                       sd.get("patch_embed.proj.bias"))
    if "pos_embed" in sd:
        vit["pos_embed"] = np.asarray(sd["pos_embed"])
    if "cls_token" in sd:
        vit["cls_token"] = np.asarray(sd["cls_token"])
    for i in range(cfg.num_layers):
        p = f"blocks.{i}."
        if f"{p}norm1.weight" not in sd:
            continue
        qkv_w = np.asarray(sd[f"{p}attn.qkv.weight"])  # (3D, D)
        qkv_b = np.asarray(sd[f"{p}attn.qkv.bias"])
        D = qkv_w.shape[1]
        vit[f"block{i}"] = {
            "norm1": tp.layernorm(sd[f"{p}norm1.weight"],
                                  sd[f"{p}norm1.bias"]),
            "attention": {
                "query": tp.linear(qkv_w[:D], qkv_b[:D]),
                "key": tp.linear(qkv_w[D:2 * D], qkv_b[D:2 * D]),
                "value": tp.linear(qkv_w[2 * D:], qkv_b[2 * D:]),
                "output": tp.linear(sd[f"{p}attn.proj.weight"],
                                    sd[f"{p}attn.proj.bias"]),
            },
            "norm2": tp.layernorm(sd[f"{p}norm2.weight"],
                                  sd[f"{p}norm2.bias"]),
            "fc1": tp.linear(sd[f"{p}mlp.fc1.weight"],
                             sd[f"{p}mlp.fc1.bias"]),
            "fc2": tp.linear(sd[f"{p}mlp.fc2.weight"],
                             sd[f"{p}mlp.fc2.bias"]),
        }
    if "norm.weight" in sd:
        vit["final_norm"] = tp.layernorm(sd["norm.weight"], sd["norm.bias"])
    return {"vit": vit}
