"""CLIP text transformer — the tower behind the Octopi ViFiCLIP text branch.

TPU-native counterpart of the reference's CLIP text path
(``/root/reference/octopi/octopi_s/utils/encoder.py:279-377``, which wraps
HF ``CLIPTextTransformer``): token + learned positional embeddings, a stack
of pre-LN blocks under a causal mask (plus the padding mask), a final
layernorm, and EOS-token pooling (HF ``pooler_output`` semantics).

The blocks are the same :class:`~vla_touch_tpu.models.encoders.vit.ViTBlock`
used by the CLIP vision tower (quick-GELU, pre-LN), driven with an additive
attention bias — one module family for both towers, so quantization/sharding
treatments apply to each identically.

``clip_text_from_hf`` ports an HF ``CLIPTextModel`` state dict;
``test_clip_text.py`` pins parity against an HF oracle at tiny scale.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from vla_touch_tpu.models.encoders.vit import ViTBlock, ViTConfig

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 512
    num_layers: int = 12
    num_heads: int = 8
    mlp_dim: int = 2048
    max_positions: int = 77
    layernorm_eps: float = 1e-5
    eos_token_id: int = 49407

    def vit(self) -> ViTConfig:
        """The block config shared with the vision tower (quick-GELU,
        pre-LN residual blocks; patch/image fields unused here)."""
        return ViTConfig(hidden_size=self.hidden_size,
                         num_layers=self.num_layers,
                         num_heads=self.num_heads, mlp_dim=self.mlp_dim,
                         use_layerscale=False, quick_gelu=True,
                         layernorm_eps=self.layernorm_eps)


CLIP_TEXT_B16 = CLIPTextConfig()


def causal_bias(length: int) -> jnp.ndarray:
    """(1, 1, L, L) additive causal mask: 0 on/below diagonal, -inf above."""
    m = jnp.triu(jnp.full((length, length), NEG_INF, jnp.float32), k=1)
    return m[None, None]


def padding_bias(attention_mask) -> jnp.ndarray:
    """(B, L) {0,1} key-padding mask -> (B, 1, 1, L) additive bias."""
    return (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * NEG_INF


def eos_pool(hidden, input_ids, eos_token_id: int):
    """Pooled feature = final-LN hidden state at the FIRST EOS position
    (HF post-#24773 semantics; encoder.py:358-367)."""
    eos = (jnp.asarray(input_ids) == eos_token_id).astype(jnp.int32)
    pos = jnp.argmax(eos, axis=-1)
    return hidden[jnp.arange(hidden.shape[0]), pos]


class CLIPTextTower(fnn.Module):
    """Plain (non-prompted) CLIP text transformer -> (last_hidden, pooled)."""

    cfg: CLIPTextConfig = CLIP_TEXT_B16
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, input_ids, attention_mask=None):
        c = self.cfg
        B, L = input_ids.shape
        tok = self.param("token_embed", fnn.initializers.normal(0.02),
                         (c.vocab_size, c.hidden_size), jnp.float32)
        pos = self.param("pos_embed", fnn.initializers.normal(0.01),
                         (c.max_positions, c.hidden_size), jnp.float32)
        x = (jnp.take(tok, input_ids, axis=0) + pos[None, :L]).astype(self.dtype)
        bias = causal_bias(L)
        if attention_mask is not None:
            bias = bias + padding_bias(attention_mask)
        vc = c.vit()
        for i in range(c.num_layers):
            x = ViTBlock(vc, dtype=self.dtype, name=f"block{i}")(x, bias)
        x = fnn.LayerNorm(epsilon=c.layernorm_eps, dtype=self.dtype,
                          name="final_norm")(x)
        return x, eos_pool(x, input_ids, c.eos_token_id)


def clip_text_from_hf(sd: dict, num_layers: int) -> dict:
    """HF ``CLIPTextModel`` state dict -> :class:`CLIPTextTower` params.
    Linear weights transpose (out, in) -> (in, out); embeddings as-is."""
    def t(name):
        return np.ascontiguousarray(np.asarray(sd[name]).T)

    def a(name):
        return np.asarray(sd[name])

    p = {
        "token_embed": a("text_model.embeddings.token_embedding.weight"),
        "pos_embed": a("text_model.embeddings.position_embedding.weight"),
        "final_norm": {"scale": a("text_model.final_layer_norm.weight"),
                       "bias": a("text_model.final_layer_norm.bias")},
    }
    for i in range(num_layers):
        h = f"text_model.encoder.layers.{i}"
        p[f"block{i}"] = {
            "norm1": {"scale": a(f"{h}.layer_norm1.weight"),
                      "bias": a(f"{h}.layer_norm1.bias")},
            "attention": {
                "query": {"kernel": t(f"{h}.self_attn.q_proj.weight"),
                          "bias": a(f"{h}.self_attn.q_proj.bias")},
                "key": {"kernel": t(f"{h}.self_attn.k_proj.weight"),
                        "bias": a(f"{h}.self_attn.k_proj.bias")},
                "value": {"kernel": t(f"{h}.self_attn.v_proj.weight"),
                          "bias": a(f"{h}.self_attn.v_proj.bias")},
                "output": {"kernel": t(f"{h}.self_attn.out_proj.weight"),
                           "bias": a(f"{h}.self_attn.out_proj.bias")},
            },
            "norm2": {"scale": a(f"{h}.layer_norm2.weight"),
                      "bias": a(f"{h}.layer_norm2.bias")},
            "fc1": {"kernel": t(f"{h}.mlp.fc1.weight"),
                    "bias": a(f"{h}.mlp.fc1.bias")},
            "fc2": {"kernel": t(f"{h}.mlp.fc2.weight"),
                    "bias": a(f"{h}.mlp.fc2.bias")},
        }
    return p
