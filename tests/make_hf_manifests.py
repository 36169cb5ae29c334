"""Generate HF checkpoint key/shape manifests for port-fidelity tests.

The real pretrained weights (rdt-1b, SigLIP So400m, DinoV2-small, CLIP
ViT-B/16, Qwen2.5-7B, T5-v1_1-xxl) cannot be downloaded in this
environment, but their checkpoints ARE the state dicts of known torch
modules:

- ``robotics-diffusion-transformer/rdt-1b`` is ``RDTRunner``'s state dict
  (reference ``models/hub_mixin.py:25-76`` saves ``self.state_dict()``);
  the module tree is ``model`` (RDT) + three adaptor Sequentials
  (``rdt_runner.py:27-60``).  We build it from ``tests/torch_ref/
  rdt_torch.py`` — an independent transcription whose attribute naming was
  verified line-by-line against the reference (``blocks.py:89-100``
  q/kv/q_norm/k_norm/proj, ``:150-165`` norm1/attn/cross_attn/norm2/ffn/
  norm3, ``:192-194`` final_layer.norm_final/ffn_final, ``model.py:53-62``
  pos embeds + blocks, timm Attention qkv/proj) — at the flagship
  2048x28x32 config.
- the HF-hub models are instantiated from their public config
  hyperparameters with the SAME transformers modeling code the reference
  loads into, on the meta device (no weight allocation).

Each manifest is ``{state_dict_key: shape_list}``.  Run:
    python tests/make_hf_manifests.py
"""

import json
import os
import sys

import torch

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "vla_touch_tpu", "data", "hf_manifests")


def dump(name, module):
    man = {k: list(v.shape) for k, v in module.state_dict().items()}
    path = os.path.join(OUT, f"{name}.json")
    with open(path, "w") as f:
        json.dump(man, f, indent=0, sort_keys=True)
    print(f"{name}: {len(man)} keys -> {path}")


def rdt_1b():
    from torch import nn

    from torch_ref.rdt_torch import TorchAdapter, TorchRDT

    with torch.device("meta"):
        runner = nn.Module()
        runner.model = TorchRDT(output_dim=128, horizon=64, hidden=2048,
                                depth=28, heads=32, max_lang_len=1024,
                                img_cond_len=4374)
        # mlp2x_gelu / mlp2x_gelu / mlp3x_gelu (reference model config);
        # state adaptor input is state_token_dim*2 = 256 (state ⊕ mask).
        runner.lang_adaptor = TorchAdapter("mlp2x_gelu", 4096, 2048).net
        runner.img_adaptor = TorchAdapter("mlp2x_gelu", 1152, 2048).net
        runner.state_adaptor = TorchAdapter("mlp3x_gelu", 256, 2048).net
    dump("rdt_1b", runner)


def siglip_so400m():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    cfg = SiglipVisionConfig(hidden_size=1152, intermediate_size=4304,
                             num_hidden_layers=27, num_attention_heads=16,
                             image_size=384, patch_size=14)
    with torch.device("meta"):
        dump("siglip_so400m", SiglipVisionModel(cfg))


def dinov2_small():
    from transformers import Dinov2Config, Dinov2Model

    cfg = Dinov2Config(hidden_size=384, num_hidden_layers=12,
                       num_attention_heads=6, mlp_ratio=4, image_size=518,
                       patch_size=14)
    with torch.device("meta"):
        dump("dinov2_small", Dinov2Model(cfg))


def clip_vit_b16():
    from transformers import (CLIPTextConfig, CLIPTextModel,
                              CLIPVisionConfig, CLIPVisionModel)

    vcfg = CLIPVisionConfig(hidden_size=768, intermediate_size=3072,
                            num_hidden_layers=12, num_attention_heads=12,
                            image_size=224, patch_size=16)
    tcfg = CLIPTextConfig(vocab_size=49408, hidden_size=512,
                          intermediate_size=2048, num_hidden_layers=12,
                          num_attention_heads=8,
                          max_position_embeddings=77)
    with torch.device("meta"):
        dump("clip_vit_b16_vision", CLIPVisionModel(vcfg))
        dump("clip_vit_b16_text", CLIPTextModel(tcfg))


def qwen2_5_7b():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = Qwen2Config(hidden_size=3584, intermediate_size=18944,
                      num_hidden_layers=28, num_attention_heads=28,
                      num_key_value_heads=4, vocab_size=152064,
                      max_position_embeddings=32768,
                      tie_word_embeddings=False, rope_theta=1000000.0)
    with torch.device("meta"):
        dump("qwen2_5_7b", Qwen2ForCausalLM(cfg))


def qwen2_vl_7b():
    from transformers import Qwen2VLConfig
    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        Qwen2VLForConditionalGeneration)

    cfg = Qwen2VLConfig(
        hidden_size=3584, intermediate_size=18944, num_hidden_layers=28,
        num_attention_heads=28, num_key_value_heads=4, vocab_size=152064,
        max_position_embeddings=32768, tie_word_embeddings=False,
        rope_theta=1000000.0,
        rope_scaling={"type": "mrope", "mrope_section": [16, 24, 24]},
        vision_config=dict(depth=32, embed_dim=1280, num_heads=16,
                           mlp_ratio=4, patch_size=14,
                           temporal_patch_size=2, spatial_merge_size=2,
                           hidden_size=3584, in_channels=3))
    with torch.device("meta"):
        model = Qwen2VLForConditionalGeneration(cfg)
    # transformers 4.5x renames attributes internally
    # (model.language_model / model.visual); the hub checkpoint uses
    # "model.layers.*" + "visual.*" — normalize to the on-disk convention
    # the loaders consume.
    man = {}
    for k, v in model.state_dict().items():
        k = k.replace("model.language_model.", "model.")
        k = k.replace("model.visual.", "visual.")
        man[k] = list(v.shape)
    path = os.path.join(OUT, "qwen2_vl_7b.json")
    with open(path, "w") as f:
        json.dump(man, f, indent=0, sort_keys=True)
    print(f"qwen2_vl_7b: {len(man)} keys -> {path}")


def t5_v1_1_xxl():
    from transformers import T5Config, T5EncoderModel

    cfg = T5Config(d_model=4096, d_kv=64, d_ff=10240, num_layers=24,
                   num_heads=64, vocab_size=32128,
                   feed_forward_proj="gated-gelu")
    with torch.device("meta"):
        dump("t5_v1_1_xxl", T5EncoderModel(cfg))


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    rdt_1b()
    siglip_so400m()
    dinov2_small()
    clip_vit_b16()
    qwen2_5_7b()
    qwen2_vl_7b()
    t5_v1_1_xxl()
