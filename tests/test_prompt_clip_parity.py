"""Prompt-learned CLIP (vision + text) vs a torch oracle built on HF CLIP.

The plain towers have HF parity tests; these pin the PROMPT mechanics —
embedding-level insertion, per-layer replacement, sigmoid gate blending,
mid-depth drop — against an independent torch implementation of the
reference's semantics (``octopi/octopi_s/utils/encoder.py:11-129``:
vision prompts APPEND at the sequence end; text prompts REPLACE slots
``[1, 1+n)`` after BOS; gate blends ``sigmoid(γ_i)·after + (1-σ)·before``
on every replaced layer except the last)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vla_touch_tpu.models.encoders import clip_text as CT
from vla_touch_tpu.models.encoders.vit import ViTConfig
from vla_touch_tpu.planning import encoder as PE
from vla_touch_tpu.utils import torch_port as tp

transformers = pytest.importorskip("transformers")

torch.manual_seed(0)

N_CTX = 3
VIT = ViTConfig(hidden_size=32, num_layers=3, num_heads=2, mlp_dim=64,
                patch_size=8, image_size=32, use_layerscale=False,
                quick_gelu=True, use_pre_norm=True, layernorm_eps=1e-5,
                patch_bias=False)
TXT = CT.CLIPTextConfig(vocab_size=100, hidden_size=32, num_layers=3,
                        num_heads=2, mlp_dim=64, max_positions=16,
                        eos_token_id=99)


def _hf_vision():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=3, num_attention_heads=2,
                           image_size=32, patch_size=8,
                           attn_implementation="eager")
    return CLIPVisionModel(cfg).eval()


def _hf_text():
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = CLIPTextConfig(vocab_size=100, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=3,
                         num_attention_heads=2, max_position_embeddings=16,
                         eos_token_id=99, attn_implementation="eager")
    return CLIPTextModel(cfg).eval()


def _prompts_gates(rng, depth):
    prompts = rng.normal(size=(max(depth, 1), N_CTX, 32)).astype(np.float32)
    gates = rng.normal(size=(3,)).astype(np.float32)
    return prompts, gates


def _vision_oracle(hf, pixels, prompts, gates, depth):
    vm = hf.vision_model
    n = N_CTX
    with torch.no_grad():
        h = vm.embeddings(torch.from_numpy(pixels))
        if depth > 0:
            ctx0 = torch.from_numpy(prompts[0]).expand(h.shape[0], -1, -1)
            h = torch.cat([h, ctx0], dim=1)
        h = vm.pre_layrnorm(h)
        L = len(vm.encoder.layers)
        for i, layer in enumerate(vm.encoder.layers):
            replace = 0 < i < depth
            if replace:
                before = h[:, -n:]
                ctx = torch.from_numpy(prompts[i]).expand(h.shape[0], -1, -1)
                h = torch.cat([h[:, :-n], ctx], dim=1)
            elif i == depth and 0 < depth < L:
                h = h[:, :-n]
            h = layer(h, None, None)[0]
            if replace and i != L - 1:
                g = torch.sigmoid(torch.tensor(gates[i]))
                h = torch.cat(
                    [h[:, :-n], g * h[:, -n:] + (1 - g) * before], dim=1)
        if depth >= L:
            h = h[:, :-n]
        return vm.post_layernorm(h[:, 0]).numpy()


def _text_oracle(hf, ids, mask, prompts, gates, depth):
    tm = hf.text_model
    n = N_CTX
    B, L = ids.shape
    idsT = torch.from_numpy(ids)
    causal = torch.triu(torch.full((L, L), -1e9), 1)[None, None]
    pad = (1.0 - torch.from_numpy(mask).float())[:, None, None, :] * -1e9

    def put(h, i):
        ctx = torch.from_numpy(prompts[i]).expand(B, -1, -1)
        return torch.cat([h[:, :1], ctx, h[:, 1 + n:]], dim=1)

    with torch.no_grad():
        h = tm.embeddings(input_ids=idsT)
        if depth > 0:
            h = put(h, 0)
        nlayers = len(tm.encoder.layers)
        cur_causal, cur_pad, dropped = causal, pad, False
        for i, layer in enumerate(tm.encoder.layers):
            replace = 0 < i < depth
            if replace:
                before = h[:, 1:1 + n]
                h = put(h, i)
            elif i == depth and 0 < depth < nlayers:
                h = torch.cat([h[:, :1], h[:, 1 + n:]], dim=1)
                Ls = L - n
                cur_causal = torch.triu(torch.full((Ls, Ls), -1e9),
                                        1)[None, None]
                keep = torch.cat([torch.from_numpy(mask[:, :1]),
                                  torch.from_numpy(mask[:, 1 + n:])], dim=1)
                cur_pad = (1.0 - keep.float())[:, None, None, :] * -1e9
                dropped = True
            h = layer(h, cur_pad, cur_causal)[0]
            if replace and i != nlayers - 1:
                g = torch.sigmoid(torch.tensor(gates[i]))
                blended = g * h[:, 1:1 + n] + (1 - g) * before
                h = torch.cat([h[:, :1], blended, h[:, 1 + n:]], dim=1)
        h = tm.final_layer_norm(h)
        pos = (idsT == 99).int().argmax(dim=-1)
        if dropped:
            pos = pos - n
        return h.numpy(), h[torch.arange(B), pos].numpy()


@pytest.mark.parametrize("depth", [3, 2])
def test_prompt_vision_gating_matches_torch_oracle(rng, depth):
    hf = _hf_vision()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    vit = tp.clip_vision_from_hf(sd, num_layers=3)["vit"]
    prompts, gates = _prompts_gates(rng, depth)
    params = dict(vit)
    params["prompts"] = jnp.asarray(prompts)
    params["gates"] = jnp.asarray(gates)

    pixels = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    want = _vision_oracle(hf, pixels, prompts, gates, depth)
    got = PE.PromptLearningCLIPVision(
        VIT, num_prompts=N_CTX, prompt_depth=depth).apply(
            {"params": params}, jnp.asarray(pixels.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("depth", [3, 1])
def test_prompt_text_gating_matches_torch_oracle(rng, depth):
    hf = _hf_text()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    tower = CT.clip_text_from_hf(sd, num_layers=3)
    prompts, gates = _prompts_gates(rng, depth)
    params = dict(tower)
    params["prompts"] = jnp.asarray(prompts)
    params["gates"] = jnp.asarray(gates)

    ids = rng.integers(1, 98, size=(2, 12)).astype(np.int64)
    mask = np.ones((2, 12), np.int64)
    ids[0, -1] = 99
    ids[1, 9] = 99
    ids[1, 10:] = 0
    mask[1, 10:] = 0

    want_h, want_p = _text_oracle(hf, ids, mask, prompts, gates, depth)
    got_h, got_p = PE.PromptLearningCLIPText(
        TXT, num_prompts=N_CTX, prompt_depth=depth).apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got_h), want_h, atol=1e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_p), want_p, atol=1e-4,
                               rtol=1e-4)
