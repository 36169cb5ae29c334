"""CLIP text tower parity vs HF ``CLIPTextModel`` + the prompt-learned
text path + ViFiCLIP dual-branch contrastive training.

Covers the reference's CLIP text components
(``octopi/octopi_s/utils/encoder.py:279-424``)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vla_touch_tpu.models.encoders import clip_text as CT
from vla_touch_tpu.planning import encoder as PE

transformers = pytest.importorskip("transformers")

torch.manual_seed(0)

TINY = CT.CLIPTextConfig(vocab_size=100, hidden_size=32, num_layers=2,
                         num_heads=2, mlp_dim=64, max_positions=16,
                         eos_token_id=99)


def _tiny_hf():
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg_hf = CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=16, eos_token_id=99,
        attn_implementation="eager")
    return CLIPTextModel(cfg_hf).eval()


def _ids(rng, B=3, L=12, pad_from=None):
    """Token rows ending in EOS (id 99), optionally padded after it."""
    ids = rng.integers(1, 98, size=(B, L)).astype(np.int64)
    mask = np.ones((B, L), np.int64)
    if pad_from is None:
        ids[:, -1] = 99
    else:
        for b in range(B):
            e = pad_from[b]
            ids[b, e] = 99
            ids[b, e + 1:] = 0
            mask[b, e + 1:] = 0
    return ids, mask


def test_clip_text_parity_hf(rng):
    ref = _tiny_hf()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = CT.clip_text_from_hf(sd, num_layers=2)

    ids, mask = _ids(rng)
    with torch.no_grad():
        out = ref(input_ids=torch.from_numpy(ids),
                  attention_mask=torch.from_numpy(mask))
    got_h, got_p = CT.CLIPTextTower(TINY).apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got_h),
                               out.last_hidden_state.numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_p), out.pooler_output.numpy(),
                               atol=1e-5, rtol=1e-4)


def test_clip_text_parity_padded(rng):
    """EOS at different positions per row + right padding: the pooled
    feature must track each row's first EOS."""
    ref = _tiny_hf()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = CT.clip_text_from_hf(sd, num_layers=2)

    ids, mask = _ids(rng, B=3, L=12, pad_from=[11, 7, 9])
    with torch.no_grad():
        out = ref(input_ids=torch.from_numpy(ids),
                  attention_mask=torch.from_numpy(mask))
    _, got_p = CT.CLIPTextTower(TINY).apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got_p), out.pooler_output.numpy(),
                               atol=1e-5, rtol=1e-4)


def test_prompt_text_depth0_matches_plain(rng):
    """prompt_depth=0 must reduce exactly to the vanilla text tower
    (reference: VPT_shallow=False asserts no prompt activity)."""
    ids, mask = _ids(rng)
    tower = CT.CLIPTextTower(TINY)
    params = tower.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(mask))["params"]
    plain_h, plain_p = tower.apply({"params": params}, jnp.asarray(ids),
                                   jnp.asarray(mask))

    pl = PE.PromptLearningCLIPText(TINY, num_prompts=3, prompt_depth=0)
    pl_params = pl.init(jax.random.PRNGKey(1), jnp.asarray(ids),
                        jnp.asarray(mask))["params"]
    for k in params:
        pl_params[k] = params[k]
    got_h, got_p = pl.apply({"params": pl_params}, jnp.asarray(ids),
                            jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(plain_h),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(plain_p),
                               atol=1e-6)


def test_prompt_text_replaces_slots_only(rng):
    """Deep prompts overwrite exactly slots [1, 1+n): changing the
    placeholder token ids there must not change the output, while changing
    a real token must."""
    n = 3
    ids, mask = _ids(rng, B=2, L=12)
    pl = PE.PromptLearningCLIPText(TINY, num_prompts=n,
                                   prompt_depth=TINY.num_layers)
    params = pl.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                     jnp.asarray(mask))["params"]
    _, base = pl.apply({"params": params}, jnp.asarray(ids),
                       jnp.asarray(mask))

    ids2 = ids.copy()
    ids2[:, 1:1 + n] = (ids2[:, 1:1 + n] + 7) % 98 + 1  # placeholder slots
    _, same = pl.apply({"params": params}, jnp.asarray(ids2),
                       jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(same), np.asarray(base), atol=1e-6)

    ids3 = ids.copy()
    ids3[:, 1 + n] = (ids3[:, 1 + n] + 7) % 98 + 1       # a real token
    _, diff = pl.apply({"params": params}, jnp.asarray(ids3),
                       jnp.asarray(mask))
    assert float(np.abs(np.asarray(diff) - np.asarray(base)).max()) > 1e-6


def test_prompt_text_mid_depth_drop(rng):
    """prompt_depth < num_layers: slots drop at that layer; the pooled
    feature still tracks EOS (shifted by n) and runs without shape errors."""
    ids, mask = _ids(rng, B=2, L=12, pad_from=[11, 9])
    pl = PE.PromptLearningCLIPText(TINY, num_prompts=2, prompt_depth=1)
    params = pl.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                     jnp.asarray(mask))["params"]
    h, p = pl.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    assert h.shape == (2, 12 - 2, TINY.hidden_size)
    assert p.shape == (2, TINY.hidden_size)
    # Row 0's EOS is at 11 -> shifted index 9; verify the gather.
    np.testing.assert_allclose(np.asarray(p[0]), np.asarray(h[0, 9]),
                               atol=0)


def test_vificlip_dual_branch_shapes(rng):
    vision = PE.ViTConfig(hidden_size=32, num_layers=2, num_heads=2,
                          mlp_dim=64, patch_size=8, image_size=32,
                          use_layerscale=False, quick_gelu=True,
                          use_pre_norm=True, layernorm_eps=1e-5,
                          patch_bias=False)
    model = PE.ViFiCLIPModel(vision_cfg=vision, text_cfg=TINY,
                             prompt_learning=True, num_prompts=2,
                             prompt_depth_vision=2, prompt_depth_text=2)
    frames = jnp.asarray(rng.normal(size=(3, 2, 32, 32, 3)), jnp.float32)
    ids, mask = _ids(rng, B=3, L=12)
    params = model.init(jax.random.PRNGKey(0), frames, jnp.asarray(ids),
                        jnp.asarray(mask))["params"]
    v, t, scales = model.apply({"params": params}, frames, jnp.asarray(ids),
                               jnp.asarray(mask))
    assert v.shape == (3, 32) and t.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=-1), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(t), axis=-1), 1.0,
                               atol=1e-5)
    # Dual scales init at log(1/0.07) (encoder.py:398-399).
    np.testing.assert_allclose(float(scales["tactile"]), np.log(1 / 0.07),
                               atol=1e-6)
    # No-text call returns None text features (encoder.py:419-420).
    v2, t2, _ = model.apply({"params": params}, frames)
    assert t2 is None and v2.shape == (3, 32)


def test_vificlip_contrastive_training_decreases_loss(rng):
    from vla_touch_tpu.planning.train_encoder import train_vificlip_contrastive

    vision = PE.ViTConfig(hidden_size=32, num_layers=2, num_heads=2,
                          mlp_dim=64, patch_size=8, image_size=32,
                          use_layerscale=False, quick_gelu=True,
                          use_pre_norm=True, layernorm_eps=1e-5,
                          patch_bias=False)
    ids, mask = _ids(rng, B=4, L=12)
    batches = [{
        "frames": rng.normal(size=(4, 2, 32, 32, 3)).astype(np.float32),
        "input_ids": ids, "attention_mask": mask,
    }]
    params, losses = train_vificlip_contrastive(
        batches, vision_cfg=vision, text_cfg=TINY, prompt_learning=True,
        freeze_text_encoder=True, num_prompts=2, prompt_depth_vision=2,
        prompt_depth_text=2, epochs=30, lr=3e-3, seed=0)
    assert losses[-1] < losses[0] - 0.1, (losses[0], losses[-1])

    # freeze_text_encoder contract (encoder.py:393-396): text tower
    # untouched, vision tower trained.
    fresh = PE.ViFiCLIPModel(
        vision_cfg=vision, text_cfg=TINY, prompt_learning=True,
        num_prompts=2, prompt_depth_vision=2, prompt_depth_text=2).init(
            jax.random.PRNGKey(0), jnp.asarray(batches[0]["frames"]),
            jnp.asarray(ids), jnp.asarray(mask))["params"]
    t_same = jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: bool(np.allclose(np.asarray(a), np.asarray(b))),
        params["text"], fresh["text"]))
    v_same = jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: bool(np.allclose(np.asarray(a), np.asarray(b))),
        params["vision"], fresh["vision"]))
    assert t_same and not v_same
