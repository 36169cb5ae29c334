"""Octopi planning stack: encoder parity vs HF CLIP, adapters/classifier,
planner loop, splicing, salient frames, ranking eval."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vla_touch_tpu.models.encoders.vit import ViTConfig
from vla_touch_tpu.planning import encoder as PE
from vla_touch_tpu.planning import eval as PEval
from vla_touch_tpu.planning import frames as PF
from vla_touch_tpu.planning import llm_splice as LS
from vla_touch_tpu.planning.planner import (
    EXPERIMENTS,
    PlannerConfig,
    PlannerSession,
    TactileFeedback,
)
from vla_touch_tpu.utils import torch_port as tp

torch.manual_seed(0)

TINY_CLIP = ViTConfig(hidden_size=64, num_layers=2, num_heads=4, mlp_dim=128,
                      patch_size=16, image_size=32, use_layerscale=False,
                      quick_gelu=True, use_pre_norm=True, layernorm_eps=1e-5,
                      patch_bias=False)


def _clip_converter(sd, num_layers):
    """HF CLIPVisionModel state dict -> our CLIPVisionPooled params."""
    vit = {
        "patch_embed": tp.conv2d(
            sd["vision_model.embeddings.patch_embedding.weight"]),
        "pos_embed": np.asarray(
            sd["vision_model.embeddings.position_embedding.weight"])[None],
        "cls_token": np.asarray(
            sd["vision_model.embeddings.class_embedding"]).reshape(1, 1, -1),
        "pre_norm": tp.layernorm(sd["vision_model.pre_layrnorm.weight"],
                                 sd["vision_model.pre_layrnorm.bias"]),
        "final_norm": tp.layernorm(sd["vision_model.post_layernorm.weight"],
                                   sd["vision_model.post_layernorm.bias"]),
    }
    for i in range(num_layers):
        p = f"vision_model.encoder.layers.{i}."
        vit[f"block{i}"] = {
            "norm1": tp.layernorm(sd[f"{p}layer_norm1.weight"],
                                  sd[f"{p}layer_norm1.bias"]),
            "attention": {
                "query": tp.linear(sd[f"{p}self_attn.q_proj.weight"],
                                   sd[f"{p}self_attn.q_proj.bias"]),
                "key": tp.linear(sd[f"{p}self_attn.k_proj.weight"],
                                 sd[f"{p}self_attn.k_proj.bias"]),
                "value": tp.linear(sd[f"{p}self_attn.v_proj.weight"],
                                   sd[f"{p}self_attn.v_proj.bias"]),
                "output": tp.linear(sd[f"{p}self_attn.out_proj.weight"],
                                    sd[f"{p}self_attn.out_proj.bias"]),
            },
            "norm2": tp.layernorm(sd[f"{p}layer_norm2.weight"],
                                  sd[f"{p}layer_norm2.bias"]),
            "fc1": tp.linear(sd[f"{p}mlp.fc1.weight"], sd[f"{p}mlp.fc1.bias"]),
            "fc2": tp.linear(sd[f"{p}mlp.fc2.weight"], sd[f"{p}mlp.fc2.bias"]),
        }
    return {"vit": vit}


def test_clip_pooled_matches_hf(rng):
    from transformers import CLIPVisionConfig, CLIPVisionModel

    cfg_hf = CLIPVisionConfig(hidden_size=64, num_hidden_layers=2,
                              num_attention_heads=4, intermediate_size=128,
                              image_size=32, patch_size=16,
                              hidden_act="quick_gelu")
    ref = CLIPVisionModel(cfg_hf).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = _clip_converter(sd, 2)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(pixel_values=torch.from_numpy(x).permute(0, 3, 1, 2))
    got = PE.CLIPVisionPooled(TINY_CLIP).apply({"params": params},
                                               jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.pooler_output.numpy(),
                               atol=2e-4, rtol=1e-4)


def test_prompt_learning_clip(rng):
    """VPT-deep prompt tower: prompts are trainable, output CLS-shaped, and
    prompt count doesn't leak into the output sequence."""
    from vla_touch_tpu.planning.encoder import PromptLearningCLIPVision

    cfg = ViTConfig(hidden_size=32, num_layers=4, num_heads=4, mlp_dim=64,
                    patch_size=16, image_size=32, use_layerscale=False,
                    quick_gelu=True, use_pre_norm=True, layernorm_eps=1e-5,
                    patch_bias=False)
    m = PromptLearningCLIPVision(cfg, num_prompts=3, prompt_depth=3)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": params}, x)
    assert out.shape == (2, 32)
    # prompts[0] = embedding-level set; [1], [2] = layer sets.
    assert params["prompts"].shape == (3, 3, 32)
    g = jax.grad(lambda p: jnp.sum(m.apply({"params": p}, x) ** 2))(params)
    assert float(jnp.linalg.norm(g["prompts"])) > 0
    # Different prompts -> different output (prompts influence via attention).
    p2 = dict(params)
    p2["prompts"] = params["prompts"] + 1.0
    out2 = m.apply({"params": p2}, x)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_vificlip_video_pooling(rng):
    st = PE.init_tactile_encoder(TINY_CLIP, jax.random.PRNGKey(0))
    frames = jnp.asarray(rng.normal(size=(2, 3, 32, 32, 3)), jnp.float32)
    video = PE.ViFiCLIPVideo(TINY_CLIP).apply({"params": st.clip_params},
                                              frames)
    assert video.shape == (2, 64)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(video), axis=-1),
                               1.0, atol=1e-5)
    feats = PE.encode_tactile_video(TINY_CLIP, st.clip_params,
                                    st.adapter_params, frames, "dotted")
    assert feats.shape == (2, 64)
    feats2 = PE.encode_tactile_video(TINY_CLIP, st.clip_params,
                                     st.adapter_params, frames, "plain")
    assert not np.allclose(np.asarray(feats), np.asarray(feats2))
    props = PE.classify_properties(st.classifier_params, feats)
    assert props.shape == (2, 2)


def test_tactile_encoder_checkpoint_roundtrip(tmp_path, rng):
    st = PE.init_tactile_encoder(TINY_CLIP, jax.random.PRNGKey(1))
    PE.save_tactile_encoder(str(tmp_path / "enc"), st)
    st2 = PE.load_tactile_encoder(str(tmp_path / "enc"))
    frames = jnp.asarray(rng.normal(size=(1, 2, 32, 32, 3)), jnp.float32)
    a = PE.encode_tactile_video(TINY_CLIP, st.clip_params, st.adapter_params,
                                frames, "dotted")
    b = PE.encode_tactile_video(st2.cfg, st2.clip_params, st2.adapter_params,
                                frames, "dotted")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_rag_embeddings(rng):
    feats = rng.normal(size=(5, 16)).astype(np.float32)
    bank = PE.generate_rag_embeddings(feats, ["a", "b", "c", "d", "e"])
    hits = PE.rag_lookup(bank, feats[2], top_k=2)
    assert hits[0][0] == "c" and hits[0][1] > 0.99


def test_planner_session_loop(tmp_path):
    script = iter(["grasp sponge", "press sponge", "wipe left", "DONE"])

    def vlm_fn(messages):
        assert messages[0]["role"] == "system"
        return next(script)

    fb = TactileFeedback()
    cfg = PlannerConfig(experiment="wipe", results_dir=str(tmp_path),
                        session_name="t1")
    session = PlannerSession(cfg, vlm_fn, fb)

    forces = iter([np.array([0.1, 0.0, 0.1]), np.array([1.5, 0.2, 1.6]),
                   np.array([0.8, 0.1, 0.9])])

    def feedback_fn(action, turn):
        return fb.from_force(next(forces))

    out = session.run(feedback_fn)
    assert out["completed"]
    rows = [json.loads(l) for l in open(out["log_path"])]
    assert rows[0]["role"] == "assistant"
    assert any("Force measurement" in r["content"] for r in rows)
    # no-touch baseline strips feedback content
    cfg2 = PlannerConfig(experiment="wipe", use_tactile=False,
                         results_dir=str(tmp_path), session_name="t2")
    script2 = iter(["grasp sponge", "DONE"])
    session2 = PlannerSession(cfg2, lambda m: next(script2), fb)
    out2 = session2.run(lambda a, t: "SHOULD NOT APPEAR")
    rows2 = [json.loads(l) for l in open(out2["log_path"])]
    assert not any("SHOULD NOT APPEAR" in r["content"] for r in rows2)


def test_llm_splice(rng):
    D = 8
    vocab = {c: rng.normal(size=(D,)).astype(np.float32) for c in "abcxyz"}

    def embed_text(s):
        return np.stack([vocab[c] for c in s]) if s else np.zeros((0, D))

    start = rng.normal(size=(D,)).astype(np.float32)
    end = rng.normal(size=(D,)).astype(np.float32)

    def encode_video(v):
        return np.full((1, D), float(v), np.float32)

    out = LS.process_user_input(
        "ab<tact>xy<tact>c", [1, 2], embed_text, encode_video,
        lambda f: f * 2.0, start, end)
    # ab + [start, tac1, end] + xy + [start, tac2, end] + c = 2+3+2+3+1 = 11
    assert out.shape == (11, D)
    np.testing.assert_allclose(out[0], vocab["a"])
    np.testing.assert_allclose(out[2], start)
    np.testing.assert_allclose(out[3], np.full(D, 2.0))  # 1 * 2.0
    np.testing.assert_allclose(out[4], end)
    np.testing.assert_allclose(out[8], np.full(D, 4.0))
    np.testing.assert_allclose(out[10], vocab["c"])


def test_salient_frames():
    T, H, W = 20, 8, 8
    frames = np.zeros((T, H, W), np.float32)
    # Contact event: frames 8..12 change strongly.
    for t in range(8, 13):
        frames[t] = (t - 7) * 20.0
    idx = PF.extract_salient_frames(frames, threshold=2.0, top_k=3)
    assert len(idx) == 3
    assert all(8 <= i <= 13 for i in idx)
    # No-event fallback: single max-difference frame.
    calm = np.zeros((5, 4, 4), np.float32)
    calm[3] = 1.0
    idx2 = PF.extract_salient_frames(calm, threshold=10.0)
    assert len(idx2) == 1


def test_ranking_eval():
    gt = [["a", "b", "c"], ["x", "y"]]
    pred = [["a", "c", "b"], ["x", "y"]]
    res = PEval.evaluate_ranking(pred, gt)
    assert res["accuracy"] == 0.5
    assert 0 < res["kendall_tau"] < 1

    parsed = PEval.parse_ranking("I think B is softer than A, then C",
                                 ["A", "B", "C"])
    assert parsed == ["B", "A", "C"]

    acc = PEval.threshold_classification_accuracy(
        np.array([0.2, 0.9, 0.4]), np.array([0.1, 0.8, 0.6]), 0.5)
    assert abs(acc - 2 / 3) < 1e-9
    pw = PEval.pairwise_comparison_success(
        np.array([1.0, 2.0, 3.0]), np.array([1.0, 3.0, 2.0]))
    assert abs(pw - 2 / 3) < 1e-9
