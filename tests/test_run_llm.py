"""Tactile-LLM driver with a tiny differentiable stub LLM + file lock."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_touch_tpu.models.encoders.vit import ViTConfig
from vla_touch_tpu.planning import encoder as PE
from vla_touch_tpu.planning.datasets import TactileLLMDataset
from vla_touch_tpu.planning.run_llm import LLMInterface, train_projection
from vla_touch_tpu.planning.run_llm import test_llm as run_llm_test

TINY_CLIP = ViTConfig(hidden_size=32, num_layers=1, num_heads=4, mlp_dim=64,
                      patch_size=16, image_size=32, use_layerscale=False,
                      quick_gelu=True, use_pre_norm=True, layernorm_eps=1e-5,
                      patch_bias=False)
D = 16


def _stub_llm(rng):
    vocab = {w: rng.normal(size=(D,)).astype(np.float32)
             for w in ["soft", "hard", "rough", "smooth", "the", "surface",
                       "is", "object", "a", "b"]}
    target_vec = {"soft": -1.0, "hard": 1.0}

    def embed_text(s):
        toks = [vocab.get(w) for w in s.lower().replace("<tact>", " ").
                replace(":", " ").replace(".", " ").split()]
        toks = [t for t in toks if t is not None]
        return (np.stack(toks) if toks else np.zeros((0, D), np.float32))

    def loss_fn(input_embeds, answer):
        # Differentiable pseudo-LM loss: mean embedding should point toward
        # +1 ("hard") or -1 ("soft") along dim 0.
        target = target_vec.get(answer.split()[-1], 0.0)
        return jnp.square(jnp.mean(input_embeds[:, 0]) - target)

    def generate_fn(input_embeds):
        return "hard" if float(np.mean(input_embeds[:, 0])) > 0 else "soft"

    return LLMInterface(
        dim=D, embed_text=embed_text, loss_fn=loss_fn,
        generate_fn=generate_fn,
        start_embed=rng.normal(size=(D,)).astype(np.float32),
        end_embed=rng.normal(size=(D,)).astype(np.float32))


@pytest.fixture
def qa_setup(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    rows = []
    for i, ans in enumerate(["hard", "soft"]):
        vdir = tmp_path / f"video{i}"
        vdir.mkdir()
        for t in range(3):
            img = np.full((32, 32, 3), 80 + 60 * i, np.uint8)
            cv2.imwrite(str(vdir / f"{t:03d}.jpg"), img)
        rows.append({"split": "train",
                     "question": "the surface is <tact>",
                     "tactile": [str(vdir)], "answer": ans})
    qa_path = str(tmp_path / "qa.json")
    json.dump(rows, open(qa_path, "w"))
    return qa_path, rng


def test_projection_training_and_decode(qa_setup, tmp_path):
    qa_path, rng = qa_setup
    st = PE.init_tactile_encoder(TINY_CLIP, jax.random.PRNGKey(0))
    llm = _stub_llm(rng)
    ds = TactileLLMDataset([qa_path], split_name="train")
    out = str(tmp_path / "llm_out")
    proj_params = train_projection(st, llm, ds, out, epochs=4, lr=1e-2,
                                   frame_size=32)
    rows = [json.loads(l) for l in open(os.path.join(out,
                                                     "llm_training.jsonl"))]
    assert rows[-1]["loss"] < rows[0]["loss"]

    preds = run_llm_test(st, llm, proj_params, ds, out, frame_size=32)
    assert len(preds) == 2
    assert os.path.exists(os.path.join(out, "predictions.json"))
    assert all(p["prediction"] in ("hard", "soft") for p in preds)


def test_filelock(tmp_path):
    from vla_touch_tpu.utils.filelock import FileLock

    path = tmp_path / "lock"
    path.write_text("x")
    with open(path) as f:
        with FileLock(f):
            pass  # exclusive acquire + release
        lock = FileLock(f)
        lock.read_lock(blocking=False)
        lock.release()


# --------------------------------------------------------------------------
# Scenario reasoning (reference run_llm.py:201-330)
# --------------------------------------------------------------------------


def _cand(text, avg):
    return {"text": text, "avg_surprisal": avg}


def test_select_generation_majority():
    from vla_touch_tpu.planning.run_llm import select_generation

    final, opt, counts, scores = select_generation(
        [_cand("Answer: A", 1.0), _cand("Answer: B", 0.5),
         _cand("blah Answer: A stuff", 2.0)],
        "majority_voting", valid_options=("A", "B"))
    assert opt == "A" and counts == {"A": 2, "B": 1}
    assert final.replace("*", "").split("Answer: ")[-1][0] == "A"


def test_select_generation_best_of_n_reference_math():
    """Normalized confidence (max_avg - avg)/max_avg summed per option;
    winner's highest-scored generation returned (run_llm.py:279-306)."""
    from vla_touch_tpu.planning.run_llm import select_generation

    cands = [_cand("Answer: A first", 2.0), _cand("Answer: A second", 1.0),
             _cand("Answer: B only", 0.5)]
    final, opt, counts, scores = select_generation(
        cands, "best_of_n", valid_options=("A", "B"))
    # max_avg=2.0 -> A: [0.0, 0.5] sum 0.5; B: [0.75] sum 0.75 -> B wins
    assert opt == "B" and final == "Answer: B only"
    np.testing.assert_allclose(scores["A"], 0.5)
    np.testing.assert_allclose(scores["B"], 0.75)
    # majority voting would have picked A instead
    _, opt_mv, _, _ = select_generation(cands, "majority_voting",
                                        valid_options=("A", "B"))
    assert opt_mv == "A"


def test_select_generation_fallbacks():
    from vla_touch_tpu.planning.run_llm import select_generation

    final, opt, counts, scores = select_generation(
        [_cand("no letter here", 1.0)], "majority_voting")
    assert opt is None and final == "no letter here" and counts == {}
    with pytest.raises(ValueError):
        select_generation([_cand("Answer: A", 1.0)], "weighted_dice")
    # markdown-starred answers parse (reference strips '*')
    final, opt, _, _ = select_generation(
        [_cand("**Answer: C**", 0.0)], "majority_voting",
        valid_options=("A", "B", "C"))
    assert opt == "C"


def test_reason_llm_driver(qa_setup, tmp_path):
    from vla_touch_tpu.planning.llm_splice import TactileProjector
    from vla_touch_tpu.planning.run_llm import reason_llm

    qa_path, rng = qa_setup
    video_dir = json.load(open(qa_path))[0]["tactile"][0]
    st = PE.init_tactile_encoder(TINY_CLIP, jax.random.PRNGKey(0))
    llm = _stub_llm(rng)
    sampled = []

    def sample_fn(input_embeds, num, temperature, seed=0):
        sampled.append((num, temperature))
        return [{"text": "Answer: A", "avg_surprisal": 1.0},
                {"text": "Answer: B", "avg_surprisal": 0.5},
                {"text": "Answer: A", "avg_surprisal": 2.0}][:num]

    llm.sample_fn = sample_fn
    proj_params = TactileProjector(llm.dim).init(
        jax.random.PRNGKey(1), jnp.zeros((1, st.feature_dim)))["params"]
    rows = [{
        "info": {"scenario": "sorting", "target": "sponge",
                 "tactile": [video_dir],
                 "objects": {"Object 1": "sponge"}, "num_candidates": 2},
        "chat": [
            {"role": "user", "content":
             "Describe the object.\n\nObject 1: <tact_tokens>"},
            {"role": "assistant", "content": "Object 1: soft."},
            {"role": "user", "content": "Which is softer, A) a, B) b?"},
            {"role": "assistant", "content": "A) a"},
        ],
    }]
    out = str(tmp_path / "reason_out")
    res = reason_llm(st, llm, proj_params, rows, out,
                     reasoning_sampling_num=3, reasoning_temperature=0.7,
                     reasoning_selection_type="majority_voting",
                     frame_size=32)
    assert sampled == [(3, 0.7)]
    rec = res["sorting_sponge"][0]
    assert rec["final_true_answer"] == "A"
    assert rec["option_counts"] == {"A": 2, "B": 1}
    assert rec["final_generation"].startswith("Answer: A")
    # the generate_idx=0 description turn was replaced by a generation
    desc_turn = rec["chat"][1]
    assert desc_turn["generate"] is True
    assert desc_turn["true_answer"] == "Object 1: soft."
    assert desc_turn["content"] in ("hard", "soft")
    path = os.path.join(out, "reason", "sorting_sponge.json")
    assert json.load(open(path))[0]["reasoning_sampling_num"] == 3

    # best_of_n picks B (reference normalized-confidence math)
    res2 = reason_llm(st, llm, proj_params, rows, out,
                      reasoning_sampling_num=3,
                      reasoning_selection_type="best_of_n", frame_size=32)
    assert res2["sorting_sponge"][0]["final_generation"] == "Answer: B"

    # sampling_num=1 falls back to one greedy pass (run_llm.py:268-272)
    res3 = reason_llm(st, llm, proj_params, rows, out,
                      reasoning_sampling_num=1, frame_size=32)
    assert res3["sorting_sponge"][0]["final_generation"] in ("hard", "soft")

    # RAG hook appends retrieved objects to the description turn (:258-264)
    res4 = reason_llm(st, llm, proj_params, rows, out,
                      reasoning_sampling_num=1, frame_size=32,
                      rag_fn=lambda feats: " sponge; towel;")
    assert "Most similar objects" in res4["sorting_sponge"][0]["chat"][1][
        "content"]


def test_render_chat():
    from vla_touch_tpu.planning.run_llm import render_chat

    chat = [{"role": "user", "content": "hi"},
            {"role": "assistant", "content": "yo"}]
    s = render_chat(chat)
    assert s.endswith("<|im_start|>assistant\n")
    assert "<|im_start|>user\nhi<|im_end|>\n" in s
    assert render_chat(chat, add_generation_prompt=False).endswith(
        "yo<|im_end|>\n")


def test_reason_llm_without_sample_fn_raises(qa_setup, tmp_path):
    """A contract-conforming LLMInterface without sample_fn gets a clear
    error from reasoning mode instead of an AttributeError."""
    from vla_touch_tpu.planning.run_llm import reason_llm

    qa_path, rng = qa_setup
    st = PE.init_tactile_encoder(TINY_CLIP, jax.random.PRNGKey(0))
    llm = _stub_llm(rng)
    assert llm.sample_fn is None
    with pytest.raises(ValueError, match="sample_fn"):
        reason_llm(st, llm, {}, [], str(tmp_path),
                   reasoning_sampling_num=3)
