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
