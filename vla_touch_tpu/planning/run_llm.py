"""Tactile-LLM train / test / reason driver.

Equivalent of ``/root/reference/octopi/octopi_s/run_llm.py``: freeze the
tactile encoder, train the tactile→LLM projection (and optionally the LLM's
adapters) on QA data (``:95-160``), greedy-decode a test split dumping
predictions JSON (``:162-200``), and scenario reasoning with optional RAG.

The LLM is pluggable through :class:`LLMInterface` — a served Qwen/LLaMA on
the mesh in production, a tiny stub in tests.  The reference's
``infer_auto_device_map`` multi-GPU dispatch (``llm.py:45-75``) is replaced
by NamedSharding placement when the LLM runs on the mesh; the framework-side
logic (projection training, splicing, decoding harness) is identical either
way.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vla_touch_tpu.planning import encoder as PE
from vla_touch_tpu.planning.datasets import TactileLLMDataset, clip_preprocess, load_video_frames
from vla_touch_tpu.planning.llm_splice import TactileProjector, process_user_input


@dataclasses.dataclass
class LLMInterface:
    """Minimal embedding-space LLM contract.

    - ``embed_text(str) -> (L, D)`` input embeddings;
    - ``loss_fn(input_embeds, answer) -> scalar`` differentiable w.r.t. the
      input embeddings (teacher-forced LM loss);
    - ``generate_fn(input_embeds) -> str`` greedy decode;
    - ``start_embed`` / ``end_embed``: delimiter-token embeddings (D,).
    """

    dim: int
    embed_text: Callable
    loss_fn: Callable
    generate_fn: Callable
    start_embed: np.ndarray
    end_embed: np.ndarray


def _encode_video(encoder_state: PE.TactileEncoderState, video_dir: str,
                  frame_size: int, max_frames: int = 4, sensor: str = "dotted"):
    frames = load_video_frames(video_dir, max_frames=max_frames)
    pre = clip_preprocess(frames, frame_size)
    feats = PE.encode_tactile_video(
        encoder_state.cfg, encoder_state.clip_params,
        encoder_state.adapter_params, jnp.asarray(pre)[None], sensor)
    return np.asarray(feats)[0]


def train_projection(encoder_state: PE.TactileEncoderState,
                     llm: LLMInterface, dataset: TactileLLMDataset,
                     output_dir: str, epochs: int = 3, lr: float = 1e-4,
                     frame_size: int = 224, seed: int = 0,
                     proj_params: Optional[dict] = None) -> dict:
    """Train the tactile projector against the (frozen) LLM loss."""
    proj = TactileProjector(llm.dim)
    if proj_params is None:
        proj_params = proj.init(jax.random.PRNGKey(seed),
                                jnp.zeros((1, encoder_state.feature_dim))
                                )["params"]
    opt = optax.adamw(lr)
    opt_state = opt.init(proj_params)
    os.makedirs(output_dir, exist_ok=True)
    log_path = os.path.join(output_dir, "llm_training.jsonl")

    step = 0
    for epoch in range(epochs):
        for i in range(len(dataset)):
            row = dataset[i]
            feats = [
                _encode_video(encoder_state, v, frame_size)
                for v in row["tactile"]
            ]

            def loss_fn(p):
                embeds = process_user_input(
                    row["question"], feats, llm.embed_text,
                    lambda f: f,
                    lambda f: proj.apply({"params": p},
                                         jnp.asarray(f))[None],
                    llm.start_embed, llm.end_embed)
                return llm.loss_fn(jnp.asarray(embeds), row["answer"])

            loss, g = jax.value_and_grad(loss_fn)(proj_params)
            updates, opt_state = opt.update(g, opt_state, proj_params)
            proj_params = optax.apply_updates(proj_params, updates)
            if step % 5 == 0:
                with open(log_path, "a") as f:
                    f.write(json.dumps({"step": step, "epoch": epoch,
                                        "loss": float(loss)}) + "\n")
            step += 1

    from vla_touch_tpu.utils.checkpoint import save_pytree

    save_pytree(os.path.join(output_dir, "projection.msgpack"), proj_params)
    return proj_params


def test_llm(encoder_state: PE.TactileEncoderState, llm: LLMInterface,
             proj_params: dict, dataset: TactileLLMDataset, output_dir: str,
             frame_size: int = 224) -> list:
    """Greedy-decode each test sample, dump predictions JSON
    (``run_llm.py:162-200``)."""
    proj = TactileProjector(llm.dim)
    preds = []
    for i in range(len(dataset)):
        row = dataset[i]
        feats = [_encode_video(encoder_state, v, frame_size)
                 for v in row["tactile"]]
        embeds = process_user_input(
            row["question"], feats, llm.embed_text, lambda f: f,
            lambda f: np.asarray(proj.apply({"params": proj_params},
                                            jnp.asarray(f)))[None],
            llm.start_embed, llm.end_embed)
        preds.append({"question": row["question"],
                      "answer": row.get("answer"),
                      "prediction": llm.generate_fn(embeds)})
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "predictions.json"), "w") as f:
        json.dump(preds, f, indent=2)
    return preds
