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


# --------------------------------------------------------------------------
# Real in-repo decoder (planning/llm.py) behind the same interfaces
# --------------------------------------------------------------------------


def make_llm_interface(cfg, params, tokenizer=None, lora=None,
                       max_new_tokens: int = 32):
    """Build an :class:`LLMInterface` over the real flax decoder
    (``planning/llm.py``) — the production twin of the test stub.

    Replaces the reference's HF model handle (``utils/llm.py:15-113``):
    ``embed_text`` is a table lookup, ``loss_fn`` is the teacher-forced LM
    CE (differentiable through the spliced tactile embeddings), and
    ``generate_fn`` greedy-decodes with per-token entropy introspection
    (``llm.py:223-241``); the last entropies are kept on
    ``iface.last_entropy``.
    """
    from vla_touch_tpu.planning import llm as L

    tok = tokenizer or L.ByteTokenizer()

    def embed_text(s):
        ids = tok.encode(s)
        if not ids:
            return np.zeros((0, cfg.hidden_size), np.float32)
        # jnp (not np) so this also works when called inside a jit trace.
        return L.embed_tokens(params, jnp.asarray(ids))

    def _answer_targets(input_embeds, answer):
        ans_ids = list(tok.encode(answer)) + [tok.EOS]
        Lp = input_embeds.shape[0]
        ans = jnp.asarray(ans_ids, jnp.int32)
        full = jnp.concatenate(
            [jnp.asarray(input_embeds),
             L.embed_tokens(params, ans[:-1])], axis=0)
        Lt = full.shape[0]
        pos = jnp.arange(Lt)
        tgt = jnp.zeros((Lt,), jnp.int32)
        tgt = jax.lax.dynamic_update_slice(tgt, ans, (Lp - 1,))
        mask = (pos >= Lp - 1).astype(jnp.float32)
        return full, tgt, mask

    def loss_fn(input_embeds, answer, lora_override=None):
        full, tgt, mask = _answer_targets(input_embeds, answer)
        return L.lm_loss(cfg, params, full[None], tgt[None], mask[None],
                         lora=(lora_override if lora_override is not None
                               else lora))

    iface = None

    def generate_fn(input_embeds):
        toks, ents, lengths = L.greedy_generate(
            cfg, params, jnp.asarray(input_embeds)[None],
            max_new_tokens=max_new_tokens, eos_id=tok.EOS, lora=lora)
        n = int(lengths[0])
        iface.last_entropy = np.asarray(ents[0][:n])
        out = [int(t) for t in np.asarray(toks[0]) if int(t) != tok.EOS][:n]
        return tok.decode(out)

    iface = LLMInterface(dim=cfg.hidden_size, embed_text=embed_text,
                         loss_fn=loss_fn, generate_fn=generate_fn,
                         start_embed=np.asarray(L.embed_tokens(
                             params, jnp.asarray([tok.TACTILE_START])))[0],
                         end_embed=np.asarray(L.embed_tokens(
                             params, jnp.asarray([tok.TACTILE_END])))[0])
    iface.last_entropy = None
    iface.tokenizer = tok
    return iface


def train_projection_and_lora(encoder_state: PE.TactileEncoderState,
                              cfg, params, dataset: TactileLLMDataset,
                              output_dir: str, epochs: int = 3,
                              lr: float = 1e-3, lora_rank: int = 8,
                              frame_size: int = 224, seed: int = 0,
                              tokenizer=None):
    """Joint tactile-projector + LoRA finetuning through the real decoder
    (reference ``run_llm.py:95-160`` with the peft path ``llm.py:86-113``).

    The base LLM weights stay frozen; gradients flow into the projection
    MLP and the (A, B) LoRA factors only.  Returns (proj_params, lora)."""
    from vla_touch_tpu.planning import llm as L

    tok = tokenizer or L.ByteTokenizer()
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    proj = TactileProjector(cfg.hidden_size)
    proj_params = proj.init(
        k1, jnp.zeros((1, encoder_state.feature_dim)))["params"]
    lora = L.init_lora(cfg, k2, rank=lora_rank)
    iface = make_llm_interface(cfg, params, tok)

    trainable = {"proj": proj_params, "lora": lora["layers"]}
    lscale = lora["scale"]
    opt = optax.adamw(lr)
    opt_state = opt.init(trainable)
    os.makedirs(output_dir, exist_ok=True)
    log_path = os.path.join(output_dir, "llm_training.jsonl")

    # One jitted update per distinct (question, answer, feat-shapes) — the
    # text is static inside the trace, features and trainables are traced.
    step_cache = {}

    def get_step(question: str, answer: str, shapes: tuple):
        key = (question, answer, shapes)
        if key not in step_cache:
            @jax.jit
            def one_step(trainable, opt_state, feats):
                def loss_of(tr):
                    embeds = process_user_input(
                        question, list(feats), iface.embed_text, lambda f: f,
                        lambda f: proj.apply({"params": tr["proj"]},
                                             jnp.asarray(f))[None],
                        iface.start_embed, iface.end_embed)
                    return iface.loss_fn(
                        jnp.asarray(embeds), answer,
                        lora_override={"layers": tr["lora"],
                                       "scale": lscale})

                loss, g = jax.value_and_grad(loss_of)(trainable)
                updates, new_opt = opt.update(g, opt_state, trainable)
                return optax.apply_updates(trainable, updates), new_opt, loss

            step_cache[key] = one_step
        return step_cache[key]

    step = 0
    for epoch in range(epochs):
        for i in range(len(dataset)):
            row = dataset[i]
            feats = tuple(
                jnp.asarray(_encode_video(encoder_state, v, frame_size))
                for v in row["tactile"])
            one_step = get_step(row["question"], row["answer"],
                                tuple(f.shape for f in feats))
            trainable, opt_state, loss = one_step(trainable, opt_state,
                                                  feats)
            with open(log_path, "a") as f:
                f.write(json.dumps({"step": step, "epoch": epoch,
                                    "loss": float(loss)}) + "\n")
            step += 1

    from vla_touch_tpu.utils.checkpoint import save_pytree

    save_pytree(os.path.join(output_dir, "projection.msgpack"),
                trainable["proj"])
    save_pytree(os.path.join(output_dir, "lora.msgpack"),
                {"layers": trainable["lora"], "scale": lscale})
    return trainable["proj"], {"layers": trainable["lora"], "scale": lscale}
