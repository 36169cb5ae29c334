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
    - ``start_embed`` / ``end_embed``: delimiter-token embeddings (D,);
    - ``sample_fn(input_embeds, num, temperature, seed) -> list`` of
      ``{"text", "avg_surprisal"}`` dicts — N tempered candidates; optional,
      needed only by :func:`reason_llm` with ``reasoning_sampling_num > 1``.
    """

    dim: int
    embed_text: Callable
    loss_fn: Callable
    generate_fn: Callable
    start_embed: np.ndarray
    end_embed: np.ndarray
    sample_fn: Optional[Callable] = None


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

    def sample_fn(input_embeds, num: int, temperature: float,
                  seed: int = 0):
        """N independent tempered samples of one prompt — the reasoning
        mode's generation call (reference ``run_llm.py:273``).  Returns a
        list of ``{"text", "avg_surprisal", "total_surprisal"}`` dicts
        (surprisal in bits, the reference's ``get_sentence_entropy``
        quantities)."""
        toks, _, surps, lengths = L.sample_generate(
            cfg, params, jnp.asarray(input_embeds)[None],
            jax.random.PRNGKey(seed), max_new_tokens=max_new_tokens,
            eos_id=tok.EOS, lora=lora, temperature=temperature,
            num_return_sequences=num)
        avg = np.asarray(L.sequence_avg_surprisal(surps, lengths))
        out = []
        for i in range(num):
            n = int(lengths[i])
            ids = [int(t) for t in np.asarray(toks[i])
                   if int(t) != tok.EOS][:n]
            out.append({
                "text": tok.decode(ids),
                "avg_surprisal": float(avg[i]),
                "total_surprisal": float(avg[i] * max(n, 1)),
            })
        return out

    iface = LLMInterface(dim=cfg.hidden_size, embed_text=embed_text,
                         loss_fn=loss_fn, generate_fn=generate_fn,
                         start_embed=np.asarray(L.embed_tokens(
                             params, jnp.asarray([tok.TACTILE_START])))[0],
                         end_embed=np.asarray(L.embed_tokens(
                             params, jnp.asarray([tok.TACTILE_END])))[0],
                         sample_fn=sample_fn)
    iface.last_entropy = None
    iface.tokenizer = tok
    return iface


# --------------------------------------------------------------------------
# Scenario reasoning (reference run_llm.py:201-330)
# --------------------------------------------------------------------------


def render_chat(chat: list, add_generation_prompt: bool = True) -> str:
    """Render role/content turns to one prompt string — the analogue of the
    reference's ``tokenizer.apply_chat_template`` (run_llm.py:244,266) in
    ChatML form; our LLM surfaces consume raw text, so the template is
    plain text rather than tokenizer-owned."""
    parts = [f"<|im_start|>{t['role']}\n{t['content']}<|im_end|>\n"
             for t in chat]
    if add_generation_prompt:
        parts.append("<|im_start|>assistant\n")
    return "".join(parts)


def parse_answer_option(text: str) -> str:
    """Extract the lettered answer: first character after the last
    ``"Answer: "`` (the whole text's first character when absent) with
    ``*`` markdown stripped — exactly reference run_llm.py:285."""
    return text.replace("*", "").split("Answer: ")[-1][:1]


def select_generation(candidates: list, selection_type: str,
                      valid_options=("A", "B", "C"), rng=None):
    """Pick the final generation from N sampled candidates
    (reference run_llm.py:275-306).

    ``candidates``: list of ``{"text", "avg_surprisal"}`` dicts (surprisal
    in bits/token, :func:`planning.llm.sequence_avg_surprisal`).

    - ``majority_voting``: the option with the most votes; a random
      generation among its supporters (run_llm.py:299-302).
    - ``best_of_n``: per-candidate normalized confidence
      ``(max_avg - avg_i) / max_avg`` with ``max_avg`` over ALL candidates
      (run_llm.py:279-280 — the reference's ``avg_entropy_per_token`` is
      this surprisal); options ranked by SUM of their supporters' scores,
      the winner's highest-scored generation returned (run_llm.py:303-306).

    Returns ``(final_text, option, option_counts, option_scores)``; when no
    candidate parses to a valid option the first candidate is returned with
    ``option=None`` (the reference raises on an empty max() — run_llm.py
    :300 — which a driver must not)."""
    import random as _random

    rng = rng or _random.Random(0)
    option_generations: dict = {}
    option_counts: dict = {}
    option_scores: dict = {}
    if selection_type not in ("majority_voting", "best_of_n"):
        raise ValueError(selection_type)
    max_avg = max(c["avg_surprisal"] for c in candidates)
    for c in candidates:
        option = parse_answer_option(c["text"])
        if option not in valid_options:
            continue
        score = ((max_avg - c["avg_surprisal"]) / max_avg
                 if max_avg > 0 else 0.0)
        option_generations.setdefault(option, []).append(c["text"])
        option_counts[option] = option_counts.get(option, 0) + 1
        option_scores.setdefault(option, []).append(score)
    if not option_counts:
        return candidates[0]["text"], None, {}, {}
    if selection_type == "majority_voting":
        best = max(option_counts, key=option_counts.get)
        final = rng.choice(option_generations[best])
    else:
        best = max(option_scores, key=lambda k: sum(option_scores[k]))
        idx = option_scores[best].index(max(option_scores[best]))
        final = option_generations[best][idx]
    return final, best, option_counts, {
        k: sum(v) for k, v in option_scores.items()}


def reason_llm(encoder_state: PE.TactileEncoderState, llm: LLMInterface,
               proj_params: dict, rows: list, output_dir: str, *,
               reasoning_sampling_num: int = 1,
               reasoning_temperature: float = 0.7,
               reasoning_selection_type: str = "majority_voting",
               generate_idx=(0,), answer_step_idx: Optional[int] = None,
               frame_size: int = 224, seed: int = 0,
               rag_fn: Optional[Callable] = None) -> dict:
    """Scenario-reasoning driver (reference ``run_llm.py:201-330``).

    ``rows`` are chat-schema rows (``qa.generate_physiclear_scenario_qa``):
    walk each chat, greedy-generating the assistant turns whose index is in
    ``generate_idx`` (descriptions/rankings) and keeping the dataset's text
    for the rest; the FINAL turn is answered with ``reasoning_sampling_num``
    tempered samples reduced by :func:`select_generation` (one greedy pass
    when 1, run_llm.py:268-272).  Dumps ``reason/{scenario}.json`` per
    scenario and returns ``{scenario: [records]}``."""
    from vla_touch_tpu.planning.qa import TACT_MARKER
    from vla_touch_tpu.planning.llm_splice import TACTILE_PLACEHOLDER

    proj = TactileProjector(llm.dim)

    def splice(text: str, feats: list):
        text = text.replace(TACT_MARKER, TACTILE_PLACEHOLDER)
        n = text.count(TACTILE_PLACEHOLDER)
        return process_user_input(
            text, feats[:n], llm.embed_text, lambda f: f,
            lambda f: np.asarray(proj.apply({"params": proj_params},
                                            jnp.asarray(f)))[None],
            llm.start_embed, llm.end_embed)

    if reasoning_sampling_num > 1 and llm.sample_fn is None:
        raise ValueError(
            "reasoning_sampling_num > 1 needs an LLMInterface with "
            "sample_fn (see make_llm_interface); got None")
    all_reason: dict = {}
    sample_no: dict = {}
    for ri, row in enumerate(rows):
        info = row.get("info", {})
        scenario = f"{info.get('scenario', 'scenario')}_" \
                   f"{info.get('target', ri)}"
        chat = list(row["chat"])
        if answer_step_idx is not None:
            chat = chat[: int(answer_step_idx) * 2]
        feats = [_encode_video(encoder_state, v, frame_size)
                 for v in info.get("tactile", [])]
        sample_no[scenario] = sample_no.get(scenario, 0) + 1
        generated_chat = []
        for c in range(len(chat) - 1):
            turn = dict(chat[c])
            if c % 2 == 0:                                  # user turn
                generated_chat.append(turn)
                continue
            answer_idx = (c - 1) // 2
            if answer_idx in tuple(generate_idx):
                prompt = render_chat(generated_chat)
                generation = llm.generate_fn(splice(prompt, feats))
                turn["generate"] = True
                turn["true_answer"] = turn["content"]
                turn["content"] = generation
            else:
                turn["generate"] = False
            if answer_idx == 0 and rag_fn is not None:
                # RAG: append the retrieved most-similar objects to the
                # first (description) answer — reference run_llm.py:258-264.
                turn["content"] += ("\nMost similar objects (in order of "
                                    "decreasing similarity):"
                                    + rag_fn(feats))
            generated_chat.append(turn)

        final_prompt = render_chat(generated_chat)
        final_true_answer = chat[-1]["content"][:1]
        option_counts: dict = {}
        option_scores: dict = {}
        if reasoning_sampling_num == 1:
            final_generation = llm.generate_fn(splice(final_prompt, feats))
        else:
            cands = llm.sample_fn(splice(final_prompt, feats),
                                  reasoning_sampling_num,
                                  reasoning_temperature, seed=seed + ri)
            # option letters follow the scenario's candidate count (the QA
            # generators bound it only by the data, not by 4)
            letters = tuple(chr(ord("A") + i)
                            for i in range(info.get("num_candidates", 3)))
            final_generation, _, option_counts, option_scores = \
                select_generation(cands, reasoning_selection_type,
                                  valid_options=letters)
        all_reason.setdefault(scenario, []).append({
            "sample_no": sample_no[scenario],
            "sample_paths": list(info.get("tactile", [])),
            "all_objects": info.get("objects", {}),
            "num_candidates": info.get("num_candidates"),
            "chat": generated_chat,
            "generate_idx": list(generate_idx),
            "answer_step_idx": answer_step_idx,
            "reasoning_sampling_num": reasoning_sampling_num,
            "reasoning_selection_type": reasoning_selection_type,
            "final_true_answer": final_true_answer,
            "final_generation": final_generation,
            "option_counts": option_counts,
            "option_entropies": option_scores,
        })

    reason_dir = os.path.join(output_dir, "reason")
    os.makedirs(reason_dir, exist_ok=True)
    for scenario, records in all_reason.items():
        with open(os.path.join(reason_dir, f"{scenario}.json"), "w") as f:
            json.dump(records, f, indent=2)
    return all_reason


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
