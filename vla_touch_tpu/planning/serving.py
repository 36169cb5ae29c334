"""Tactile-description serving.

Equivalent of the FastAPI demo server
(``/root/reference/octopi/octopi_s/demo.py:22-70``) and its helpers
(``utils/demo_utils.py:21-278``): describe / rank endpoints over the tactile
encoder (+ optional LLM), chat-history persistence.

The HTTP layer is optional (fastapi is not in the base image); the service
object is framework code and is served either through FastAPI when available
or driven directly (tests, batch jobs).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional

import numpy as np

from vla_touch_tpu.planning import encoder as PE
from vla_touch_tpu.planning.datasets import clip_preprocess
from vla_touch_tpu.planning.frames import extract_salient_frames
from vla_touch_tpu.planning.qa import describe


class TactileDescriptionService:
    """describe/rank over tactile videos (demo_utils.describe_rank)."""

    def __init__(self, state: PE.TactileEncoderState,
                 llm_fn: Optional[Callable] = None,
                 history_path: Optional[str] = None,
                 frame_size: int = 224, sensor: str = "dotted"):
        self.state = state
        self.llm_fn = llm_fn
        self.history_path = history_path
        self.frame_size = frame_size
        self.sensor = sensor

    def _record(self, kind: str, payload: dict):
        if not self.history_path:
            return
        os.makedirs(os.path.dirname(self.history_path) or ".", exist_ok=True)
        with open(self.history_path, "a") as f:
            f.write(json.dumps({"kind": kind, "ts": time.time(),
                                **payload}) + "\n")

    def _encode(self, frames: np.ndarray):
        import jax.numpy as jnp

        idx = extract_salient_frames(frames.mean(-1) if frames.ndim == 4
                                     else frames)
        sal = frames[np.clip(idx, 0, len(frames) - 1)]
        pre = clip_preprocess(sal.astype(np.uint8), self.frame_size)
        feats = PE.encode_tactile_video(
            self.state.cfg, self.state.clip_params, self.state.adapter_params,
            jnp.asarray(pre)[None], self.sensor)
        return np.asarray(feats)[0]

    def describe(self, frames: np.ndarray) -> dict:
        """Tactile video -> property estimates + text description."""
        import jax.numpy as jnp

        feats = self._encode(frames)
        props = np.asarray(PE.classify_properties(
            self.state.classifier_params, jnp.asarray(feats)[None]))[0]
        if self.llm_fn is not None:
            text = self.llm_fn(
                f"Describe a surface with hardness {props[0]:.1f} and "
                f"roughness {props[1]:.1f} on a 0-10 scale.")
        else:
            text = describe(float(props[0]), float(props[1]))
        out = {"hardness": float(props[0]), "roughness": float(props[1]),
               "description": text}
        self._record("describe", out)
        return out

    def rank(self, videos: list, prop: str = "hardness") -> dict:
        """Rank uploaded videos by a property (ascending)."""
        import jax.numpy as jnp

        values = []
        for frames in videos:
            feats = self._encode(np.asarray(frames))
            props = np.asarray(PE.classify_properties(
                self.state.classifier_params, jnp.asarray(feats)[None]))[0]
            values.append(float(props[0] if prop == "hardness" else props[1]))
        order = list(np.argsort(values))
        out = {"property": prop, "values": values,
               "ranking": [int(i) for i in order]}
        self._record("rank", out)
        return out

    def guess(self, frames: np.ndarray, candidates: list) -> dict:
        """Which lettered candidate is the touched object?
        (``demo.py:181-206`` ``guess_touch_given_objects``: describe the
        touch, then ask for a distinguishing case per option ending in
        ``'Answer: <letter>'``.)  Requires ``llm_fn``."""
        from vla_touch_tpu.planning.run_llm import parse_answer_option

        if self.llm_fn is None:
            raise RuntimeError("guess requires an llm_fn")
        desc = self.describe(frames)
        letters = [chr(ord("A") + i) for i in range(len(candidates))]
        options = ", ".join(f"{l}) {c}" for l, c in zip(letters, candidates))
        prompt = (
            f"The touched object feels: {desc['description']}\n"
            f"Determine which option the above object is likely to be: "
            f"{options}?\nFollow the steps below: 1. Select the surface "
            "texture descriptions that help to distinguish between the "
            "given options. 2. Give a succinct case for each option using "
            "the selected descriptions. 3. Select the best option and "
            "format your answer in the format 'Answer: <letter>) <name> "
            "is the most likely option because <reason(s)>'.")
        generation = self.llm_fn(prompt)
        option = parse_answer_option(generation)
        out = {"candidates": list(candidates),
               "option": option if option in letters else None,
               "generation": generation, **{"description":
                                            desc["description"]}}
        self._record("guess", out)
        return out

    def ask(self, query: str) -> dict:
        """Free-form follow-up through the LLM (``demo.py:209-224``)."""
        if self.llm_fn is None:
            raise RuntimeError("ask requires an llm_fn")
        answer = self.llm_fn(query)
        out = {"query": query, "answer": answer}
        self._record("ask", out)
        return out

    def reset_history(self) -> None:
        """Truncate the chat-history log (``demo.py:227-231``)."""
        if self.history_path and os.path.exists(self.history_path):
            open(self.history_path, "w").close()


def build_app(service: TactileDescriptionService):
    """FastAPI app over the service (gated: demo.py equivalent)."""
    try:
        from fastapi import FastAPI
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "fastapi is not installed; drive TactileDescriptionService "
            "directly or install fastapi for HTTP serving") from e

    app = FastAPI(title="vla_touch_tpu tactile description service")

    @app.post("/describe")
    def describe_endpoint(payload: dict):
        frames = np.asarray(payload["frames"], np.uint8)
        return service.describe(frames)

    @app.post("/rank")
    def rank_endpoint(payload: dict):
        videos = [np.asarray(v, np.uint8) for v in payload["videos"]]
        return service.rank(videos, payload.get("property", "hardness"))

    @app.post("/guess")
    def guess_endpoint(payload: dict):
        frames = np.asarray(payload["frames"], np.uint8)
        return service.guess(frames, payload["candidates"])

    @app.post("/ask")
    def ask_endpoint(payload: dict):
        return service.ask(payload["query"])

    @app.post("/reset")
    def reset_endpoint():
        service.reset_history()
        return {"ok": True}

    return app
