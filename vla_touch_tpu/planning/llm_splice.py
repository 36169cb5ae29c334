"""Tactile-token splicing for multimodal LLM serving.

Equivalent of the embedding surgery in
``/root/reference/octopi/octopi_s/utils/llm.py:139-194``: tactile video
features are projected to the LLM width by a 2-layer GELU MLP and spliced
into the input-embedding sequence between ``<|tactile_start|>`` /
``<|tactile_end|>`` delimiter tokens, one feature vector per ``<tact>``
placeholder.

The LLM itself is pluggable (any function over input embeddings — a served
Qwen/LLaMA on the same mesh, or a test stub); this module owns the
projection and the splice, which is the framework-side logic.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

TACTILE_START = "<|tactile_start|>"
TACTILE_END = "<|tactile_end|>"
TACTILE_PLACEHOLDER = "<tact>"


class TactileProjector(fnn.Module):
    """CLIP-video feature -> LLM embedding width (llm.py:139-145)."""

    llm_dim: int
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, feats):
        h = fnn.Dense(self.llm_dim, dtype=self.dtype, name="fc1")(feats)
        h = fnn.gelu(h, approximate=False)
        return fnn.Dense(self.llm_dim, dtype=self.dtype, name="fc2")(h)


def split_on_placeholders(text: str) -> list:
    """Split a prompt on ``<tact>`` placeholders (llm.py:158-166).

    Returns alternating [text, PLACEHOLDER, text, ...] segments.
    """
    parts = text.split(TACTILE_PLACEHOLDER)
    out = []
    for i, p in enumerate(parts):
        if i > 0:
            out.append(TACTILE_PLACEHOLDER)
        if p:
            out.append(p)
    return out


def splice_embeddings(segment_embeds: Sequence[np.ndarray],
                      tactile_feats: Sequence[np.ndarray],
                      start_embed: np.ndarray,
                      end_embed: np.ndarray) -> np.ndarray:
    """Assemble the final input-embedding sequence.

    ``segment_embeds``: embeddings of the text segments between placeholders
    (len = n_tactile + 1); each (L_i, D).
    ``tactile_feats``: projected tactile features, each (T_i, D) (T_i = 1 for
    a single video feature).
    Delimiters wrap every tactile block:
        seg_0, [start, tact_0, end], seg_1, [start, tact_1, end], ...
    """
    assert len(segment_embeds) == len(tactile_feats) + 1

    def as2d(a):
        a = jnp.asarray(a)
        return a[None] if a.ndim == 1 else a

    pieces = [as2d(segment_embeds[0])]
    for feats, seg in zip(tactile_feats, segment_embeds[1:]):
        pieces.append(as2d(start_embed))
        pieces.append(as2d(feats))
        pieces.append(as2d(end_embed))
        pieces.append(as2d(seg))
    # jnp so the splice is traceable/differentiable through projected
    # tactile features (projection training differentiates through here).
    return jnp.concatenate(pieces, axis=0)


def process_user_input(text: str, tactile_videos: list,
                       embed_text_fn: Callable[[str], np.ndarray],
                       encode_video_fn: Callable, project_fn: Callable,
                       start_embed: np.ndarray, end_embed: np.ndarray
                       ) -> np.ndarray:
    """Full input pipeline (llm.py:158-194): split on placeholders, embed
    text segments, encode+project tactile videos, splice."""
    # str.split keeps empty segments between adjacent placeholders (ranking
    # prompts legitimately contain '<tact><tact>'), giving exactly
    # n_videos + 1 text segments.
    text_segments = text.split(TACTILE_PLACEHOLDER)
    n_tact = len(text_segments) - 1
    assert n_tact == len(tactile_videos), (n_tact, len(tactile_videos))
    D = np.asarray(start_embed).shape[-1]
    seg_embeds = [
        embed_text_fn(s) if s else np.zeros((0, D), np.float32)
        for s in text_segments
    ]
    feats = [project_fn(encode_video_fn(v)) for v in tactile_videos]
    return splice_embeddings(seg_embeds, feats, start_embed, end_embed)
