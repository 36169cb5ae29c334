"""T5 language-embedding precompute path.

The reference keeps T5-XXL OUT of the training loop and precomputes
instruction embeddings to disk (``/root/reference/VLA/models/multimodal_
encoder/t5_encoder.py`` + the ``encode_lang*.py`` tools,
``main.py:163-168``).  We preserve that design: embeddings are produced
host-side once (torch/transformers) and consumed as arrays; nothing at
train/serve time depends on the LLM.

``T5Embedder`` wraps any HF T5 encoder checkpoint; tests use a tiny
random-init config.  ``LanguageEncoder`` reproduces the three tool surfaces:
single instruction (``encode_lang.py``), directory batch
(``encode_lang_batch.py``), and list→dict with an ``all_instructions`` index
(``encode_lang_list.py:15-60`` — the dict the inference loop reads).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np


class T5Embedder:
    """Frozen T5 encoder -> (L, D) embeddings (host-side, torch)."""

    def __init__(self, model_name_or_path: str = "google/t5-v1_1-xxl",
                 max_length: int = 1024, model=None, tokenizer=None,
                 device: str = "cpu"):
        import torch

        self.max_length = max_length
        self.device = device
        if model is not None:
            self.model, self.tokenizer = model, tokenizer
        else:
            from transformers import AutoTokenizer, T5EncoderModel

            self.tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)
            self.model = T5EncoderModel.from_pretrained(model_name_or_path)
        self.model.eval().to(device)
        for p in self.model.parameters():
            p.requires_grad_(False)
        self._torch = torch

    def get_text_embeddings(self, texts: Sequence[str]) -> list:
        """List of (L_i, D) float32 arrays (unpadded valid tokens only)."""
        torch = self._torch
        out = []
        with torch.no_grad():
            for text in texts:
                tok = self.tokenizer(text, return_tensors="pt",
                                     truncation=True,
                                     max_length=self.max_length)
                hidden = self.model(
                    tok["input_ids"].to(self.device),
                    attention_mask=tok["attention_mask"].to(self.device),
                ).last_hidden_state[0]
                out.append(hidden.float().cpu().numpy())
        return out


class LanguageEncoder:
    """The encode_lang tool surfaces over any embedder with
    ``get_text_embeddings``."""

    def __init__(self, embedder):
        self.embedder = embedder

    def encode_instruction(self, instruction: str) -> np.ndarray:
        return self.embedder.get_text_embeddings([instruction])[0]

    def encode_instructions(self, instructions: Sequence[str]) -> dict:
        """list -> {'all_instructions': [...], '<instruction>': (L, D)}
        (encode_lang_list.py:15-60 — consumed by the inference loop's
        instruction-switch key handler)."""
        embeds = self.embedder.get_text_embeddings(list(instructions))
        out = {"all_instructions": list(instructions)}
        for ins, emb in zip(instructions, embeds):
            out[ins] = emb
        return out

    def encode_directory(self, dir_path: str, out_suffix: str = "_lang.npy",
                         instruction_file: str = "instruction.txt") -> list:
        """Per-episode-directory batch precompute (encode_lang_batch.py):
        reads ``<episode>/instruction.txt`` and writes the embedding
        alongside."""
        written = []
        for name in sorted(os.listdir(dir_path)):
            epi = os.path.join(dir_path, name)
            ins_path = os.path.join(epi, instruction_file)
            if not os.path.isdir(epi) or not os.path.exists(ins_path):
                continue
            with open(ins_path) as f:
                instruction = f.read().strip()
            emb = self.encode_instruction(instruction)
            out_path = os.path.join(epi, f"instruct{out_suffix}")
            np.save(out_path, emb)
            written.append(out_path)
        return written


def main(argv=None):
    """encode_lang CLI (≙ encode_lang.py / encode_lang_batch.py /
    encode_lang_list.py): precompute instruction embeddings."""
    import argparse

    p = argparse.ArgumentParser(description="Precompute T5 instruction "
                                            "embeddings")
    p.add_argument("--model", default="google/t5-v1_1-xxl")
    p.add_argument("--instruction", action="append", default=[],
                   help="repeatable; saved as an instruction dict")
    p.add_argument("--episodes_dir", default=None,
                   help="batch mode: embed each episode's instruction.txt")
    p.add_argument("--out", default="instructions.npz")
    args = p.parse_args(argv)

    enc = LanguageEncoder(T5Embedder(args.model))
    if args.episodes_dir:
        written = enc.encode_directory(args.episodes_dir)
        print(f"wrote {len(written)} embeddings under {args.episodes_dir}")
    if args.instruction:
        d = enc.encode_instructions(args.instruction)
        save_instruction_dict(args.out, d)
        print(f"wrote {len(args.instruction)} instructions to {args.out}")


def save_instruction_dict(path: str, d: dict) -> None:
    np.savez(path, all_instructions=np.asarray(d["all_instructions"]),
             **{f"emb_{i}": d[k] for i, k in enumerate(d["all_instructions"])})


def load_instruction_dict(path: str) -> dict:
    z = np.load(path, allow_pickle=False)
    names = [str(x) for x in z["all_instructions"]]
    out = {"all_instructions": names}
    for i, n in enumerate(names):
        out[n] = z[f"emb_{i}"]
    return out


if __name__ == "__main__":
    main()
