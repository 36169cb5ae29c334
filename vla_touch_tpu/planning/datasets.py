"""Octopi tactile datasets: property regression + tactile-LLM QA.

Host-side equivalents of ``/root/reference/octopi/octopi_s/utils/dataset.py``:

- :class:`TactilePropertyRegressionDataset` (``:44-111``): sample
  directories containing ``tactile/`` frame folders + ``data.json`` with
  split and hardness/roughness labels; batches pad each video to the longest
  frame count in the batch by repeating the first frame (the reference
  collate, ``:18-42``);
- :class:`TactileLLMDataset` (``:113-200``): QA files → (question with
  ``<tact>`` placeholders, tactile video paths, answer) triples, optional
  RAG context;
- frame loading with one shared random crop across a video (``:241-263``).

Sample-directory layout (the PhysiCLeAR convention)::

    data_path/<dataset>_<object>_<n>/
        data.json        {"split": ..., "properties": {"hardness": h,
                          "roughness": r}, "object": name}
        tactile/000.jpg ...
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_preprocess(frames: np.ndarray, frame_size: int = 224) -> np.ndarray:
    """uint8 (L, H, W, 3) -> normalized float32 (L, S, S, 3)."""
    import cv2

    out = np.zeros((frames.shape[0], frame_size, frame_size, 3), np.float32)
    for i, f in enumerate(frames):
        img = cv2.resize(f, (frame_size, frame_size),
                         interpolation=cv2.INTER_CUBIC)
        out[i] = (img.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
    return out


def load_video_frames(tactile_dir: str, max_frames: Optional[int] = None,
                      rng: Optional[np.random.Generator] = None,
                      crop_size: Optional[int] = None) -> np.ndarray:
    """Frames from a tactile directory; one shared random crop across the
    whole video when training (reference :241-263)."""
    import cv2

    names = sorted(os.listdir(tactile_dir))
    paths = [os.path.join(tactile_dir, n) for n in names
             if n.lower().endswith((".jpg", ".jpeg", ".png"))]
    if max_frames and len(paths) > max_frames:
        idx = np.linspace(0, len(paths) - 1, max_frames).astype(int)
        paths = [paths[i] for i in idx]
    frames = np.stack([cv2.imread(p)[:, :, ::-1] for p in paths])
    if crop_size is not None and rng is not None:
        H, W = frames.shape[1:3]
        if H > crop_size and W > crop_size:
            y = int(rng.integers(0, H - crop_size))
            x = int(rng.integers(0, W - crop_size))
            frames = frames[:, y:y + crop_size, x:x + crop_size]
    return frames


class TactilePropertyRegressionDataset:
    def __init__(self, data_path: str, split_name: str,
                 datasets: Sequence[str], frame_size: int = 224,
                 max_frames: int = 8, flip_p: float = 0.0, seed: int = 0):
        self.data_path = data_path
        self.split_name = split_name
        self.frame_size = frame_size
        self.max_frames = max_frames
        self.flip_p = flip_p
        self.rng = np.random.default_rng(seed)
        self.samples: list = []
        for name in sorted(os.listdir(data_path)):
            sample_dir = os.path.join(data_path, name)
            meta_path = os.path.join(sample_dir, "data.json")
            tact_dir = os.path.join(sample_dir, "tactile")
            if not os.path.exists(meta_path) or not os.path.isdir(tact_dir):
                continue
            meta = json.load(open(meta_path))
            if meta.get("split") != split_name:
                continue
            if name.split("_")[0] not in datasets:
                continue
            if "properties" not in meta:
                continue
            self.samples.append({
                "tactile": tact_dir,
                "dataset": name.split("_")[0],
                "properties": np.array(
                    [meta["properties"]["hardness"],
                     meta["properties"]["roughness"]], np.float32),
            })

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i: int) -> dict:
        s = self.samples[i]
        frames = load_video_frames(s["tactile"], self.max_frames, self.rng)
        frames = clip_preprocess(frames, self.frame_size)
        if self.split_name == "train":
            if self.rng.random() < self.flip_p:
                frames = frames[:, :, ::-1]
            if self.rng.random() < self.flip_p:
                frames = frames[:, ::-1]
        return {"frames": frames, "properties": s["properties"],
                "dataset": s["dataset"], "path": s["tactile"]}

    def batches(self, batch_size: int, shuffle: bool = True):
        """Pad every video in a batch to the longest length by repeating the
        first frame (reference collate :18-42)."""
        order = np.arange(len(self))
        if shuffle:
            self.rng.shuffle(order)
        for i in range(0, len(order), batch_size):
            items = [self[int(j)] for j in order[i:i + batch_size]]
            L = max(it["frames"].shape[0] for it in items)
            frames = np.stack([
                np.concatenate(
                    [np.repeat(it["frames"][:1],
                               L - it["frames"].shape[0], axis=0),
                     it["frames"]], axis=0)
                if it["frames"].shape[0] < L else it["frames"]
                for it in items
            ])
            yield {
                "frames": frames,
                "properties": np.stack([it["properties"] for it in items]),
                "datasets": [it["dataset"] for it in items],
                "paths": [it["path"] for it in items],
            }


class TactileLLMDataset:
    """QA samples: each row of a QA json file has a question containing
    ``<tact>`` placeholders, the tactile video dirs, and the answer
    (reference :113-200)."""

    def __init__(self, qa_files: Sequence[str], split_name: str = "train",
                 rag_bank: Optional[dict] = None, retrieval_num: int = 1):
        self.samples: list = []
        self.rag_bank = rag_bank
        self.retrieval_num = retrieval_num
        for path in qa_files:
            for row in json.load(open(path)):
                # Rows without an explicit split are train-only
                # (never leak into eval splits).
                if row.get("split", "train") != split_name:
                    continue
                self.samples.append(row)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i: int) -> dict:
        row = dict(self.samples[i])
        if self.rag_bank is not None and "rag_query" in row:
            from vla_touch_tpu.planning.encoder import rag_lookup

            hits = rag_lookup(self.rag_bank,
                              np.asarray(row["rag_query"], np.float32),
                              top_k=self.retrieval_num)
            context = "; ".join(f"{label} (sim {sim:.2f})"
                                for label, sim in hits)
            row["question"] = f"Similar known objects: {context}.\n" + \
                row["question"]
        return row
