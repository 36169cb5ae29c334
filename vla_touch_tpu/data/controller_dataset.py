"""Controller training dataset (BRIDGeR / LSTM).

Host-side equivalent of
``/root/reference/VLA/residual_controller/controller_dataset.py``: windows
over VLA-augmented episodes with

- motion-onset-aligned (episode, start) index mapping with stride
  (``:72-96``);
- samples: context states, the VLA chunk recorded at ``start + context``
  (``:128-129`` — the chunk predicted *at* the first future step), expert
  future states, GelSight forces + displacements over the whole window,
  resized camera frames for the context (``:101-170``);
- gripper /255 on expert future states and VLA actions (but raw on context
  observations, ``:124-130``);
- global per-dim min/max stats over all files (``:175-236``);
- deterministic train/val file split (``ControllerDataModule`` :386-491``).

Episodes are read through :class:`vla_touch_tpu.data.episode.EpisodeFile`,
so the same dataset serves the VLA-augmented ``.h5`` files AND the native
``.epc`` caches (``data_format='epc'``, packed by ``data/pack_epc.py``
with ``--use_resized``): frames then decode through the GIL-free threaded
C++ JPEG path (or memcpy for ``codec='raw'``, which is byte-identical to
h5 — gated in ``tests/test_native_loader.py``).

Batches are plain numpy dicts; device placement happens in the trainer.
``batches(..., workers=N)`` assembles them in a bounded prefetch thread
pool (``data/pipeline.py``) — with `.epc` episodes the decode runs off the
GIL, so builder threads scale on multi-core hosts.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from vla_touch_tpu.data.episode import (
    GRIPPER_SCALE,
    EpisodeFile,
    list_episode_files,
    qpos_from_episode,
)


class ControllerDataset:
    def __init__(self, data_dir: Optional[str] = None,
                 file_paths: Optional[Sequence[str]] = None,
                 context_frames: int = 2, horizon: int = 8,
                 use_images: bool = True, stride: int = 1,
                 data_format: str = "h5"):
        assert data_dir or file_paths
        pattern = (".epc",) if data_format == "epc" else (".h5",)
        self.file_paths = (list(file_paths) if file_paths
                           else list_episode_files(data_dir, pattern=pattern))
        self.context_frames = context_frames
        self.horizon = horizon
        self.use_images = use_images
        self.stride = stride
        self._build_index()
        self.stats = self.get_normalization_stats()

    def _cam_key(self, f: EpisodeFile, cam: int) -> str:
        # The VLA-augmented h5s carry the distillation pass's 384² frames
        # under camera{N}_resized; an .epc packed with --use_resized holds
        # the same frames as its camera streams.
        return (f"camera{cam}/camera{cam}" if f.is_epc
                else f"camera{cam}_resized")

    def _build_index(self):
        self.episode_indices = []
        for file_idx, path in enumerate(self.file_paths):
            with EpisodeFile(path) as f:
                ref = np.asarray(f["ee_poses"] if "ee_poses" in f
                                 else f["qpos"])
                n = ref.shape[0]
                delta = np.abs(ref - ref[0:1])
                idx = np.where(np.any(delta > 1e-2, axis=1))[0]
                if len(idx) == 0:
                    continue
                last = n - (self.context_frames + self.horizon - 1)
                for start in range(int(idx[0]), last, self.stride):
                    self.episode_indices.append((file_idx, start))

    def __len__(self):
        return len(self.episode_indices)

    def __getitem__(self, i: int) -> dict:
        file_idx, start = self.episode_indices[i]
        ctx, hor = self.context_frames, self.horizon
        with EpisodeFile(self.file_paths[file_idx]) as f:
            qpos = qpos_from_episode(f)[start:start + ctx + hor]
            future = qpos[ctx:].copy()
            future[:, -1] /= GRIPPER_SCALE  # rescale actions, not observations

            # f32 is the canonical VLA dtype (the .epc cache stores f32;
            # casting h5's f64 BEFORE the gripper rescale keeps the two
            # paths byte-identical).
            vla = np.asarray(f["vla_action"][start + ctx],
                             np.float32)[:hor].copy()
            vla[:, -1] /= GRIPPER_SCALE

            forces = np.asarray(f["gelsight_force/forces"]
                                [start:start + ctx + hor], np.float32)
            disps = np.asarray(f["gelsight_force/displacement"]
                               [start:start + ctx + hor], np.float32)

            out = {
                "states": qpos.astype(np.float32),
                "vla_actions": vla,
                "expert_actions": future.astype(np.float32),
                "forces": forces,
                "disps": disps,
            }
            if self.use_images:
                out["images_cam1"] = np.asarray(
                    f[self._cam_key(f, 1)][start:start + ctx],
                    np.float32) / 255.0
                out["images_cam2"] = np.asarray(
                    f[self._cam_key(f, 2)][start:start + ctx],
                    np.float32) / 255.0
        return out

    def get_normalization_stats(self) -> dict:
        d = 10
        a_min = np.full(d, np.inf)
        a_max = np.full(d, -np.inf)
        v_min = np.full(d, np.inf)
        v_max = np.full(d, -np.inf)
        for path in self.file_paths:
            with EpisodeFile(path) as f:
                expert = qpos_from_episode(f)
                expert[:, -1] /= GRIPPER_SCALE
                vla = np.asarray(f["vla_action"], np.float32).copy()
                vla[:, :, -1] /= GRIPPER_SCALE
                a_min = np.minimum(a_min, expert.min(0))
                a_max = np.maximum(a_max, expert.max(0))
                v_min = np.minimum(v_min, vla.min((0, 1)))
                v_max = np.maximum(v_max, vla.max((0, 1)))
        eps = 1e-6
        a_rng = a_max - a_min
        a_rng[a_rng < eps] = 1.0
        v_rng = v_max - v_min
        v_rng[v_rng < eps] = 1.0
        return {
            "action_mins": a_min.astype(np.float32),
            "action_maxs": a_max.astype(np.float32),
            "vla_mins": v_min.astype(np.float32),
            "vla_maxs": v_max.astype(np.float32),
            "action_range": a_rng.astype(np.float32),
            "vla_range": v_rng.astype(np.float32),
        }

    def batches(self, batch_size: int, rng: np.random.Generator,
                shuffle: bool = True, drop_last: bool = True,
                workers: int = 0, prefetch_depth: int = 2):
        """Yield stacked numpy batch dicts.

        ``workers`` > 0 assembles batches in a bounded prefetch thread
        pool (``data/pipeline.py::PrefetchLoader``) so IO/decode overlaps
        the training step; the batch ORDER and CONTENTS are identical to
        the in-line path (each pool task builds one whole batch, and the
        loader yields in submission order)."""
        order = np.arange(len(self))
        if shuffle:
            rng.shuffle(order)
        end = len(order) - (len(order) % batch_size if drop_last else 0)
        starts = [order[i:i + batch_size] for i in range(0, end, batch_size)
                  if not (len(order[i:i + batch_size]) < batch_size
                          and drop_last)]

        def build(idxs):
            samples = [self[int(j)] for j in idxs]
            return {k: np.stack([s[k] for s in samples])
                    for k in samples[0]}

        if workers <= 0:
            for idxs in starts:
                yield build(idxs)
            return

        from vla_touch_tpu.data.pipeline import OrderedPrefetcher

        with OrderedPrefetcher(build, starts, workers=workers,
                               depth=prefetch_depth) as loader:
            yield from loader


class ControllerDataModule:
    """Deterministic train/val file split (reference :386-491)."""

    def __init__(self, data_dir: str, context_frames: int = 2, horizon: int = 8,
                 use_images: bool = True, val_ratio: float = 0.1,
                 stride: int = 1, seed: int = 42, data_format: str = "h5"):
        pattern = (".epc",) if data_format == "epc" else (".h5",)
        files = list_episode_files(data_dir, pattern=pattern)
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(files))
        n_val = max(1, int(len(files) * val_ratio)) if len(files) > 1 else 0
        val_idx = set(order[:n_val].tolist())
        self.train_files = [f for i, f in enumerate(files) if i not in val_idx]
        self.val_files = [f for i, f in enumerate(files) if i in val_idx]
        kw = dict(context_frames=context_frames, horizon=horizon,
                  use_images=use_images, stride=stride)
        self.train_dataset = ControllerDataset(file_paths=self.train_files, **kw)
        self.val_dataset = (ControllerDataset(file_paths=self.val_files, **kw)
                            if self.val_files else None)
        # Deployment uses the train-split stats (reference behavior: stats are
        # computed per-dataset instance over its own files).
        self.stats = self.train_dataset.stats
