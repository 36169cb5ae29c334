"""Raw-capture → episode-h5 conversion pipeline.

Equivalent of ``/root/reference/VLA/data/franka_data/`` (steps 1-4):

1. :func:`label_instructions` — attach an instruction to each episode
   directory (the reference's interactive video labeler,
   ``1_insturction_label.py``, done programmatically here);
2. :func:`precompute_instructions` — per-episode T5 embedding
   (``2_precompute_instruction.py:8-30``);
3. :func:`process_gelsight` — marker tracking over ``gel_*.jpg`` frames →
   ``forces.npy`` / ``displacement.npy`` (``3_gelsight_data.py:6-40``),
   using the on-device tracker;
4. :func:`convert_to_hdf5` — episode directory (camera jpgs + npys +
   instruction embedding) → one lzf-compressed ``episode_*.h5``
   (``4_convert_to_hdf5.py:20-60``) in the framework schema
   (:mod:`vla_touch_tpu.data.episode`).

Episode directory layout expected::

    episode_dir/
      camera1/000000.jpg ...      camera2/000000.jpg ...
      gelsight/000000.jpg ...
      ee_poses.npy (T, 7)         gripper_pos.npy (T,)
      instruction.txt             [instruct_lang.npy after step 2]
      [gelsight_force/forces.npy + displacement.npy after step 3]
"""

from __future__ import annotations

import os
import re
from typing import Optional, Sequence

import numpy as np


def _sorted_frames(d: str, pattern: str = r".*\.(jpg|jpeg|png)$") -> list:
    rx = re.compile(pattern, re.IGNORECASE)
    names = [n for n in os.listdir(d) if rx.match(n)]

    def key(s):
        return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]

    return [os.path.join(d, n) for n in sorted(names, key=key)]


def _load_frames(paths: Sequence[str]) -> np.ndarray:
    import cv2

    frames = []
    for p in paths:
        img = cv2.imread(p, cv2.IMREAD_COLOR)
        frames.append(img[:, :, ::-1])  # BGR -> RGB
    return np.stack(frames)


def label_instructions(capture_root: str, labels: dict) -> None:
    """Write ``instruction.txt`` per episode dir from a name->text map."""
    for name, text in labels.items():
        path = os.path.join(capture_root, name, "instruction.txt")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(text.strip() + "\n")


def precompute_instructions(capture_root: str, embedder) -> list:
    """Step 2: embed each episode's instruction, save
    ``instruct_lang.npy``."""
    from vla_touch_tpu.models.encoders.t5 import LanguageEncoder

    return LanguageEncoder(embedder).encode_directory(capture_root)


def process_gelsight(episode_dir: str, tracker_cfg=None) -> dict:
    """Step 3: marker-track the ``gelsight/`` frames against the first
    (calibration) frame; save forces (T, 3) and displacement (T, 2)."""
    from vla_touch_tpu.ops import marker_tracking as MT

    cfg = tracker_cfg or MT.TrackerConfig()
    frames = _load_frames(_sorted_frames(os.path.join(episode_dir,
                                                      "gelsight")))
    baseline = MT.calibrate(frames[0], cfg)
    out = MT.estimate_force_sequence(frames, baseline, cfg)
    forces = np.asarray(out["forces"], np.float32)
    disps = np.asarray(out["displacements"], np.float32)
    os.makedirs(os.path.join(episode_dir, "gelsight_force"), exist_ok=True)
    np.save(os.path.join(episode_dir, "gelsight_force", "forces.npy"), forces)
    np.save(os.path.join(episode_dir, "gelsight_force", "displacement.npy"),
            disps)
    return {"forces": forces, "displacements": disps}


def convert_to_hdf5(episode_dir: str, out_path: str) -> str:
    """Step 4: assemble the episode h5 (lzf compression, framework schema)."""
    import h5py

    ee_poses = np.load(os.path.join(episode_dir, "ee_poses.npy"))
    gripper = np.load(os.path.join(episode_dir, "gripper_pos.npy"))
    cam1 = _load_frames(_sorted_frames(os.path.join(episode_dir, "camera1")))
    cam2 = _load_frames(_sorted_frames(os.path.join(episode_dir, "camera2")))
    instruct = np.load(os.path.join(episode_dir, "instruct_lang.npy"))
    forces = np.load(os.path.join(episode_dir, "gelsight_force",
                                  "forces.npy"))
    disps = np.load(os.path.join(episode_dir, "gelsight_force",
                                 "displacement.npy"))

    T = min(len(ee_poses), len(gripper), len(cam1), len(cam2), len(forces))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with h5py.File(out_path, "w") as f:
        f.create_dataset("ee_poses", data=ee_poses[:T])
        f.create_dataset("gripper_pos", data=gripper[:T])
        g1 = f.create_group("camera1")
        g1.create_dataset("camera1", data=cam1[:T], compression="lzf")
        g2 = f.create_group("camera2")
        g2.create_dataset("camera2", data=cam2[:T], compression="lzf")
        f.create_dataset("instruct_embeddings", data=instruct[None]
                         if instruct.ndim == 2 else instruct)
        gf = f.create_group("gelsight_force")
        gf.create_dataset("forces", data=forces[:T])
        gf.create_dataset("displacement", data=disps[:T])
    return out_path


def add_npy_to_h5(h5_path: str, key: str, array: np.ndarray,
                  group: Optional[str] = None) -> None:
    """Utility ≙ ``add_npy_to_h5.py``: attach/replace a dataset."""
    import h5py

    with h5py.File(h5_path, "a") as f:
        node = f.require_group(group) if group else f
        if key in node:
            del node[key]
        node.create_dataset(key, data=array)


def _episodes_in_range(capture_root: str, episode_range: tuple) -> list:
    """Episode dirs named ``*_<num>`` with num in the inclusive range —
    the batch tools' matching rule (``batch_change_name.py:35-44``)."""
    start, end = episode_range
    out = []
    for name in sorted(os.listdir(capture_root)):
        path = os.path.join(capture_root, name)
        if not os.path.isdir(path):
            continue
        parts = name.split("_")
        if len(parts) < 2 or not parts[1].isdigit():
            continue
        if start <= int(parts[1]) <= end:
            out.append(path)
    return out


def batch_rename_files(capture_root: str, episode_range: tuple,
                       old_filename: str, new_filename: str,
                       subfolder: Optional[str] = None) -> dict:
    """Rename one file across a range of episodes
    (≙ ``batch_change_name.py::batch_rename_files``).  Returns
    ``{"renamed": n, "not_found": m}``."""
    import shutil

    renamed, not_found = 0, 0
    for episode_path in _episodes_in_range(capture_root, episode_range):
        file_dir = (os.path.join(episode_path, subfolder) if subfolder
                    else episode_path)
        old_path = os.path.join(file_dir, old_filename)
        if not os.path.exists(old_path):
            not_found += 1
            continue
        shutil.move(old_path, os.path.join(file_dir, new_filename))
        renamed += 1
    return {"renamed": renamed, "not_found": not_found}


def batch_create_instructions(capture_root: str, episode_range: tuple,
                              instruction: str) -> int:
    """Write the same ``instruction.txt`` to a range of episodes without
    reviewing them (≙ ``batch_instruction.py::batch_create_instructions``).
    Returns the number of episodes written."""
    n = 0
    for episode_path in _episodes_in_range(capture_root, episode_range):
        with open(os.path.join(episode_path, "instruction.txt"), "w") as f:
            f.write(instruction.strip() + "\n")
        n += 1
    return n
