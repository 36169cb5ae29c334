"""Controller-dataset generation: offline VLA distillation pass.

Equivalent of
``/root/reference/VLA/data/create_controller_dataset_episode.py:129-213``:
for every timestep of every episode, run the finetuned RDT policy on the
2-frame observation window and write the predicted action chunk into new h5
keys ``vla_action`` (T, chunk, 10) plus the 384² ``camera1_resized`` /
``camera2_resized`` frames the controller trains against.

The JPEG round-trip of the reference (:55-58) is reproduced so controller
training sees the same compression artifacts as deployment.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable

import numpy as np

from vla_touch_tpu.data.episode import qpos_from_episode
from vla_touch_tpu.utils.image import pad_and_resize_for_siglip


def _jpeg_roundtrip(img: np.ndarray, quality: int = 90) -> np.ndarray:
    import cv2

    ok, enc = cv2.imencode(".jpg", img[:, :, ::-1],
                           [cv2.IMWRITE_JPEG_QUALITY, quality])
    assert ok
    return cv2.imdecode(enc, cv2.IMREAD_COLOR)[:, :, ::-1]


def record_vla_actions_for_episode(
        h5_in: str, h5_out: str, policy_step: Callable,
        instruction_key: str = "instruct_embeddings",
        image_size: int = 384, batch_hint: int = 1) -> str:
    """Augment one episode.

    ``policy_step(proprio (10,), images [6 x HxWx3 or None], text_embeds
    (L, D)) -> (1, chunk, 10)`` — the deployment policy wrapper's ``step``.
    """
    import h5py

    shutil.copy(h5_in, h5_out)
    with h5py.File(h5_out, "a") as f:
        qpos = qpos_from_episode(f)
        T = qpos.shape[0]
        cam1 = np.asarray(f["camera1"]["camera1"])
        cam2 = np.asarray(f["camera2"]["camera2"])
        text = np.asarray(f[instruction_key])[0]

        chunks = []
        resized1 = np.zeros((T, image_size, image_size, 3), np.uint8)
        resized2 = np.zeros((T, image_size, image_size, 3), np.uint8)
        for t in range(T):
            t_prev = max(t - 1, 0)
            # JPEG round-trip on the observation frames (reference :55-58).
            frames = [
                _jpeg_roundtrip(cam1[t_prev]), _jpeg_roundtrip(cam2[t_prev]),
                None,
                _jpeg_roundtrip(cam1[t]), _jpeg_roundtrip(cam2[t]), None,
            ]
            chunk = np.asarray(policy_step(qpos[t], frames, text))
            chunks.append(chunk[0])
            resized1[t] = pad_and_resize_for_siglip(frames[3], image_size)
            resized2[t] = pad_and_resize_for_siglip(frames[4], image_size)

        vla = np.stack(chunks).astype(np.float32)   # (T, chunk, 10)
        for key in ("vla_action", "camera1_resized", "camera2_resized"):
            if key in f:
                del f[key]
        f.create_dataset("vla_action", data=vla)
        f.create_dataset("camera1_resized", data=resized1, compression="lzf")
        f.create_dataset("camera2_resized", data=resized2, compression="lzf")
    return h5_out


def record_vla_actions_for_dataset(in_dir: str, out_dir: str,
                                   policy_step: Callable,
                                   image_size: int = 384) -> list:
    """Reference-named batch entry (:129-213): augment every episode h5."""
    from vla_touch_tpu.data.episode import list_episode_files

    os.makedirs(out_dir, exist_ok=True)
    out = []
    for path in list_episode_files(in_dir):
        dst = os.path.join(out_dir, os.path.basename(path))
        out.append(record_vla_actions_for_episode(
            path, dst, policy_step, image_size=image_size))
    return out
