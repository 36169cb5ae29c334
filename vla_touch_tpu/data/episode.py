"""Episode file schema: readers + synthetic-fixture writer.

One ``episode_*.h5`` per episode with the reference's key layout
(``/root/reference/VLA/data/franka_data/4_convert_to_hdf5.py`` and consumers
``unified_vla_dataset_episode.py`` / ``controller_dataset.py``):

====================   ===========================================
``ee_poses``           (T, 7) float — xyz + quaternion (xyzw)
``gripper_pos``        (T,)   float — raw gripper, 0..255 scale
``camera1/camera1``    (T, H, W, 3) uint8 — external camera
``camera2/camera2``    (T, H, W, 3) uint8 — wrist camera
``instruct_embeddings``(1, L, D) float — precomputed T5 embedding
``gelsight_force/forces``        (T, 3) float
``gelsight_force/displacement``  (T, 2) float
``vla_action``         (T, chunk, 10) float — offline-distilled RDT chunks
                       (written by the controller-dataset generator)
``camera1_resized`` /  (T, S, S, 3) uint8 — 384² pad-resized frames
``camera2_resized``    (written alongside ``vla_action``)
====================   ===========================================
"""

from __future__ import annotations

import os
import re
from typing import Optional

import h5py
import numpy as np

from vla_touch_tpu.utils.geometry import quaternion_to_ortho6d

GRIPPER_SCALE = 255.0


def natural_sort(filenames):
    def key(s):
        return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]
    return sorted(filenames, key=key)


def list_episode_files(data_dir: str, pattern=(".h5",)) -> list:
    """Episode files under ``data_dir``.

    Default lists h5 only (several consumers are h5-specific: the controller
    dataset, the distillation writer).  Pass ``(".h5", ".npz")`` for the
    unified sampler.  When the same episode exists in both formats, the h5
    wins (no double counting).
    """
    if isinstance(pattern, str):
        pattern = (pattern,)
    out = []
    for root, _, files in os.walk(data_dir):
        chosen = {}
        for f in files:
            for ext in pattern:
                if f.endswith(ext):
                    stem = f[: -len(ext)]
                    # Prefer .h5 over .npz for same-stem duplicates.
                    if stem not in chosen or ext == ".h5":
                        chosen[stem] = f
        for name in natural_sort(list(chosen.values())):
            out.append(os.path.join(root, name))
    return out


class _EpcFrames:
    """Lazy h5-dataset-like view over one camera of a native .epc cache:
    supports ``.shape`` and integer/slice indexing, decoding only the
    requested frames (GIL-free threaded JPEG, or memcpy for codec=raw)."""

    def __init__(self, cache, cam: int):
        self._cache = cache
        self._cam = cam
        self.shape = (cache.T, cache.H, cache.W, 3)

    def __len__(self):
        return self.shape[0]

    def __getitem__(self, idx):
        if isinstance(idx, (int, np.integer)):
            return self._cache.decode_frames(self._cam, int(idx), 1)[0]
        start, stop, step = idx.indices(self.shape[0])
        if step != 1:
            raise IndexError("only contiguous slices supported")
        return self._cache.decode_frames(self._cam, start,
                                         max(stop - start, 0))

    def __array__(self, dtype=None):
        out = self._cache.decode_frames(self._cam, 0, self.shape[0])
        return out if dtype is None else out.astype(dtype)


class _EpcVla:
    """Lazy h5-dataset-like view over the per-step VLA chunks of a native
    .epc cache: integer indexing reads ONE (chunk, D) record (the
    controller dataset's per-sample access,
    controller_dataset.py ``f['vla_action'][start + ctx]``) instead of
    materializing the full (T, chunk, D) stack."""

    def __init__(self, cache):
        self._cache = cache
        self.shape = (cache.T, cache.chunk, cache.state_dim)

    def __len__(self):
        return self.shape[0]

    def __getitem__(self, idx):
        if isinstance(idx, (int, np.integer)):
            return self._cache.read_window(int(idx), 1,
                                           vla_at=int(idx))["vla"]
        start, stop, step = idx.indices(self.shape[0])
        if step != 1:
            raise IndexError("only contiguous slices supported")
        return np.stack([self[t] for t in range(start, stop)]) \
            if stop > start else np.zeros((0,) + self.shape[1:], np.float32)

    def __array__(self, dtype=None):
        out = self[0:self.shape[0]]
        return out if dtype is None else out.astype(dtype)


class EpisodeFile:
    """Uniform read access over h5, npz and native ``.epc`` episodes (≙ the
    reference's ``UnifiedDataInterface``,
    unified_vla_dataset_episode.py:98-172).

    npz layout flattens the h5 groups: ``camera1/camera1`` becomes
    ``camera1_images`` and ``gelsight_force/forces`` becomes
    ``gelsight_forces`` (the reference's npz key conventions).

    ``.epc`` (``runtime/native_loader.py``) is served by the mmap'd C++
    cache: numeric windows come back as copies, camera keys as lazy
    :class:`_EpcFrames` views (frames decode on slice, off the GIL).
    """

    _NPZ_ALIASES = {
        "camera1/camera1": "camera1_images",
        "camera2/camera2": "camera2_images",
        "gelsight_force/forces": "gelsight_forces",
        "gelsight_force/displacement": "gelsight_displacement",
    }

    def __init__(self, path: str):
        self.path = path
        self.is_epc = path.endswith(".epc")
        self.is_h5 = not (path.endswith(".npz") or self.is_epc)
        self._f = None

    def __enter__(self):
        if self.is_epc:
            from vla_touch_tpu.runtime.native_loader import EpisodeCache

            self._f = EpisodeCache(self.path)
        elif self.is_h5:
            import h5py

            self._f = h5py.File(self.path, "r")
        else:
            self._f = np.load(self.path, allow_pickle=False)
        return self

    def __exit__(self, *exc):
        if self._f is not None:
            self._f.close()  # NpzFile also holds an open zip/fd
        self._f = None
        return False

    def __contains__(self, key: str) -> bool:
        if self.is_epc:
            c = self._f
            avail = {"qpos", "gelsight_force/forces",
                     "gelsight_force/displacement"}
            if c.has_raw_pose:
                avail |= {"ee_poses", "gripper_pos"}
            if c.lang_len:
                avail.add("instruct_embeddings")
            if c.has_vla:
                avail.add("vla_action")
            for i in range(c.n_cams):
                avail.add(f"camera{i + 1}/camera{i + 1}")
            return key in avail
        if self.is_h5:
            return key in self._f
        return self._NPZ_ALIASES.get(key, key) in self._f.files

    def _get_epc(self, key: str):
        c = self._f
        if key == "ee_poses":
            return c.read_raw_pose()[0]
        if key == "gripper_pos":
            return c.read_raw_pose()[1]
        if key == "qpos":
            return c.read_window(0, c.T)["qpos"]
        if key == "instruct_embeddings":
            return c.read_lang()[None]          # h5 shape (1, L, D)
        if key == "gelsight_force/forces":
            return c.read_window(0, c.T)["forces"]
        if key == "gelsight_force/displacement":
            return c.read_window(0, c.T)["disps"]
        if key == "vla_action":
            return _EpcVla(c)
        for i in range(c.n_cams):
            if key == f"camera{i + 1}/camera{i + 1}":
                return _EpcFrames(c, i)
        raise KeyError(key)

    def get(self, key: str):
        """Fetch by h5-style key ('camera1/camera1', 'ee_poses', ...)."""
        if self.is_epc:
            return self._get_epc(key)
        if self.is_h5:
            node = self._f
            for part in key.split("/"):
                node = node[part]
            return node
        return self._f[self._NPZ_ALIASES.get(key, key)]

    __getitem__ = get


def qpos_from_episode(f) -> np.ndarray:
    """[ee_pos(3), ortho6d(6), raw gripper(1)] (T, 10)
    (``unified_vla_dataset_episode.py:76-96``). Gripper stays on the raw
    0..255 scale; consumers rescale per their own convention."""
    if "ee_poses" not in f and "qpos" in f:
        # .epc caches packed without raw poses (v1): the f32 qpos is the
        # only state record (documented precision deviation vs h5's f64).
        return np.asarray(f["qpos"], np.float64)
    ee = np.asarray(f["ee_poses"], np.float64)
    pos, quat = ee[:, :3], ee[:, 3:7]
    o6 = np.asarray(quaternion_to_ortho6d(quat), np.float64)
    grip = np.asarray(f["gripper_pos"], np.float64).reshape(-1, 1)
    return np.concatenate([pos, o6, grip], axis=-1)


def motion_onset_index(qpos: np.ndarray, eps: float = 1e-2) -> Optional[int]:
    """First index where any qpos dim moved > eps from the initial pose
    (``unified_vla_dataset_episode.py:304-312``); None if static."""
    delta = np.abs(qpos - qpos[0:1])
    idx = np.where(np.any(delta > eps, axis=1))[0]
    return int(idx[0]) if len(idx) else None


def write_synthetic_episode(path: str, num_steps: int = 80, img_size: int = 48,
                            chunk: int = 64, lang_len: int = 8,
                            lang_dim: int = 4096, seed: int = 0,
                            with_vla: bool = True,
                            resized_size: int = 384) -> None:
    """Write a schema-complete synthetic episode (smooth random EEF
    trajectory + moving-blob cameras + correlated forces).  Serves as the
    test fixture and as a stand-in for the recorded ``wipe_example``
    episodes (``/root/reference/README.md:74`` — not vendored in the repo)."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, num_steps)[:, None]
    # Smooth EEF path that is still for the first ~5 steps (motion onset).
    onset = 5
    ramp = np.clip((np.arange(num_steps) - onset) / (num_steps - onset), 0, 1)[:, None]
    pos = 0.4 + 0.2 * np.sin(2 * np.pi * t * rng.uniform(0.5, 1.5, 3)) * ramp
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    ang = 0.5 * ramp[:, 0] * np.sin(2 * np.pi * t[:, 0])
    quat = np.stack([axis[0] * np.sin(ang / 2), axis[1] * np.sin(ang / 2),
                     axis[2] * np.sin(ang / 2), np.cos(ang / 2)], axis=-1)
    gripper = (128 + 120 * np.sin(np.pi * t[:, 0]) * ramp[:, 0]).astype(np.float64)

    def _smooth_frames(phase: float) -> np.ndarray:
        """Gradient background + moving gaussian blob (JPEG-friendly and
        visually distinct per step, unlike raw noise)."""
        yy, xx = np.mgrid[0:img_size, 0:img_size].astype(np.float32)
        out = np.zeros((num_steps, img_size, img_size, 3), np.uint8)
        for i in range(num_steps):
            cx = img_size * (0.3 + 0.4 * np.sin(2 * np.pi * (i / num_steps) + phase))
            cy = img_size * (0.3 + 0.4 * np.cos(2 * np.pi * (i / num_steps) + phase))
            blob = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (img_size * 0.8))
            frame = np.stack([
                60 + 120 * xx / img_size + 120 * blob,
                60 + 120 * yy / img_size + 60 * blob,
                90 + 100 * blob,
            ], axis=-1)
            out[i] = np.clip(frame, 0, 255).astype(np.uint8)
        return out

    imgs1 = _smooth_frames(0.0)
    imgs2 = _smooth_frames(1.5)
    forces = 0.5 * np.sin(2 * np.pi * t * np.array([1.0, 1.3, 0.7])) + \
        0.05 * rng.normal(size=(num_steps, 3))
    disp = 0.1 * rng.normal(size=(num_steps, 2))
    instruct = rng.normal(size=(1, lang_len, lang_dim)).astype(np.float32)

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as f:
        f.create_dataset("ee_poses", data=np.concatenate([pos, quat], -1))
        f.create_dataset("gripper_pos", data=gripper)
        g1 = f.create_group("camera1")
        g1.create_dataset("camera1", data=imgs1, compression="lzf")
        g2 = f.create_group("camera2")
        g2.create_dataset("camera2", data=imgs2, compression="lzf")
        f.create_dataset("instruct_embeddings", data=instruct)
        gf = f.create_group("gelsight_force")
        gf.create_dataset("forces", data=forces)
        gf.create_dataset("displacement", data=disp)
        if with_vla:
            qpos = qpos_from_episode(f)
            qpos_scaled = qpos / np.array([[1] * 9 + [GRIPPER_SCALE]])
            # "VLA" chunks = future expert states + noise, gripper re-scaled
            # back to raw units (matching the generator's policy.step output
            # convention, create_controller_dataset_episode.py:99-126).
            vla = np.zeros((num_steps, chunk, 10), np.float64)
            for i in range(num_steps):
                idx = np.minimum(np.arange(i, i + chunk), num_steps - 1)
                vla[i] = qpos_scaled[idx] + 0.01 * rng.normal(size=(chunk, 10))
            vla[:, :, -1] *= GRIPPER_SCALE
            f.create_dataset("vla_action", data=vla)
            small = min(resized_size, 64)  # keep fixtures small
            f.create_dataset(
                "camera1_resized",
                data=rng.integers(0, 255, (num_steps, small, small, 3), np.uint8),
                compression="lzf")
            f.create_dataset(
                "camera2_resized",
                data=rng.integers(0, 255, (num_steps, small, small, 3), np.uint8),
                compression="lzf")


def make_synthetic_dataset(root: str, n_episodes: int = 3, **kw) -> list:
    paths = []
    for i in range(n_episodes):
        p = os.path.join(root, f"episode_{i}.h5")
        write_synthetic_episode(p, seed=i, **kw)
        paths.append(p)
    return paths
