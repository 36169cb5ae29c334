"""Native episode-cache loader: packer + ctypes bindings.

The C++ side (``native/episode_cache.cpp``) mmaps a packed binary episode
cache and serves numeric windows and multithreaded-JPEG-decoded frames
without holding the GIL — the native replacement for the reference's
h5py-in-DataLoader-worker IO path (``/root/reference/VLA/data/producer.py``,
``train/dataset.py:22-94``).

:func:`pack_episode` converts an ``episode_*.h5`` into the ``.epc`` format
once (JPEG-encoding camera frames, which also bakes in the JPEG round-trip
the reference's training/inference parity depends on —
``frank_inference_eef.py:84-87``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "native", "episode_cache.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "native",
                         "libepisode_cache.so")

_MAGIC = b"EPC2"


def build_library(force: bool = False) -> str:
    """Compile the shared library (g++ -O2, links libjpeg)."""
    if os.path.exists(_LIB_PATH) and not force and (
            os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
        return _LIB_PATH
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC,
           "-o", _LIB_PATH, "-ljpeg", "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_library())
        lib.ec_open.restype = ctypes.c_void_p
        lib.ec_open.argtypes = [ctypes.c_char_p]
        lib.ec_close.argtypes = [ctypes.c_void_p]
        lib.ec_info.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.ec_read_window.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p]
        lib.ec_decode_frames.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_uint32, ctypes.c_void_p, ctypes.c_int]
        lib.ec_read_lang.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.ec_read_raw_pose.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        _lib = lib
    return _lib


def pack_episode(h5_path: str, out_path: str, jpeg_quality: int = 90,
                 use_resized: bool = False, codec: str = "jpeg") -> str:
    """h5 episode -> .epc cache (v2).  Cameras: camera1/camera2 (raw) or
    the *_resized variants.

    ``codec='jpeg'`` re-encodes frames (small files, bakes in the JPEG
    round-trip the deployment loop applies anyway —
    ``frank_inference_eef.py:84-87``); ``codec='raw'`` stores frames
    losslessly, making the .epc training path byte-identical to the h5
    path (the adoption gate, tests/test_native_loader.py).  v2 also packs
    the precomputed T5 embedding and the raw f64 ee_poses/gripper (qpos is
    derived in f64 downstream, so f32 qpos alone would break parity)."""
    import cv2
    import h5py

    from vla_touch_tpu.data.episode import qpos_from_episode

    assert codec in ("jpeg", "raw"), codec
    with h5py.File(h5_path, "r") as f:
        qpos = qpos_from_episode(f).astype(np.float32)
        T = qpos.shape[0]
        forces = np.asarray(f["gelsight_force"]["forces"], np.float32)
        disps = np.asarray(f["gelsight_force"]["displacement"], np.float32)
        has_vla = "vla_action" in f
        vla = (np.asarray(f["vla_action"], np.float32) if has_vla
               else np.zeros((0,), np.float32))
        chunk = int(vla.shape[1]) if has_vla else 0
        has_raw_pose = "ee_poses" in f and "gripper_pos" in f
        if has_raw_pose:
            ee = np.asarray(f["ee_poses"], np.float64)[:, :7]
            grip = np.asarray(f["gripper_pos"], np.float64).reshape(-1)
        lang = (np.asarray(f["instruct_embeddings"], np.float32)
                if "instruct_embeddings" in f else None)
        if lang is not None and lang.ndim == 3:
            lang = lang[0]
        cam_keys = (["camera1_resized", "camera2_resized"] if use_resized
                    else ["camera1", "camera2"])
        cams = []
        for k in cam_keys:
            node = f[k]
            cams.append(np.asarray(node[k] if hasattr(node, "keys") else node))

    H, W = cams[0].shape[1:3]
    blobs: list = []
    offsets = np.zeros((len(cams), T + 1), np.uint64)
    total = 0
    for ci, frames in enumerate(cams):
        for t in range(T):
            if codec == "raw":
                blobs.append(np.ascontiguousarray(
                    frames[t], dtype=np.uint8).tobytes())
            else:
                ok, enc = cv2.imencode(
                    ".jpg", frames[t][:, :, ::-1],  # RGB->BGR for cv2
                    [cv2.IMWRITE_JPEG_QUALITY, jpeg_quality])
                assert ok
                blobs.append(enc.tobytes())
            offsets[ci, t] = total
            total += len(blobs[-1])
        offsets[ci, T] = total
    # Offsets are into the concatenated blob stream; make them per-camera
    # absolute (they already are: we accumulate across cameras).

    hdr = np.zeros(13, np.uint32)
    hdr[:] = [T, len(cams), H, W, qpos.shape[1], forces.shape[1],
              disps.shape[1], chunk, int(has_vla),
              0 if lang is None else lang.shape[0],
              0 if lang is None else lang.shape[1],
              1 if codec == "raw" else 0, int(has_raw_pose)]
    with open(out_path, "wb") as out:
        out.write(_MAGIC)
        out.write(hdr.tobytes())
        out.write(qpos.tobytes())
        out.write(forces.tobytes())
        out.write(disps.tobytes())
        if has_vla:
            out.write(vla.tobytes())
        if has_raw_pose:
            out.write(np.ascontiguousarray(ee).tobytes())
            out.write(np.ascontiguousarray(grip).tobytes())
        if lang is not None:
            out.write(np.ascontiguousarray(lang).tobytes())
        out.write(offsets.tobytes())
        for b in blobs:
            out.write(b)
    return out_path


class EpisodeCache:
    """ctypes handle over one .epc file."""

    def __init__(self, path: str):
        self._lib = _get_lib()
        self._h = self._lib.ec_open(path.encode())
        if not self._h:
            raise IOError(f"failed to open episode cache: {path}")
        info = np.zeros(13, np.uint32)
        self._lib.ec_info(self._h, info.ctypes.data_as(ctypes.c_void_p))
        (self.T, self.n_cams, self.H, self.W, self.state_dim,
         self.force_dim, self.disp_dim, self.chunk, self.has_vla,
         self.lang_len, self.lang_dim, self.codec, self.has_raw_pose) = (
            int(x) for x in info)

    def close(self):
        if self._h:
            self._lib.ec_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def read_window(self, start: int, count: int,
                    vla_at: Optional[int] = None) -> dict:
        qpos = np.empty((count, self.state_dim), np.float32)
        forces = np.empty((count, self.force_dim), np.float32)
        disps = np.empty((count, self.disp_dim), np.float32)
        vla = (np.empty((self.chunk, self.state_dim), np.float32)
               if (vla_at is not None and self.has_vla) else None)
        rc = self._lib.ec_read_window(
            self._h, start, count,
            qpos.ctypes.data_as(ctypes.c_void_p),
            forces.ctypes.data_as(ctypes.c_void_p),
            disps.ctypes.data_as(ctypes.c_void_p),
            -1 if vla is None else int(vla_at),
            None if vla is None else vla.ctypes.data_as(ctypes.c_void_p))
        if rc:
            raise IOError(f"ec_read_window failed rc={rc}")
        out = {"qpos": qpos, "forces": forces, "disps": disps}
        if vla is not None:
            out["vla"] = vla
        return out

    def decode_frames(self, cam: int, start: int, count: int,
                      n_threads: int = 4) -> np.ndarray:
        out = np.empty((count, self.H, self.W, 3), np.uint8)
        rc = self._lib.ec_decode_frames(
            self._h, cam, start, count,
            out.ctypes.data_as(ctypes.c_void_p), n_threads)
        if rc:
            raise IOError(f"ec_decode_frames failed rc={rc}")
        return out

    def read_lang(self) -> Optional[np.ndarray]:
        """Precomputed T5 embedding (lang_len, lang_dim) f32, or None."""
        if not self.lang_len:
            return None
        out = np.empty((self.lang_len, self.lang_dim), np.float32)
        rc = self._lib.ec_read_lang(self._h,
                                    out.ctypes.data_as(ctypes.c_void_p))
        if rc:
            raise IOError(f"ec_read_lang failed rc={rc}")
        return out

    def read_raw_pose(self):
        """(ee_poses (T, 7) f64, gripper (T,) f64), or None if not packed."""
        if not self.has_raw_pose:
            return None
        ee = np.empty((self.T, 7), np.float64)
        grip = np.empty((self.T,), np.float64)
        rc = self._lib.ec_read_raw_pose(
            self._h, ee.ctypes.data_as(ctypes.c_void_p),
            grip.ctypes.data_as(ctypes.c_void_p))
        if rc:
            raise IOError(f"ec_read_raw_pose failed rc={rc}")
        return ee, grip
