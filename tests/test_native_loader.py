"""Native episode cache: build, pack, read-back parity with the h5 source."""

import os

import numpy as np
import pytest

from vla_touch_tpu.data.episode import qpos_from_episode, write_synthetic_episode

native = pytest.importorskip("vla_touch_tpu.runtime.native_loader")


@pytest.fixture(scope="module")
def cache_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("native")
    h5 = str(root / "ep.h5")
    write_synthetic_episode(h5, num_steps=30, img_size=32, chunk=8,
                            lang_dim=16)
    try:
        native.build_library()
    except Exception as e:
        pytest.skip(f"native toolchain unavailable: {e}")
    epc = str(root / "ep.epc")
    native.pack_episode(h5, epc)
    return h5, epc


def test_header_and_numeric_parity(cache_path):
    import h5py

    h5, epc = cache_path
    cache = native.EpisodeCache(epc)
    assert (cache.T, cache.n_cams, cache.H, cache.W) == (30, 2, 32, 32)
    assert cache.state_dim == 10 and cache.has_vla == 1 and cache.chunk == 8

    with h5py.File(h5, "r") as f:
        qpos = qpos_from_episode(f).astype(np.float32)
        forces = np.asarray(f["gelsight_force"]["forces"], np.float32)
        vla = np.asarray(f["vla_action"], np.float32)

    win = cache.read_window(5, 10, vla_at=7)
    np.testing.assert_array_equal(win["qpos"], qpos[5:15])
    np.testing.assert_array_equal(win["forces"], forces[5:15])
    np.testing.assert_array_equal(win["vla"], vla[7])
    cache.close()


def test_frame_decode_parity(cache_path):
    import h5py

    h5, epc = cache_path
    cache = native.EpisodeCache(epc)
    with h5py.File(h5, "r") as f:
        raw1 = np.asarray(f["camera1"]["camera1"])
        raw2 = np.asarray(f["camera2"]["camera2"])

    for cam, raw in [(0, raw1), (1, raw2)]:
        dec = cache.decode_frames(cam, 3, 6, n_threads=3)
        assert dec.shape == (6, 32, 32, 3)
        # JPEG quality 90 on random noise is harsh: verify strong
        # correlation rather than pixel equality.
        a = dec.astype(np.float32).ravel()
        b = raw[3:9].astype(np.float32).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.8, corr
    cache.close()


def test_bounds_errors(cache_path):
    _, epc = cache_path
    cache = native.EpisodeCache(epc)
    with pytest.raises(IOError):
        cache.read_window(25, 10)
    with pytest.raises(IOError):
        cache.decode_frames(5, 0, 1)
    cache.close()


def test_decode_throughput_multithreaded(cache_path):
    """Smoke perf check: 4 threads decode a full camera stream quickly."""
    import time

    _, epc = cache_path
    cache = native.EpisodeCache(epc)
    t0 = time.perf_counter()
    out = cache.decode_frames(0, 0, cache.T, n_threads=4)
    dt = time.perf_counter() - t0
    assert out.shape[0] == cache.T
    assert dt < 2.0  # 30 tiny frames should be near-instant
    cache.close()
