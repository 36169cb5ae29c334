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


def test_epc2_lang_and_raw_pose_roundtrip(cache_path):
    """v2 sections: the precomputed T5 embedding and the raw f64 poses
    (the parity-critical state source) round-trip exactly."""
    import h5py

    h5, epc = cache_path
    cache = native.EpisodeCache(epc)
    with h5py.File(h5, "r") as f:
        lang = np.asarray(f["instruct_embeddings"], np.float32)
        ee = np.asarray(f["ee_poses"], np.float64)[:, :7]
        grip = np.asarray(f["gripper_pos"], np.float64).reshape(-1)
    got = cache.read_lang()
    np.testing.assert_array_equal(got, lang.reshape(got.shape))
    ee2, grip2 = cache.read_raw_pose()
    np.testing.assert_array_equal(ee2, ee)
    np.testing.assert_array_equal(grip2, grip)
    cache.close()


def test_episode_file_epc_keys(cache_path):
    """EpisodeFile serves .epc through the same h5-style key surface."""
    import h5py

    from vla_touch_tpu.data.episode import EpisodeFile

    h5, epc = cache_path
    with EpisodeFile(epc) as f, h5py.File(h5, "r") as hf:
        assert "ee_poses" in f and "instruct_embeddings" in f
        assert "camera1/camera1" in f and "vla_action" in f
        np.testing.assert_array_equal(
            qpos_from_episode(f), qpos_from_episode(hf))
        np.testing.assert_array_equal(
            np.asarray(f["instruct_embeddings"]),
            np.asarray(hf["instruct_embeddings"], np.float32))
        frames = f["camera1/camera1"]
        assert frames.shape == (30, 32, 32, 3)
        assert frames[4:7].shape == (3, 32, 32, 3)
        np.testing.assert_array_equal(
            np.asarray(f["gelsight_force/forces"]),
            np.asarray(hf["gelsight_force"]["forces"], np.float32))


def test_epc_training_samples_match_h5(tmp_path):
    """The adoption gate: with codec='raw', the UnifiedVLADataset sample
    stream from .epc is byte-identical to the h5 stream (same seed, same
    draws) — the trainer can switch with --data_format epc and reproduce
    the h5 run exactly."""
    from vla_touch_tpu.config import DataConfig
    from vla_touch_tpu.data.pack_epc import pack_dataset
    from vla_touch_tpu.data.vla_dataset import UnifiedVLADataset
    from vla_touch_tpu.data.episode import make_synthetic_dataset

    import os

    name = "mango"
    ddir = str(tmp_path / f"{name}_hdf5_gelsight")
    os.makedirs(ddir)
    make_synthetic_dataset(ddir, n_episodes=2, num_steps=40,
                           img_size=40, chunk=8, lang_dim=16)
    pack_dataset(ddir, codec="raw")

    cfg_h5 = DataConfig(data_root=str(tmp_path), dataset_names=(name,),
                        chunk_size=8, image_size=40)
    cfg_epc = DataConfig(data_root=str(tmp_path), dataset_names=(name,),
                         chunk_size=8, image_size=40, data_format="epc")
    ds_h5 = UnifiedVLADataset(cfg_h5, seed=3)
    ds_epc = UnifiedVLADataset(cfg_epc, seed=3)
    assert len(ds_h5) == len(ds_epc) == 2
    for _ in range(6):
        a = ds_h5.get_item()
        b = ds_epc.get_item()
        assert a["meta"]["step_id"] == b["meta"]["step_id"]
        for k in ("state", "actions", "state_std", "state_norm"):
            np.testing.assert_array_equal(a[k], b[k])
        np.testing.assert_array_equal(a["meta"]["instruction_embedding"],
                                      b["meta"]["instruction_embedding"])
        for k in ("cam_high", "cam_right_wrist"):
            np.testing.assert_array_equal(a[k], b[k])


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


@pytest.fixture(scope="module")
def controller_epc_dataset(tmp_path_factory):
    """Synthetic VLA-augmented dataset packed BOTH ways: h5 and codec=raw
    .epc with the resized camera streams (the controller-trainer layout)."""
    from vla_touch_tpu.data.episode import make_synthetic_dataset
    from vla_touch_tpu.data.pack_epc import pack_dataset

    root = tmp_path_factory.mktemp("ctrl_epc")
    h5_dir, epc_dir = str(root / "h5"), str(root / "epc")
    make_synthetic_dataset(h5_dir, n_episodes=2, num_steps=30, img_size=24,
                           chunk=8, lang_dim=16, resized_size=24)
    try:
        native.build_library()
    except Exception as e:
        pytest.skip(f"native toolchain unavailable: {e}")
    pack_dataset(h5_dir, epc_dir, codec="raw", use_resized=True)
    return h5_dir, epc_dir


def test_controller_dataset_epc_byte_identity(controller_epc_dataset):
    """ControllerDataset(data_format='epc', codec=raw) must produce
    byte-identical samples AND stats vs the h5 path — the same adoption
    gate the RDT trainer path carries (VERDICT r4 #6)."""
    from vla_touch_tpu.data.controller_dataset import ControllerDataset

    h5_dir, epc_dir = controller_epc_dataset
    kw = dict(context_frames=2, horizon=8, use_images=True)
    ds_h5 = ControllerDataset(data_dir=h5_dir, **kw)
    ds_epc = ControllerDataset(data_dir=epc_dir, data_format="epc", **kw)
    assert len(ds_h5) == len(ds_epc) > 0
    assert ds_h5.episode_indices == ds_epc.episode_indices
    for k in ds_h5.stats:
        np.testing.assert_array_equal(ds_h5.stats[k], ds_epc.stats[k])
    for i in (0, len(ds_h5) // 2, len(ds_h5) - 1):
        a, b = ds_h5[i], ds_epc[i]
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_controller_batches_prefetch_workers_identical(controller_epc_dataset):
    """batches(workers=3) must yield the SAME batch sequence as the serial
    path (OrderedPrefetcher preserves order), exercising the GIL-free epc
    decode from multiple builder threads."""
    from vla_touch_tpu.data.controller_dataset import ControllerDataset

    _, epc_dir = controller_epc_dataset
    ds = ControllerDataset(data_dir=epc_dir, data_format="epc",
                           context_frames=2, horizon=8)
    serial = list(ds.batches(4, np.random.default_rng(7)))
    pooled = list(ds.batches(4, np.random.default_rng(7), workers=3))
    assert len(serial) == len(pooled) > 1
    for a, b in zip(serial, pooled):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_controller_trainer_epc_end_to_end(controller_epc_dataset, tmp_path):
    """bridge_train --data_format epc --prefetch_workers 2 runs a short
    training and the loss drops (the full adoption surface: CLI flag ->
    ControllerDataModule -> EpisodeFile -> native cache -> pool)."""
    from vla_touch_tpu.config import (BridgeControllerConfig,
                                      BridgeTrainConfig, InterpolantConfig)
    from vla_touch_tpu.train.bridge_train import (
        train_diffusion_controller_with_dataset)

    _, epc_dir = controller_epc_dataset
    ccfg = BridgeControllerConfig(horizon=8, use_visual=False,
                                  interpolant=InterpolantConfig())
    tcfg = BridgeTrainConfig(horizon=8, batch_size=8, epochs=2,
                             data_format="epc", prefetch_workers=2)
    state, trainer = train_diffusion_controller_with_dataset(
        str(epc_dir), str(tmp_path / "out"), ccfg, tcfg)
    assert state is not None
