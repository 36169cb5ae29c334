"""Language tools, dataset stats, capture pipeline, and distillation pass."""

import os

import numpy as np
import pytest

from vla_touch_tpu.config import DataConfig
from vla_touch_tpu.data import episode as E
from vla_touch_tpu.data.capture import (
    convert_to_hdf5,
    label_instructions,
    process_gelsight,
)
from vla_touch_tpu.data.distill import record_vla_actions_for_episode
from vla_touch_tpu.data.stats import compute_dataset_stat, process_dataset
from vla_touch_tpu.data.vla_dataset import UnifiedVLADataset
from vla_touch_tpu.models.encoders.t5 import (
    LanguageEncoder,
    T5Embedder,
    load_instruction_dict,
    save_instruction_dict,
)


class FakeEmbedder:
    """Deterministic stand-in for T5 (hash-seeded embeddings)."""

    dim = 32

    def get_text_embeddings(self, texts):
        out = []
        for t in texts:
            rng = np.random.default_rng(abs(hash(t)) % (2**32))
            out.append(rng.normal(size=(len(t.split()) + 1, self.dim))
                       .astype(np.float32))
        return out


def test_t5_embedder_with_tiny_hf_model():
    from transformers import T5Config, T5EncoderModel, AutoTokenizer

    try:
        tok = AutoTokenizer.from_pretrained("t5-small")
    except Exception:
        pytest.skip("no network/tokenizer cache for t5-small")
    cfg = T5Config(d_model=32, d_ff=64, num_layers=2, num_heads=2, d_kv=16,
                   vocab_size=tok.vocab_size)
    model = T5EncoderModel(cfg)
    emb = T5Embedder(model=model, tokenizer=tok)
    outs = emb.get_text_embeddings(["pick up the mango", "wipe the table"])
    assert outs[0].shape[-1] == 32 and outs[0].ndim == 2
    assert outs[0].shape[0] != outs[1].shape[0]  # unpadded lengths


def test_language_encoder_tools(tmp_path):
    enc = LanguageEncoder(FakeEmbedder())
    d = enc.encode_instructions(["grab the cup", "wipe table"])
    assert d["all_instructions"] == ["grab the cup", "wipe table"]
    assert d["grab the cup"].shape[-1] == 32
    save_instruction_dict(str(tmp_path / "ins.npz"), d)
    d2 = load_instruction_dict(str(tmp_path / "ins.npz"))
    np.testing.assert_array_equal(d["wipe table"], d2["wipe table"])

    # directory batch
    epi = tmp_path / "episodes" / "ep0"
    epi.mkdir(parents=True)
    (epi / "instruction.txt").write_text("press the sponge")
    written = enc.encode_directory(str(tmp_path / "episodes"))
    assert len(written) == 1
    assert np.load(written[0]).shape[-1] == 32


def test_compute_dataset_stat(tmp_path):
    E.make_synthetic_dataset(str(tmp_path), n_episodes=2, num_steps=48,
                             img_size=28, chunk=8, lang_dim=16)
    cfg = DataConfig(chunk_size=8)
    ds = UnifiedVLADataset(cfg, file_paths=E.list_episode_files(str(tmp_path)),
                           dataset_name="synthetic")
    st = compute_dataset_stat(ds)
    assert st["state_mean"].shape == (128,)
    assert st["num_steps"] > 0
    # Unpopulated unified slots have exactly zero stats.
    assert st["state_std"][100] == 0.0 and st["nonzero_fraction"][100] == 0.0
    assert st["nonzero_fraction"][30] > 0.9  # eef_pos_x always populated

    out = process_dataset(cfg, str(tmp_path / "dataset_stat.json"),
                          file_paths=E.list_episode_files(str(tmp_path)))
    assert "mango" in out  # default dataset name key


def test_capture_pipeline_end_to_end(tmp_path):
    import cv2

    from tests.test_marker_tracking import make_marker_frame

    epi = tmp_path / "cap" / "ep0"
    for sub in ("camera1", "camera2", "gelsight"):
        (epi / sub).mkdir(parents=True)
    T = 6
    rng = np.random.default_rng(0)
    for t in range(T):
        img = (np.linspace(0, 255, 24 * 24 * 3).reshape(24, 24, 3)
               + 10 * t).clip(0, 255).astype(np.uint8)
        cv2.imwrite(str(epi / "camera1" / f"{t:06d}.jpg"), img[:, :, ::-1])
        cv2.imwrite(str(epi / "camera2" / f"{t:06d}.jpg"), img[:, :, ::-1])
        gel = make_marker_frame((t * 1.0, 0.0)).astype(np.uint8)
        cv2.imwrite(str(epi / "gelsight" / f"{t:06d}.jpg"),
                    np.stack([gel] * 3, -1)[:, :, ::-1])
    np.save(str(epi / "ee_poses.npy"),
            rng.normal(size=(T, 7)).astype(np.float64))
    np.save(str(epi / "gripper_pos.npy"), np.full(T, 128.0))

    label_instructions(str(tmp_path / "cap"), {"ep0": "wipe the table"})
    assert (epi / "instruction.txt").read_text().strip() == "wipe the table"

    from vla_touch_tpu.data.capture import precompute_instructions

    precompute_instructions(str(tmp_path / "cap"), FakeEmbedder())
    assert (epi / "instruct_lang.npy").exists()

    out = process_gelsight(str(epi))
    assert out["forces"].shape == (T, 3)
    # Marker shift grows ~1px per frame -> increasing magnitude.
    mags = out["forces"][:, 2]
    assert mags[-1] > mags[1]

    h5_path = str(tmp_path / "episode_0.h5")
    convert_to_hdf5(str(epi), h5_path)
    import h5py

    with h5py.File(h5_path) as f:
        assert f["ee_poses"].shape == (T, 7)
        assert f["camera1"]["camera1"].shape == (T, 24, 24, 3)
        assert f["gelsight_force"]["forces"].shape == (T, 3)
        assert f["instruct_embeddings"].ndim == 3


def test_distillation_pass(tmp_path):
    import h5py

    src = str(tmp_path / "ep.h5")
    E.write_synthetic_episode(src, num_steps=10, img_size=24, chunk=4,
                              lang_dim=16, with_vla=False)

    calls = []

    def fake_policy_step(proprio, images, text):
        calls.append(len(images))
        return np.tile(np.asarray(proprio, np.float32)[None, None], (1, 4, 1))

    dst = str(tmp_path / "ep_aug.h5")
    record_vla_actions_for_episode(src, dst, fake_policy_step, image_size=32)
    assert len(calls) == 10 and all(c == 6 for c in calls)
    with h5py.File(dst) as f:
        assert f["vla_action"].shape == (10, 4, 10)
        assert f["camera1_resized"].shape == (10, 32, 32, 3)
        # Chunk t repeats qpos[t] by construction of the fake policy.
        qpos = E.qpos_from_episode(f)
        np.testing.assert_allclose(f["vla_action"][3][0],
                                   qpos[3].astype(np.float32), rtol=1e-5)


def test_batch_tools(tmp_path):
    """batch_rename_files / batch_create_instructions match the reference
    tools' range-inclusive episode_<num> selection."""
    from vla_touch_tpu.data.capture import (
        batch_create_instructions,
        batch_rename_files,
    )

    for i in range(4):
        d = tmp_path / f"episode_{i}" / "camera1"
        d.mkdir(parents=True)
        (d / "old.jpg").write_bytes(b"x")
    (tmp_path / "notes").mkdir()          # non-episode dir is skipped

    out = batch_rename_files(str(tmp_path), (1, 2), "old.jpg", "new.jpg",
                             subfolder="camera1")
    assert out == {"renamed": 2, "not_found": 0}
    assert (tmp_path / "episode_1" / "camera1" / "new.jpg").exists()
    assert (tmp_path / "episode_0" / "camera1" / "old.jpg").exists()
    # already-renamed episodes report not_found on a second pass
    out2 = batch_rename_files(str(tmp_path), (0, 3), "old.jpg", "new.jpg",
                              subfolder="camera1")
    assert out2 == {"renamed": 2, "not_found": 2}

    n = batch_create_instructions(str(tmp_path), (2, 3), "wipe the plate")
    assert n == 2
    assert (tmp_path / "episode_3" / "instruction.txt").read_text() \
        == "wipe the plate\n"
    assert not (tmp_path / "episode_0" / "instruction.txt").exists()
