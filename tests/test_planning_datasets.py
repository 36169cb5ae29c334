"""Octopi datasets, QA generation, encoder training driver, serving."""

import json
import os

import numpy as np
import pytest

from vla_touch_tpu.models.encoders.vit import ViTConfig
from vla_touch_tpu.planning import encoder as PE
from vla_touch_tpu.planning import qa as QA
from vla_touch_tpu.planning.datasets import (
    TactileLLMDataset,
    TactilePropertyRegressionDataset,
)

TINY_CLIP = ViTConfig(hidden_size=32, num_layers=1, num_heads=4, mlp_dim=64,
                      patch_size=16, image_size=32, use_layerscale=False,
                      quick_gelu=True, use_pre_norm=True, layernorm_eps=1e-5,
                      patch_bias=False)


def _write_sample(root, name, split, hardness, roughness, n_frames=4,
                  size=32):
    import cv2

    d = root / name
    (d / "tactile").mkdir(parents=True)
    rng = np.random.default_rng(abs(hash(name)) % 1000)
    for i in range(n_frames):
        img = (np.full((size, size, 3), 100) +
               rng.integers(0, 30, (size, size, 3))).astype(np.uint8)
        cv2.imwrite(str(d / "tactile" / f"{i:03d}.jpg"), img)
    json.dump({"split": split,
               "properties": {"hardness": hardness, "roughness": roughness},
               "object": name},
              open(d / "data.json", "w"))


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("octopi")
    for i, (h, r) in enumerate([(2.0, 8.0), (8.0, 2.0), (5.0, 5.0)]):
        _write_sample(root, f"physiclear_obj{i}_0", "train", h, r)
    _write_sample(root, "physiclear_objT_0", "test", 7.0, 3.0)
    _write_sample(root, "otherset_objX_0", "train", 1.0, 1.0)
    return root


def test_regression_dataset_and_batches(data_root):
    ds = TactilePropertyRegressionDataset(str(data_root), "train",
                                          ["physiclear"], frame_size=32,
                                          max_frames=4)
    assert len(ds) == 3  # otherset filtered out, test split filtered out
    s = ds[0]
    assert s["frames"].shape == (4, 32, 32, 3)
    assert s["properties"].shape == (2,)
    batches = list(ds.batches(2, shuffle=False))
    assert batches[0]["frames"].shape == (2, 4, 32, 32, 3)
    assert batches[0]["properties"].shape == (2, 2)


def test_qa_generation(tmp_path):
    objects = {
        "sponge": {"tactile": "t/sponge", "hardness": 1.5, "roughness": 6.0},
        "rock": {"tactile": "t/rock", "hardness": 9.0, "roughness": 8.0},
        "glass": {"tactile": "t/glass", "hardness": 8.0, "roughness": 1.0},
    }
    desc = QA.generate_description_qa(objects)
    assert len(desc) == 3
    assert "<tact>" in desc[0]["question"]
    assert "very soft" in [d["answer"] for d in desc
                           if d["object"] == "sponge"][0]

    rank = QA.generate_ranking_qa(objects, "hardness", group_size=3,
                                  n_groups=2)
    assert len(rank) == 2
    assert rank[0]["ranking"] == ["sponge", "glass", "rock"]
    assert rank[0]["question"].count("<tact>") == 3

    scen = QA.generate_scenario_qa(objects)
    soft_row = [s for s in scen if "cushion" in s["question"]][0]
    assert soft_row["target"] == "sponge"

    path = QA.write_qa_file(desc + rank + scen, str(tmp_path / "qa.json"))
    ds = TactileLLMDataset([path], split_name="train")
    assert len(ds) == len(desc) + len(rank) + len(scen)
    assert "question" in ds[0] and "answer" in ds[0]


def test_encoder_training_and_eval(data_root, tmp_path):
    from vla_touch_tpu.planning.train_encoder import (
        evaluate_encoder,
        train_property_encoder,
    )

    st = train_property_encoder(
        str(data_root), str(tmp_path / "enc_out"), datasets=("physiclear",),
        epochs=2, batch_size=2, frame_size=32, max_frames=4, cfg=TINY_CLIP)
    assert os.path.exists(str(tmp_path / "enc_out" / "encoder" /
                              "classifier.msgpack"))
    res = evaluate_encoder(st, str(data_root), datasets=("physiclear",),
                           split="test", frame_size=32, max_frames=4)
    assert res["num_samples"] == 1
    assert np.isfinite(res["mse"])


def test_serving_describe_and_rank(tmp_path):
    from vla_touch_tpu.planning.serving import TactileDescriptionService

    st = PE.init_tactile_encoder(TINY_CLIP)
    svc = TactileDescriptionService(
        st, history_path=str(tmp_path / "hist.jsonl"), frame_size=32)
    rng = np.random.default_rng(0)
    video = rng.integers(0, 255, (6, 32, 32, 3), np.uint8)
    out = svc.describe(video)
    assert set(out) == {"hardness", "roughness", "description"}
    assert isinstance(out["description"], str) and out["description"]

    rank = svc.rank([video, video + 1], prop="roughness")
    assert sorted(rank["ranking"]) == [0, 1]
    rows = [json.loads(l) for l in open(tmp_path / "hist.jsonl")]
    assert rows[0]["kind"] == "describe" and rows[1]["kind"] == "rank"
