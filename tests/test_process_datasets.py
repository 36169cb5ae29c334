"""Raw tactile-dataset processing (≙ ``process_datasets.py``): the three
corpus walkers, salient-span reduction, and sample-registry construction."""

import json
import os

import numpy as np
import pytest

from vla_touch_tpu.planning import physiclear as PC
from vla_touch_tpu.planning import process_datasets as PD


def _frames_dir(path, n=6, seed=0, jump_at=None):
    import cv2

    rng = np.random.default_rng(seed)
    os.makedirs(path, exist_ok=True)
    base = rng.integers(60, 80, size=(24, 24, 3)).astype(np.uint8)
    for i in range(n):
        img = base.copy()
        if jump_at is not None and i >= jump_at:
            # brightness ramp: several consecutive active frames
            img = (img.astype(np.int32) + 30 * (i - jump_at + 1)).clip(
                0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(path, f"{i:03d}.jpg"), img)


@pytest.fixture
def physiclear_root(tmp_path):
    root = tmp_path / "physiclear_raw"
    for ep in ("pressing", "sliding"):
        for obj, k in (("potato", 0), ("blanket", 1), ("eraser", 0),
                       ("millet", 2)):
            _frames_dir(str(root / ep / f"{obj}_{k}"), n=4)
        # an object missing from the tables must be skipped
        _frames_dir(str(root / ep / "unknownthing_0"), n=4)
    return str(root)


def test_extract_physiclear(physiclear_root, tmp_path):
    out = str(tmp_path / "out")
    n = PD.extract_physiclear(physiclear_root, out)
    assert n == 8  # 4 known objects x 2 procedures; unknown skipped
    metas = [json.load(open(os.path.join(out, d, "data.json")))
             for d in sorted(os.listdir(out))]
    ids = {m["object_id"] for m in metas}
    assert ids == {"physiclear_potato", "physiclear_blanket",
                   "physiclear_eraser", "physiclear_millet"}
    by_id = {m["object_id"]: m for m in metas}
    assert by_id["physiclear_potato"]["split"] == "train"
    assert by_id["physiclear_millet"]["split"] == "val"
    assert by_id["physiclear_eraser"]["split"] == "test"
    assert by_id["physiclear_potato"]["properties"]["hardness"] == \
        pytest.approx(7.67)
    assert by_id["physiclear_potato"]["object"] == \
        PC.OBJECTS_PART_NAMES["physiclear_potato"]
    # frames landed
    d0 = sorted(os.listdir(out))[0]
    assert len(os.listdir(os.path.join(out, d0, "tactile"))) == 4


def test_extract_hardness_and_objectfolder(tmp_path):
    hroot = tmp_path / "hardness_raw"
    _frames_dir(str(hroot / "collection1" / "sponge_soft_take1"), n=3)
    _frames_dir(str(hroot / "collection1" / "sponge_hard_take1"), n=3)
    out_h = str(tmp_path / "out_h")
    assert PD.extract_hardness(str(hroot), out_h) == 2
    meta = json.load(open(os.path.join(out_h, "hardness_0", "data.json")))
    assert meta["object_id"].startswith("hardness_sponge_")
    assert meta["split"] == "train"

    oroot = tmp_path / "of_raw"
    _frames_dir(str(oroot / "7" / "tactile_data" / "s0" / "0" / "gelsight"),
                n=3)
    _frames_dir(str(oroot / "7" / "tactile_data" / "backup_s" / "0" /
                    "gelsight"), n=3)
    out_o = str(tmp_path / "out_o")
    assert PD.extract_objectfolder(str(oroot), out_o) == 1  # backup skipped
    meta = json.load(open(os.path.join(out_o, "objectfolder_0",
                                       "data.json")))
    assert meta["object_id"] == "objectfolder_7"
    assert meta["object"] == PD.objectfolder_names()[7]


def test_objectfolder_names_complete():
    names = PD.objectfolder_names()
    assert len(names) == 100
    assert names[1] == "a ceramic soup spoon"
    assert all(isinstance(v, str) and v for v in names.values())


def test_salient_reduction(tmp_path):
    out = str(tmp_path / "out")
    sdir = os.path.join(out, "physiclear_0")
    _frames_dir(os.path.join(sdir, "tactile"), n=12, jump_at=6)
    with open(os.path.join(sdir, "data.json"), "w") as f:
        json.dump({"object_id": "physiclear_potato"}, f)
    reduced = PD.reduce_to_salient_spans(out, threshold=5.0, top_k=3)
    assert reduced == 1
    left = os.listdir(os.path.join(sdir, "tactile"))
    assert len(left) == 3


def test_build_samples_json(physiclear_root, tmp_path):
    out = str(tmp_path / "out")
    PD.extract_physiclear(physiclear_root, out)
    paths = [str(tmp_path / f"{s}_samples.json")
             for s in ("train", "val", "test")]
    reg = PD.build_samples_json(out, *paths)
    assert set(reg["train"]) == {"physiclear_potato", "physiclear_blanket"}
    assert set(reg["val"]) == {"physiclear_millet"}
    assert set(reg["test"]) == {"physiclear_eraser"}
    assert all(len(v) == 2 for v in reg["train"].values())
    on_disk = json.load(open(paths[0]))
    assert on_disk == {k: v for k, v in reg["train"].items()}

    # registries feed the QA generators directly
    from vla_touch_tpu.planning import qa as QA

    samples = {k: v for k, v in reg["train"].items()}
    rows = QA.generate_physiclear_description_ranking_qa(
        samples, 5, split="train", seed=0)
    assert len(rows) == 5
    for r in rows:
        for t in r["info"]["tactile"]:
            assert t.endswith("/tactile")
            assert os.path.isdir(t)
