"""Capture labeling CLI + GelSight review tool
(≙ ``franka_data/1_insturction_label.py`` / ``gelsight_visualization.py``)."""

import os

import numpy as np
import pytest

from tests.test_marker_tracking import CFG as TRACK_CFG, make_marker_frame
from vla_touch_tpu.data import label_tool as LT


def _write_frames(d, frames):
    import cv2

    os.makedirs(d, exist_ok=True)
    for i, f in enumerate(frames):
        img = np.asarray(f)
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        cv2.imwrite(os.path.join(d, f"{i:06d}.jpg"),
                    img.astype(np.uint8))


@pytest.fixture
def capture_root(tmp_path):
    root = str(tmp_path / "capture")
    rng = np.random.default_rng(0)
    for e in range(2):
        d = os.path.join(root, f"episode_{e}")
        cam = rng.integers(0, 255, size=(4, 48, 64, 3)).astype(np.uint8)
        _write_frames(os.path.join(d, "camera1"), cam)
        gel = [make_marker_frame((0.0, 0.0)),
               make_marker_frame((2.0, 1.0)),
               make_marker_frame((4.0, 2.0))]
        _write_frames(os.path.join(d, "gelsight"), gel)
    return root


def test_labeler_scripted_flow(capture_root):
    answers = iter(["wipe the table with the sponge", "="])
    shown = []
    labeled = LT.run_labeler(capture_root, input_fn=lambda _: next(answers),
                             print_fn=shown.append)
    assert len(labeled) == 2
    for d, text in labeled.items():
        assert text == "wipe the table with the sponge"
        with open(os.path.join(d, "instruction.txt")) as f:
            assert f.read().strip() == text
    # contact sheets were rendered next to the episodes
    assert all(os.path.exists(os.path.join(d, "contact_sheet.png"))
               for d in labeled)
    # a preview and the episode name were displayed
    assert any("episode_0" in s for s in shown)

    # second pass: everything already labeled -> no prompts at all
    labeled2 = LT.run_labeler(capture_root,
                              input_fn=lambda _: pytest.fail("prompted"),
                              print_fn=lambda s: None)
    assert labeled2 == {}


def test_labeler_reuse_skip_quit(capture_root):
    answers = iter(["grasp the cup", "q"])
    labeled = LT.run_labeler(capture_root, input_fn=lambda _: next(answers),
                             print_fn=lambda s: None)
    assert len(labeled) == 1  # second episode untouched after 'q'
    answers = iter(["-", "0", "=", "wipe gently"])
    shown = []
    labeled = LT.run_labeler(capture_root, relabel=True,
                             input_fn=lambda _: next(answers),
                             print_fn=shown.append)
    # '-' skipped episode_0; out-of-range '0' and history-less '=' are
    # command syntax and re-prompt instead of becoming labels.
    assert list(labeled.values()) == ["wipe gently"]
    assert any("no suggestion #0" in s for s in shown)
    assert any("no previous instruction" in s for s in shown)


def test_review_gelsight(capture_root):
    d = os.path.join(capture_root, "episode_0")
    out = LT.review_gelsight(d, tracker_cfg=TRACK_CFG)
    assert out["frames"] == 3
    od = out["out_dir"]
    assert os.path.exists(os.path.join(od, "index.html"))
    assert os.path.exists(os.path.join(od, "marker_000002.png"))
    csv = open(os.path.join(od, "forces.csv")).read().splitlines()
    assert csv[0] == "frame,fx,fy,mag"
    assert len(csv) == 4
    # pressing harder over the sequence -> increasing force magnitude
    mags = [float(r.split(",")[-1]) for r in csv[1:]]
    assert mags[2] > mags[1] > mags[0] >= 0.0
    assert out["max_force"] == pytest.approx(mags[2])


def test_cli_label_entry(capture_root, monkeypatch):
    monkeypatch.setattr("builtins.input", lambda _="": "press the button")
    LT.main(["label", capture_root])
    with open(os.path.join(capture_root, "episode_0",
                           "instruction.txt")) as f:
        assert "press the button" == f.read().strip()
