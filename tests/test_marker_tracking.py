"""Marker tracker: synthetic marker grids with known displacements, plus
primitive parity vs cv2 where exact equivalents exist."""

import cv2
import numpy as np
import pytest

from vla_touch_tpu.ops import marker_tracking as MT


def make_marker_frame(shift=(0.0, 0.0), rows=7, cols=9, H=140, W=180,
                      radius=3, bg=200, fg=40):
    """Bright background with dark marker dots on a regular grid."""
    img = np.full((H, W), bg, np.float32)
    ch, cw = H // rows, W // cols
    yy, xx = np.mgrid[0:H, 0:W]
    for r in range(rows):
        for c in range(cols):
            cy = r * ch + ch / 2 + shift[1]
            cx = c * cw + cw / 2 + shift[0]
            d2 = (yy - cy) ** 2 + (xx - cx) ** 2
            img[d2 <= radius**2] = fg
    return img


CFG = MT.TrackerConfig(grid_rows=7, grid_cols=9, min_cell_mass=4.0)


def test_gaussian_blur_matches_cv2():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (32, 40)).astype(np.float32)
    ours = np.asarray(MT.gaussian_blur(img, 5))
    ref = cv2.GaussianBlur(img, (5, 5), 0)
    # Interior matches exactly; borders differ (cv2 reflects, conv zero-pads).
    np.testing.assert_allclose(ours[4:-4, 4:-4], ref[4:-4, 4:-4], atol=1e-3)


def test_threshold_and_open_detect_markers():
    frame = make_marker_frame()
    mask = np.asarray(MT.marker_mask(frame, CFG))
    assert mask.sum() > 63 * 4  # every marker leaves mass
    cents, mass, valid = MT.grid_centroids(MT.marker_mask(frame, CFG), CFG)
    assert int(np.asarray(valid).sum()) == 63


def test_displacement_recovery():
    base = make_marker_frame((0.0, 0.0))
    baseline = MT.calibrate(base, CFG)
    assert int(np.asarray(baseline["valid"]).sum()) == 63
    for shift in [(3.0, 0.0), (0.0, -2.0), (2.0, 2.0)]:
        moved = make_marker_frame(shift)
        out = MT.estimate_force(moved, baseline, CFG)
        got = np.asarray(out["mean_disp"])
        np.testing.assert_allclose(got, shift, atol=0.5)
        mag = np.asarray(out["magnitude"])
        np.testing.assert_allclose(mag, np.hypot(*shift), atol=0.6)
        force = np.asarray(out["force"])
        assert force.shape == (3,)
        np.testing.assert_allclose(force[:2], got, atol=1e-5)


def test_no_contact_gives_zero_force():
    base = make_marker_frame()
    baseline = MT.calibrate(base, CFG)
    out = MT.estimate_force(base, baseline, CFG)
    assert float(out["magnitude"]) < 0.05


def test_sequence_batch():
    base = make_marker_frame()
    baseline = MT.calibrate(base, CFG)
    frames = np.stack([make_marker_frame((i * 1.0, 0.0)) for i in range(4)])
    out = MT.estimate_force_sequence(frames, baseline, CFG)
    assert out["forces"].shape == (4, 3)
    np.testing.assert_allclose(np.asarray(out["forces"])[:, 0],
                               [0, 1, 2, 3], atol=0.5)


def test_rgb_input_supported():
    gray = make_marker_frame()
    rgb = np.stack([gray] * 3, axis=-1)
    baseline = MT.calibrate(rgb, CFG)
    assert int(np.asarray(baseline["valid"]).sum()) == 63
