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


# ---- HSR-lighting sensor variant (reference marker_tracker.py:116-152) ----

def make_hsr_frame(shift=(0.0, 0.0), gain=1.0, rows=7, cols=9, H=140,
                   W=180, radius=3, bg=120):
    """HSR raw frame: DARK markers on a near-uniform midtone background
    (init_HSR inverts first).  ``gain`` models the frame-to-frame global
    exposure drift that histogram equalization normalizes away — after
    inversion + equalizeHist the dominant background bin maps to 0
    regardless of gain, so the FIXED threshold 50 works where it would
    drift without equalization.  (A continuous intra-frame ramp would NOT
    survive this pipeline: equalization is rank-based, so a ramp spreads
    the background over the whole output range — the reference's HSR path
    presumes the sensor's uniform illumination.)"""
    img = make_marker_frame(shift, rows, cols, H, W, radius, bg=bg, fg=30)
    return np.clip(img * gain, 0, 255)


HSR_CFG = MT.TrackerConfig(grid_rows=7, grid_cols=9, min_cell_mass=4.0,
                           gelsight_version="hsr")


def test_equalize_hist_matches_cv2():
    rng = np.random.default_rng(1)
    img = rng.integers(20, 200, (48, 64)).astype(np.uint8)
    ours = np.asarray(MT.equalize_hist(img.astype(np.float32)))
    ref = cv2.equalizeHist(img).astype(np.float32)
    assert np.abs(ours - ref).max() <= 1.0  # rounding-mode off-by-one class


def test_hsr_mask_matches_cv2_pipeline():
    """Full HSR init path vs the cv2 oracle (invert -> equalizeHist ->
    GaussianBlur(5) -> threshold 50 -> MORPH_OPEN), interior pixels (border
    handling differs: cv2 reflects, XLA zero-pads)."""
    frame = make_hsr_frame().astype(np.float32)
    gray = np.clip(np.round(frame), 0, 255).astype(np.uint8)
    inv = 255 - gray
    eq = cv2.equalizeHist(inv)
    blurred = cv2.GaussianBlur(eq, (5, 5), 0)
    _, thresh = cv2.threshold(blurred, 50, 255, cv2.THRESH_BINARY)
    kernel = np.ones((3, 3), np.uint8)
    want = (cv2.morphologyEx(thresh, cv2.MORPH_OPEN, kernel) > 0)

    got = np.asarray(MT.marker_mask(frame, HSR_CFG)) > 0.5
    inner = (slice(6, -6), slice(6, -6))
    agree = (got[inner] == want[inner]).mean()
    # cv2 blurs the equalized image in uint8 (integer rounding); ours stays
    # float — pixels landing exactly on the threshold boundary can flip, so
    # require 99% pixel agreement rather than exactness.
    assert agree > 0.99, agree


def test_hsr_displacement_recovery():
    base = make_hsr_frame()
    baseline = MT.calibrate(base, HSR_CFG)
    assert int(np.asarray(baseline["valid"]).sum()) == 63
    # moved frame at a different global exposure: equalization absorbs it
    moved = make_hsr_frame((2.0, 1.0), gain=1.15)
    out = MT.estimate_force(moved, baseline, HSR_CFG)
    np.testing.assert_allclose(np.asarray(out["mean_disp"]), (2.0, 1.0),
                               atol=0.5)


def test_filter_coords_invalidates_dead_markers():
    """A dead marker region (reference filter_coords=[18,109]) must drop
    exactly the cells whose centroid is within filter_threshold."""
    frame = make_marker_frame()
    cfg0 = MT.TrackerConfig(grid_rows=7, grid_cols=9, min_cell_mass=4.0)
    cents, _, valid0 = MT.grid_centroids(MT.marker_mask(frame, cfg0), cfg0)
    cents = np.asarray(cents)
    dead = tuple(cents[10])  # kill cell 10's marker
    cfg = MT.TrackerConfig(grid_rows=7, grid_cols=9, min_cell_mass=4.0,
                           filter_coords=(dead,), filter_threshold=5.0)
    _, _, valid = MT.grid_centroids(MT.marker_mask(frame, cfg), cfg)
    valid = np.asarray(valid)
    assert int(np.asarray(valid0).sum()) == 63
    assert not valid[10]
    assert valid.sum() == 62
    # and the force path still works with the dead cell excluded
    baseline = MT.calibrate(frame, cfg)
    out = MT.estimate_force(make_marker_frame((1.0, 0.0)), baseline, cfg)
    np.testing.assert_allclose(np.asarray(out["mean_disp"]), (1.0, 0.0),
                               atol=0.5)
