import numpy as np

from vla_touch_tpu.utils.normalization import (
    compute_minmax_stats,
    denormalize_actions,
    normalize_actions,
)


def _torch_reference_normalize(actions, mins, maxs, padding_factor=1.4):
    """Independent numpy transcription of the documented reference behavior
    (controller_dataset.py:303-346): padded min-max to [-1, 1]."""
    orig_range = maxs - mins
    padded_range = orig_range * padding_factor
    center = (mins + maxs) / 2
    padded_mins = center - padded_range / 2
    padded_maxs = center + padded_range / 2
    safe = padded_maxs - padded_mins
    safe = np.where(safe < 1e-6, 1.0, safe)
    return 2.0 * (actions - padded_mins) / safe - 1.0


def test_normalize_matches_reference_formula(rng):
    a = rng.normal(size=(8, 16, 10)).astype(np.float32) * 3
    mins = a.reshape(-1, 10).min(0)
    maxs = a.reshape(-1, 10).max(0)
    stats = {"action_mins": mins, "action_maxs": maxs,
             "vla_mins": mins - 1, "vla_maxs": maxs + 1}
    ours = np.asarray(normalize_actions(a, stats, "expert"))
    ref = _torch_reference_normalize(a, mins, maxs)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
    # In-range data lands strictly inside [-1, 1] thanks to 1.4 padding.
    assert ours.min() >= -1.0 / 1.4 - 1e-5 and ours.max() <= 1.0 / 1.4 + 1e-5


def test_roundtrip(rng):
    a = rng.normal(size=(4, 32, 10)).astype(np.float32)
    stats = compute_minmax_stats(a, a * 1.1 + 0.2)
    for kind in ("expert", "vla"):
        n = normalize_actions(a, stats, kind)
        back = np.asarray(denormalize_actions(n, stats, kind))
        np.testing.assert_allclose(back, a, rtol=1e-4, atol=1e-5)


def test_degenerate_dim_no_blowup():
    a = np.zeros((5, 3, 2), np.float32)
    a[..., 1] = 7.0  # constant dim -> zero range
    stats = compute_minmax_stats(a, a)
    n = np.asarray(normalize_actions(a, stats))
    assert np.isfinite(n).all()
    back = np.asarray(denormalize_actions(n, stats))
    np.testing.assert_allclose(back, a, atol=1e-5)


def test_vla_vs_expert_stats_are_distinct(rng):
    a = rng.normal(size=(64, 10)).astype(np.float32)
    stats = compute_minmax_stats(a, a + 5.0)
    ne = np.asarray(normalize_actions(a, stats, "expert"))
    nv = np.asarray(normalize_actions(a, stats, "vla"))
    assert not np.allclose(ne, nv)
