"""Eval visualization helpers (the reference's 4-panel comparison plots +
GelSight marker-field figure) render real files."""

import os

import numpy as np

from vla_touch_tpu.eval import visualize as V


def test_trajectory_and_batch_plots(tmp_path, rng):
    T, D = 16, 10
    expert = rng.normal(size=(T, D)).astype(np.float32)
    vla = expert + rng.normal(size=(T, D)).astype(np.float32) * 0.1
    refined = expert + rng.normal(size=(T, D)).astype(np.float32) * 0.05
    p = V.plot_trajectory_comparison(expert, vla, refined,
                                     str(tmp_path / "traj.png"),
                                     dims=[0, 3, 9],
                                     dim_names=["x", "ry", "grip"])
    assert os.path.exists(p) and os.path.getsize(p) > 1000

    paths = V.plot_samples(expert[None].repeat(3, 0), vla[None].repeat(3, 0),
                           refined[None].repeat(3, 0), str(tmp_path / "b"),
                           max_samples=2)
    assert len(paths) == 2 and all(os.path.exists(q) for q in paths)


def test_marker_field_plot(tmp_path, rng):
    frame = rng.integers(0, 255, (48, 64), np.uint8)
    n = 12
    cents = np.stack([rng.uniform(5, 59, n), rng.uniform(5, 43, n)], -1)
    baseline = {"centroids": cents}
    result = {
        "displacement": rng.normal(size=(n, 2)).astype(np.float32),
        "valid": rng.random(n) > 0.2,
        "mean_disp": np.array([0.5, -0.3], np.float32),
        "magnitude": 1.7,
    }
    p = V.plot_marker_field(frame, baseline, result,
                            str(tmp_path / "m" / "field.png"))
    assert os.path.exists(p) and os.path.getsize(p) > 1000
