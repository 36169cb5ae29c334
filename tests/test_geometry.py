"""Geometry conversions vs scipy ground truth (the reference's backend)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from vla_touch_tpu.utils import geometry as G


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quaternion_to_rotation_matrix_matches_scipy():
    q = random_quats(64)
    ours = np.asarray(G.quaternion_to_rotation_matrix(q))
    ref = R.from_quat(q).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_rotation_matrix_to_quaternion_roundtrip():
    q = random_quats(64, seed=1)
    m = R.from_quat(q).as_matrix()
    back = np.asarray(G.rotation_matrix_to_quaternion(m))
    # Compare up to sign (we canonicalize w >= 0).
    ref = np.where(q[:, 3:4] < 0, -q, q)
    np.testing.assert_allclose(back, ref, atol=1e-6)


def test_euler_roundtrip_matches_scipy():
    rng = np.random.default_rng(2)
    e = rng.uniform(-np.pi * 0.49, np.pi * 0.49, size=(64, 3))
    ours = np.asarray(G.euler_to_rotation_matrix(e))
    ref = R.from_euler("xyz", e).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    e_back = np.asarray(G.rotation_matrix_to_euler(ref))
    np.testing.assert_allclose(e_back, e, atol=1e-6)


def test_quaternion_to_ortho6d_matches_reference_semantics():
    """ortho6d = first two columns of R, flattened column-major
    (test_6drot.py:74-82,110-116)."""
    q = random_quats(32, seed=3)
    m = R.from_quat(q).as_matrix()
    ref6d = m[:, :, :2].transpose(0, 2, 1).reshape(len(q), 6)
    ours = np.asarray(G.quaternion_to_ortho6d(q))
    np.testing.assert_allclose(ours, ref6d, atol=1e-6)


def test_ortho6d_roundtrip():
    q = random_quats(32, seed=4)
    o6 = np.asarray(G.quaternion_to_ortho6d(q))
    m = np.asarray(G.ortho6d_to_rotation_matrix(o6))
    ref = R.from_quat(q).as_matrix()
    np.testing.assert_allclose(m, ref, atol=1e-6)
    q_back = np.asarray(G.ortho6d_to_quaternion(o6))
    ref_q = np.where(q[:, 3:4] < 0, -q, q)
    np.testing.assert_allclose(q_back, ref_q, atol=1e-6)


def test_ee_pose_7d_9d_roundtrip():
    rng = np.random.default_rng(5)
    pos = rng.normal(size=(16, 3))
    q = random_quats(16, seed=6)
    pose7 = np.concatenate([pos, q], axis=-1)
    pose9 = np.asarray(G.ee_pose_7d_to_9d(pose7))
    assert pose9.shape == (16, 9)
    back = np.asarray(G.ee_pose_9d_to_7d(pose9))
    np.testing.assert_allclose(back[:, :3], pos, atol=1e-6)
    ref_q = np.where(q[:, 3:4] < 0, -q, q)
    np.testing.assert_allclose(back[:, 3:], ref_q, atol=1e-5)


def test_gimbal_lock_does_not_nan():
    e = np.array([[0.3, np.pi / 2, 0.7]])
    m = np.asarray(G.euler_to_rotation_matrix(e))
    out = np.asarray(G.rotation_matrix_to_euler(m))
    assert np.isfinite(out).all()
