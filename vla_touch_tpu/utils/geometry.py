"""Rotation-representation conversions: quaternion / euler / matrix / ortho6d.

JAX-native (jittable, batched) equivalents of the reference's scipy-based
helpers (``/root/reference/VLA/docs/test_6drot.py:44-116`` and
``/root/reference/VLA/scripts/utils_eef.py:112-121``).  Quaternions use the
scipy ``xyzw`` convention; euler angles are intrinsic ``xyz`` (roll-pitch-yaw)
to match ``R.from_quat(...).as_euler('xyz')``.

All functions operate on the last axis and broadcast over leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_vector(v, eps: float = 1e-8):
    """L2-normalize along the last axis with a magnitude floor."""
    mag = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(mag, eps)


def quaternion_to_rotation_matrix(quat):
    """Quaternion (..., 4) in xyzw order -> rotation matrix (..., 3, 3)."""
    quat = normalize_vector(quat)
    x, y, z, w = (quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3])
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(quat.shape[:-1] + (3, 3))


def rotation_matrix_to_quaternion(m):
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4) xyzw, w >= 0.

    Uses the numerically stable branch-free Shepperd-style construction:
    compute all four candidate quaternions scaled by their pivot and select
    the one with the largest pivot.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot (first element) dominates.
    qw = jnp.stack([m21 - m12, m02 - m20, m10 - m01, 1 + tr], axis=-1)
    qx = jnp.stack([1 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12], axis=-1)
    qy = jnp.stack([m01 + m10, 1 - m00 + m11 - m22, m12 + m21, m02 - m20], axis=-1)
    qz = jnp.stack([m02 + m20, m12 + m21, 1 - m00 - m11 + m22, m10 - m01], axis=-1)

    pivots = jnp.stack(
        [1 + m00 - m11 - m22, 1 - m00 + m11 - m22, 1 - m00 - m11 + m22, 1 + tr],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qx, qy, qz, qw], axis=-2)  # (..., 4 candidates, 4 comps)
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    q = normalize_vector(q)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def euler_to_rotation_matrix(euler):
    """Intrinsic-xyz euler (..., 3) -> rotation matrix (..., 3, 3).

    Matches ``scipy.spatial.transform.Rotation.from_euler('xyz', e)``:
    R = Rz(yaw) @ Ry(pitch) @ Rx(roll).
    """
    rx, ry, rz = euler[..., 0], euler[..., 1], euler[..., 2]
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    m = jnp.stack(
        [
            cy * cz, sx * sy * cz - cx * sz, cx * sy * cz + sx * sz,
            cy * sz, sx * sy * sz + cx * cz, cx * sy * sz - sx * cz,
            -sy, sx * cy, cx * cy,
        ],
        axis=-1,
    )
    return m.reshape(euler.shape[:-1] + (3, 3))


def rotation_matrix_to_euler(m):
    """Rotation matrix (..., 3, 3) -> intrinsic-xyz euler (..., 3)."""
    sy = -m[..., 2, 0]
    sy = jnp.clip(sy, -1.0, 1.0)
    pitch = jnp.arcsin(sy)
    # Gimbal-lock-safe: when |cos(pitch)| ~ 0, roll and yaw are degenerate;
    # we follow scipy and put all the rotation into yaw with roll = 0.
    cos_pitch = jnp.sqrt(jnp.maximum(1.0 - sy * sy, 0.0))
    safe = cos_pitch > 1e-7
    roll = jnp.where(safe, jnp.arctan2(m[..., 2, 1], m[..., 2, 2]), 0.0)
    yaw = jnp.where(
        safe,
        jnp.arctan2(m[..., 1, 0], m[..., 0, 0]),
        jnp.arctan2(-m[..., 0, 1], m[..., 1, 1]),
    )
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quaternion_to_euler(quat):
    return rotation_matrix_to_euler(quaternion_to_rotation_matrix(quat))


def euler_to_quaternion(euler):
    return rotation_matrix_to_quaternion(euler_to_rotation_matrix(euler))


def rotation_matrix_to_ortho6d(m):
    """Rotation matrix (..., 3, 3) -> 6D representation (..., 6).

    The 6D code is the first two *columns* of R, flattened column-major
    (reference: ``test_6drot.py:74-82``).
    """
    cols = jnp.swapaxes(m[..., :, :2], -1, -2)  # (..., 2, 3)
    return cols.reshape(m.shape[:-2] + (6,))


def ortho6d_to_rotation_matrix(ortho6d):
    """6D representation (..., 6) -> rotation matrix (..., 3, 3) via
    Gram–Schmidt (reference: ``test_6drot.py:58-71``)."""
    x_raw = ortho6d[..., 0:3]
    y_raw = ortho6d[..., 3:6]
    x = normalize_vector(x_raw)
    z = normalize_vector(jnp.cross(x, y_raw))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)  # columns are x, y, z


def quaternion_to_ortho6d(quat):
    """Quaternion (..., 4) xyzw -> ortho6d (..., 6)
    (reference: ``test_6drot.py:110-116``)."""
    return rotation_matrix_to_ortho6d(quaternion_to_rotation_matrix(quat))


def ortho6d_to_quaternion(ortho6d):
    return rotation_matrix_to_quaternion(ortho6d_to_rotation_matrix(ortho6d))


def ee_pose_7d_to_9d(pose7):
    """[x, y, z, qx, qy, qz, qw] (..., 7) -> [x, y, z, ortho6d] (..., 9)
    (reference: ``utils_eef.py:112-121``)."""
    return jnp.concatenate(
        [pose7[..., :3], quaternion_to_ortho6d(pose7[..., 3:7])], axis=-1
    )


def ee_pose_9d_to_7d(pose9):
    """[x, y, z, ortho6d] (..., 9) -> [x, y, z, qx, qy, qz, qw] (..., 7)."""
    return jnp.concatenate(
        [pose9[..., :3], ortho6d_to_quaternion(pose9[..., 3:9])], axis=-1
    )
