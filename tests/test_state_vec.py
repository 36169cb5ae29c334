import numpy as np

from vla_touch_tpu.utils import state_vec as SV


def test_mapping_invariants():
    m = SV.STATE_VEC_IDX_MAPPING
    assert m["eef_pos_x"] == 30
    assert m["eef_pos_y"] == 31
    assert m["eef_pos_z"] == 32
    assert [m[f"eef_angle_{i}"] for i in range(6)] == list(range(33, 39))
    assert m["right_gripper_open"] == 10
    assert m["gripper_open"] == m["right_gripper_open"]
    assert m["left_gripper_open"] == 60
    assert max(m.values()) < SV.STATE_VEC_LEN


def test_franka_eef_indices():
    assert SV.FRANKA_EEF_STATE_INDICES == [30, 31, 32, 33, 34, 35, 36, 37, 38, 10]


def test_fill_and_extract_roundtrip():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(4, 7, 10)).astype(np.float32)
    uni = SV.fill_in_state(v)
    assert uni.shape == (4, 7, 128)
    # All other slots must be exactly zero.
    mask = np.ones(128, bool)
    mask[SV.FRANKA_EEF_STATE_INDICES] = False
    assert np.all(uni[..., mask] == 0)
    np.testing.assert_array_equal(SV.extract_state(uni), v)


def test_aloha_indices_are_14d_disjoint():
    idx = SV.ALOHA_STATE_INDICES
    assert len(idx) == 14
    assert len(set(idx)) == 14
