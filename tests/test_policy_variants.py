"""Robot-embodiment policy variants: joint-space and bimanual configs."""

import numpy as np
import pytest

from vla_touch_tpu.config import NoiseSchedulerConfig, rdt_tiny
from vla_touch_tpu.models.encoders.vit import ViTConfig
from vla_touch_tpu.models.rdt import runner as R
from vla_touch_tpu.runtime import policy as P
from vla_touch_tpu.utils import state_vec as SV

TINY_VIT = ViTConfig(hidden_size=48, num_layers=1, num_heads=4, mlp_dim=96,
                     image_size=28, patch_size=14, use_cls_token=False,
                     use_layerscale=False, gelu_tanh=True)


def _cfg(base):
    return P.PolicyConfig(
        rdt=R.RDTRunnerConfig(model=rdt_tiny(), noise=NoiseSchedulerConfig(
            num_inference_timesteps=2)),
        vision=TINY_VIT, image_size=28,
        state_indices=base.state_indices, state_scale=base.state_scale,
        control_frequency=base.control_frequency)


def test_franka_joint_variant(rng):
    base = P.franka_joint_policy_config()
    assert list(base.state_indices) == SV.FRANKA_JOINT_STATE_INDICES
    model = P.create_model(_cfg(base), seed=0)
    proprio = np.concatenate([rng.normal(size=7), [2.0]])
    out = model.step(proprio, [None] * 6,
                     rng.normal(size=(4, 32)).astype(np.float32))
    assert out.shape == (1, 8, 8)          # 8-D joint actions
    assert np.isfinite(out).all()


def test_aloha_variant(rng):
    base = P.aloha_policy_config()
    assert len(base.state_indices) == 14
    assert base.control_frequency == 25.0
    model = P.create_model(_cfg(base), seed=0)
    out = model.step(rng.normal(size=14), [None] * 6,
                     rng.normal(size=(4, 32)).astype(np.float32))
    assert out.shape == (1, 8, 14)
    assert np.isfinite(out).all()


def test_variants_use_disjoint_unified_slots():
    eef = set(SV.FRANKA_EEF_STATE_INDICES)
    aloha = set(SV.ALOHA_STATE_INDICES)
    # EEF pose slots and joint slots don't collide except the shared gripper.
    joints = set(SV.FRANKA_JOINT_STATE_INDICES)
    assert eef & joints == {SV.STATE_VEC_IDX_MAPPING["right_gripper_open"]}
    assert len(aloha) == 14
