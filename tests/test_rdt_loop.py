"""Consumer dataset pipeline + full RDT training loop smoke test (tiny)."""

import json
import os

import jax
import numpy as np
import pytest

from vla_touch_tpu.config import DataConfig, NoiseSchedulerConfig, TrainConfig, rdt_tiny
from vla_touch_tpu.data import episode as E
from vla_touch_tpu.data.consumer import VLAConsumerDataset, collate
from vla_touch_tpu.models.encoders.vit import ViTConfig
from vla_touch_tpu.models.rdt import runner as R
from vla_touch_tpu.train.rdt_loop import RDTTrainer

pytestmark = pytest.mark.slow

TINY_VIT = ViTConfig(hidden_size=48, num_layers=1, num_heads=4, mlp_dim=96,
                     image_size=28, patch_size=14, use_cls_token=False,
                     use_layerscale=False, gelu_tanh=True)
TINY = rdt_tiny()  # img_cond_len=24 = 2 frames x 3 cams x 4 patches


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("episodes")
    E.make_synthetic_dataset(str(root), n_episodes=2, num_steps=48,
                             img_size=28, chunk=8, lang_len=6, lang_dim=32)
    return str(root)


def _dcfg():
    return DataConfig(chunk_size=8, image_size=28, cond_mask_prob=0.2,
                      state_noise_snr=40.0, image_aug=True)


def test_consumer_sample_and_collate(dataset_dir):
    dcfg = _dcfg()
    ds = VLAConsumerDataset(dcfg, seed=0,
                            file_paths=E.list_episode_files(dataset_dir))
    samples = [ds.sample() for _ in range(6)]
    batch = collate(samples, max_lang_len=16)
    assert batch["images"].shape == (6, 6, 28, 28, 3)
    assert batch["lang_tokens"].shape == (6, 16, 32)
    assert batch["lang_mask"][:, :6].all() and not batch["lang_mask"][:, 6:].any()
    assert batch["action_gt"].shape == (6, 8, 128)
    assert batch["state_tokens"].shape == (6, 1, 128)
    assert batch["action_mask"].shape == (6, 1, 128)
    # Condition masking actually fires at p=0.2 over enough draws.
    freqs = [ds.sample()["ctrl_freq"] for _ in range(50)]
    assert any(f == 0.0 for f in freqs) and any(f != 0.0 for f in freqs)
    # Left wrist camera is absent -> those frames are always masked.
    assert not batch["image_mask"][:, 2].any()
    assert not batch["image_mask"][:, 5].any()


def test_rdt_training_loop_with_resume(dataset_dir, tmp_path):
    rcfg = R.RDTRunnerConfig(model=TINY, noise=NoiseSchedulerConfig())
    tcfg = TrainConfig(batch_size=2, grad_accum=2, lr_warmup_steps=0,
                       checkpointing_period=3, sample_period=4,
                       checkpoints_total_limit=2)
    out = str(tmp_path / "rdt_out")
    trainer = RDTTrainer(rcfg, tcfg, _dcfg(), out, vision_cfg=TINY_VIT)

    files = E.list_episode_files(dataset_dir)
    state = trainer.train(file_paths=files, max_steps=4, resume_from=None)
    assert int(state.step) == 4
    assert os.path.isdir(os.path.join(out, "checkpoint-3"))
    assert os.path.isdir(os.path.join(out, "checkpoint-4"))

    rows = [json.loads(l) for l in open(trainer.metrics_log)]
    assert any(r.get("kind") == "sample_eval" for r in rows)
    assert all(np.isfinite(r["loss"]) for r in rows if "loss" in r)

    # Resume: continues from step 4 and prunes old checkpoints to the limit.
    state2 = trainer.train(file_paths=files, max_steps=6,
                           resume_from="latest")
    assert int(state2.step) == 6
    from vla_touch_tpu.utils.checkpoint import list_checkpoints

    cks = list_checkpoints(out)
    assert len(cks) <= 2
    assert cks[-1][0] == 6
