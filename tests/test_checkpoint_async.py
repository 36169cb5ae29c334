"""Async (overlapped) checkpoint writes: trainer thread path + orbax path.

The reference blocks training for every DeepSpeed/accelerate save
(``train/train.py:455-460``); here ``TrainConfig.async_save`` snapshots to
host and lets the serialization + disk write overlap subsequent steps.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from vla_touch_tpu.config import (DataConfig, NoiseSchedulerConfig,
                                  TrainConfig, rdt_tiny)
from vla_touch_tpu.models.rdt import runner as R
from vla_touch_tpu.train import rdt_train as T
from vla_touch_tpu.train.rdt_loop import RDTTrainer

RCFG = R.RDTRunnerConfig(model=rdt_tiny(), noise=NoiseSchedulerConfig())


def _trainer(tmp_path, **tkw):
    tcfg = TrainConfig(lr_warmup_steps=0, checkpoints_total_limit=2, **tkw)
    return RDTTrainer(RCFG, tcfg, DataConfig(), str(tmp_path / "out")), tcfg


def test_async_save_roundtrip_and_prune(tmp_path):
    trainer, tcfg = _trainer(tmp_path, async_save=True)
    state = T.init_train_state(RCFG, tcfg, jax.random.PRNGKey(0))

    # Two async saves back-to-back: the second must first drain the first.
    trainer.save_checkpoint(state, 3)
    trainer.save_checkpoint(state, 6)
    trainer._wait_ckpt()

    path = os.path.join(trainer.output_dir, "checkpoint-6")
    assert os.path.exists(os.path.join(path, "params.msgpack"))
    assert os.path.exists(os.path.join(path, "meta.json"))

    restored = trainer.load_checkpoint(state, path)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 6

    # A third save prunes past the limit (on the background thread).
    trainer.save_checkpoint(state, 9)
    trainer._wait_ckpt()
    from vla_touch_tpu.utils.checkpoint import list_checkpoints

    assert [s for s, _ in list_checkpoints(trainer.output_dir)] == [6, 9]


def test_sync_save_unchanged(tmp_path):
    trainer, tcfg = _trainer(tmp_path, async_save=False)
    state = T.init_train_state(RCFG, tcfg, jax.random.PRNGKey(1))
    trainer.save_checkpoint(state, 1)
    # Synchronous: files exist immediately, no thread to drain.
    assert trainer._ckpt_thread is None
    path = os.path.join(trainer.output_dir, "checkpoint-1")
    assert os.path.exists(os.path.join(path, "meta.json"))
    restored = trainer.load_checkpoint(state, path)
    assert int(restored.step) == 1


def test_async_save_failure_raises_at_next_wait(tmp_path, monkeypatch):
    """A failed background write (full disk, permissions) must fail the run
    at the next drain point, exactly as the synchronous path would — not
    vanish into the daemon thread's stderr."""
    import vla_touch_tpu.train.rdt_loop as loop_mod

    trainer, tcfg = _trainer(tmp_path, async_save=True)
    state = T.init_train_state(RCFG, tcfg, jax.random.PRNGKey(0))

    def boom(*a, **kw):
        raise OSError("disk full")

    monkeypatch.setattr(loop_mod.ckpt, "save_pytree", boom)
    trainer.save_checkpoint(state, 3)
    import pytest

    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        trainer._wait_ckpt()
    # The error is consumed: the trainer is usable again afterwards.
    assert trainer._ckpt_error is None


def test_multihost_async_meta_lands_after_data(tmp_path, monkeypatch):
    """Multi-host async path: meta.json must not exist until the orbax
    write commits — a crash mid-write must never leave a checkpoint dir
    that resume would pick but cannot load."""
    import threading

    import vla_touch_tpu.train.rdt_loop as loop_mod

    committed = threading.Event()
    saves = {}

    class FakeAsyncSaver:
        def save(self, path, tree):
            saves["path"] = path       # write is now "in flight"

        def wait(self):
            if "path" not in saves:    # pre-save drain: nothing in flight
                return
            committed.wait(timeout=10)
            os.makedirs(saves["path"], exist_ok=True)  # the atomic commit

    monkeypatch.setattr(loop_mod.jax, "process_count", lambda: 2)
    monkeypatch.setattr(loop_mod.jax, "process_index", lambda: 0)
    monkeypatch.setattr(loop_mod.ckpt, "AsyncOrbaxSaver", FakeAsyncSaver)

    trainer, tcfg = _trainer(tmp_path, async_save=True)
    state = T.init_train_state(RCFG, tcfg, jax.random.PRNGKey(0))
    trainer.save_checkpoint(state, 5)

    meta = os.path.join(trainer.output_dir, "checkpoint-5", "meta.json")
    assert not os.path.exists(meta)    # data still in flight -> no meta
    committed.set()
    trainer._wait_ckpt()
    assert os.path.exists(meta)        # meta only after the commit
    assert os.path.exists(saves["path"])


def test_async_orbax_saver_roundtrip(tmp_path):
    from vla_touch_tpu.utils import checkpoint as ckpt

    tree = {"w": jnp.arange(16.0).reshape(4, 4),
            "b": {"x": jnp.ones((3,), jnp.bfloat16)}}
    saver = ckpt.AsyncOrbaxSaver()
    p1 = str(tmp_path / "c1" / "state.orbax")
    p2 = str(tmp_path / "c2" / "state.orbax")
    saver.save(p1, tree)
    saver.save(p2, jax.tree.map(lambda x: x + 1, tree))  # drains save 1
    saver.wait()
    r1 = ckpt.load_pytree_orbax(p1, tree)
    r2 = ckpt.load_pytree_orbax(p2, tree)
    np.testing.assert_array_equal(np.asarray(r1["w"]), np.asarray(tree["w"]))
    np.testing.assert_array_equal(np.asarray(r2["w"]),
                                  np.asarray(tree["w"]) + 1)
    saver.close()
