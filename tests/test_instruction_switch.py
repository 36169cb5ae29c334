"""Instruction switching + multi-dataset consumer sampling."""

import numpy as np
import pytest

from vla_touch_tpu.runtime.control_loop import (
    ChunkScheduler,
    ControlLoopConfig,
    InstructionStore,
    Observation,
)


def test_instruction_store_and_replan():
    d = {"all_instructions": ["wipe the table", "grab the cup"],
         "wipe the table": np.ones((3, 8)), "grab the cup": np.zeros((3, 8))}
    store = InstructionStore(d)
    assert store.current == "wipe the table"
    assert store.embedding.sum() == 24

    plans = []

    def plan_fn(window):
        plans.append(store.current)
        return np.zeros((8, 10))

    cfg = ControlLoopConfig(chunk_size=8, replan_interval=8,
                            gripper_deadband=0.0)
    sched = ChunkScheduler(cfg, plan_fn, instructions=store)
    obs = Observation(state=np.zeros(10), images=[None] * 3)
    sched.tick(obs)          # plan 1 under "wipe"
    sched.tick(obs)
    store.switch(1)          # switch by index
    assert store.current == "grab the cup"
    sched.tick(obs)          # must replan immediately
    assert plans == ["wipe the table", "wipe the table"][:1] + plans[1:]
    assert plans[0] == "wipe the table" and plans[1] == "grab the cup"
    store.switch("wipe the table")
    sched.tick(obs)
    assert plans[2] == "wipe the table"
    with pytest.raises(AssertionError):
        store.switch("unknown instruction")


def test_multi_dataset_consumer(tmp_path):
    from vla_touch_tpu.config import DataConfig
    from vla_touch_tpu.data.consumer import VLAConsumerDataset
    from vla_touch_tpu.data.episode import make_synthetic_dataset

    for name in ("alpha", "beta"):
        make_synthetic_dataset(str(tmp_path / f"{name}_hdf5_gelsight"),
                               n_episodes=1, num_steps=40, img_size=24,
                               chunk=8, lang_dim=16)
    cfg = DataConfig(data_root=str(tmp_path), dataset_names=("alpha", "beta"),
                     chunk_size=8, image_size=24)
    ds = VLAConsumerDataset(cfg, seed=0, dataset_weights=[0.8, 0.2])
    names = [ds.sample()["dataset_name"] for _ in range(40)]
    assert set(names) == {"alpha", "beta"}
    assert names.count("alpha") > names.count("beta")
    assert set(ds.dataset_stats) == {"alpha", "beta"}
