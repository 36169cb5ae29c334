"""Control-loop runtime: chunk scheduler + recorded-episode replay harness.

TPU-native re-design of the deployment loop
(``/root/reference/VLA/residual_controller/frank_inference_eef.py:340-577``):

- the VLA re-plans a 64-step chunk every ``replan_interval`` (=16) executed
  steps (``:495-498``);
- refinement modes (``:505-563``): ``none`` executes the raw chunk;
  ``bridge`` refines the next 16-step window once per replan; ``lstm``
  refines step-by-step, re-reading the force signal each tick with the LSTM
  carry persisted on device between ticks;
- a 2-frame observation window maintained like ``update_observation_window``
  (``:111-147``);
- gripper deadband smoothing (``:247-261``);
- ROS is an adapter at the edge: the loop consumes an ``Observation``
  dataclass, and :class:`EpisodeReplay` drives it from recorded h5 episodes
  (the testable stand-in for the robot).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np


@dataclasses.dataclass
class Observation:
    state: np.ndarray                    # (D_low,) raw robot state
    images: list                          # per-camera HxWx3 uint8 (or None)
    force: Optional[np.ndarray] = None    # (3,) GelSight force


@dataclasses.dataclass(frozen=True)
class ControlLoopConfig:
    chunk_size: int = 64
    replan_interval: int = 16
    refiner: str = "none"                # none | bridge | lstm
    refine_horizon: int = 16             # bridge refinement window
    gripper_deadband: float = 2.0        # raw gripper units (:247-261)
    publish_rate_hz: float = 6.0


class ObservationWindow:
    """Fixed 2-slot rolling window (reference :111-147)."""

    def __init__(self, size: int = 2):
        self.size = size
        self.buffer: list = []

    def update(self, obs: Observation):
        if not self.buffer:
            self.buffer = [obs] * self.size
        else:
            self.buffer = self.buffer[1:] + [obs]

    @property
    def current(self) -> Observation:
        return self.buffer[-1]

    def image_sequence(self) -> list:
        """6-image order [ext_{t-1}, right_{t-1}, left_{t-1}, ext_t, ...]."""
        out = []
        for obs in self.buffer:
            imgs = list(obs.images) + [None] * (3 - len(obs.images))
            out.extend(imgs[:3])
        return out


class GripperSmoother:
    """Suppress small gripper oscillations (reference :247-261)."""

    def __init__(self, deadband: float):
        self.deadband = deadband
        self.last = None

    def __call__(self, g: float) -> float:
        if self.last is None or abs(g - self.last) > self.deadband:
            self.last = float(g)
        return self.last


class InstructionStore:
    """Runtime instruction switching over precomputed embeddings.

    The reference runs a keyboard thread that swaps the active instruction
    from a precomputed T5-embedding dict mid-episode
    (``frank_inference_eef.py:358-398,412-420``).  Here it is an explicit
    object the planner (or an operator UI) drives; switching marks the
    current chunk stale so the scheduler replans immediately.
    """

    def __init__(self, instruction_dict: dict, initial: Optional[str] = None):
        self.all_instructions = list(instruction_dict["all_instructions"])
        self._embeds = {k: instruction_dict[k] for k in self.all_instructions}
        self.current = initial or self.all_instructions[0]
        self.version = 0

    @property
    def embedding(self):
        return self._embeds[self.current]

    def switch(self, instruction_or_index) -> str:
        if isinstance(instruction_or_index, int):
            self.current = self.all_instructions[instruction_or_index]
        else:
            assert instruction_or_index in self._embeds, instruction_or_index
            self.current = instruction_or_index
        self.version += 1
        return self.current


class ChunkScheduler:
    """Re-plan / refine / execute scheduler.

    ``plan_fn(obs_window) -> (chunk_size, D) chunk``;
    ``bridge_refine_fn(obs, chunk_window) -> refined window`` (optional);
    ``lstm_step_fn(carry, obs, action, first) -> (carry, refined_action)``
    (optional).
    """

    def __init__(self, cfg: ControlLoopConfig, plan_fn: Callable,
                 bridge_refine_fn: Optional[Callable] = None,
                 lstm_step_fn: Optional[Callable] = None,
                 instructions: Optional[InstructionStore] = None,
                 plan_warm_fn: Optional[Callable] = None):
        self.cfg = cfg
        self.plan_fn = plan_fn
        self.plan_warm_fn = plan_warm_fn
        self.bridge_refine_fn = bridge_refine_fn
        self.lstm_step_fn = lstm_step_fn
        self.instructions = instructions
        self._instruction_version = instructions.version if instructions else 0
        self.window = ObservationWindow(2)
        self.smoother = GripperSmoother(cfg.gripper_deadband)
        self.reset()

    def reset(self):
        self.t = 0
        self.chunk = None
        self.chunk_pos = 0
        self.lstm_carry = None
        self.window.buffer = []

    def tick(self, obs: Observation) -> np.ndarray:
        """One control tick: returns the action to execute."""
        cfg = self.cfg
        self.window.update(obs)

        # An instruction switch invalidates the current chunk (replan now).
        if (self.instructions is not None
                and self.instructions.version != self._instruction_version):
            self._instruction_version = self.instructions.version
            self.chunk = None

        if self.chunk is None or self.chunk_pos >= cfg.replan_interval:
            if self.plan_warm_fn is not None and self.chunk is not None:
                # Warm-started replan (partial denoising): the previous
                # chunk, shifted by the ticks already executed and padded
                # with its last action, seeds the solver tail.
                n = self.chunk.shape[0]
                k = min(self.chunk_pos, n)
                prior = np.concatenate(
                    [self.chunk[k:], np.repeat(self.chunk[-1:], k, axis=0)],
                    axis=0)
                self.chunk = np.asarray(self.plan_warm_fn(self.window,
                                                          prior))
            else:
                self.chunk = np.asarray(self.plan_fn(self.window))
            self.chunk_pos = 0
            if cfg.refiner == "bridge" and self.bridge_refine_fn is not None:
                n = min(cfg.refine_horizon, self.chunk.shape[0])
                refined = np.asarray(
                    self.bridge_refine_fn(obs, self.chunk[:n]))
                self.chunk = np.concatenate([refined, self.chunk[n:]], axis=0)
            if cfg.refiner == "lstm":
                self.lstm_carry = None  # fresh carry per replanned chunk

        action = self.chunk[self.chunk_pos]
        if cfg.refiner == "lstm" and self.lstm_step_fn is not None:
            self.lstm_carry, action = self.lstm_step_fn(
                self.lstm_carry, obs, action, first=self.chunk_pos == 0)
            action = np.asarray(action)

        action = np.array(action, np.float64)
        action[-1] = self.smoother(action[-1])
        self.chunk_pos += 1
        self.t += 1
        return action


class EpisodeReplay:
    """Drive the scheduler from a recorded episode h5 (the test harness that
    replaces the ROS robot)."""

    def __init__(self, path: str):
        import h5py

        from vla_touch_tpu.data.episode import qpos_from_episode

        self.path = path
        with h5py.File(path, "r") as f:
            self.qpos = qpos_from_episode(f)
            self.forces = np.asarray(f["gelsight_force"]["forces"])
            self.cam1 = np.asarray(f["camera1"]["camera1"])
            self.cam2 = np.asarray(f["camera2"]["camera2"])
        self.T = self.qpos.shape[0]

    def observation(self, t: int) -> Observation:
        t = min(t, self.T - 1)
        return Observation(state=self.qpos[t],
                           images=[self.cam1[t], self.cam2[t], None],
                           force=self.forces[t])

    def run(self, scheduler: ChunkScheduler, steps: Optional[int] = None
            ) -> dict:
        """Closed-loop replay: observations come from the recording; returns
        executed actions and tracking MSE vs the recorded trajectory."""
        steps = steps or self.T - 1
        actions = []
        for t in range(steps):
            a = scheduler.tick(self.observation(t))
            actions.append(a)
        actions = np.stack(actions)
        # Tracking metric: predicted action at t vs recorded state at t+1.
        target = self.qpos[1:steps + 1]
        mse = float(np.mean((actions - target) ** 2))
        return {"actions": actions, "tracking_mse": mse, "steps": steps}
