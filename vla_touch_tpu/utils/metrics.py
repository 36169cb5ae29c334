"""Training metrics: jsonl + optional TensorBoard.

The reference logs through accelerate→wandb/tensorboard plus a
SummaryWriter + file/console logging pair (SURVEY §5).  Here one
:class:`MetricsLogger` writes machine-readable jsonl always and mirrors
scalars to TensorBoard when ``tensorboardX`` is importable (it is optional).
"""

from __future__ import annotations

import json
import os
import time



class MetricsLogger:
    def __init__(self, log_dir: str, jsonl_name: str = "training.jsonl",
                 tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl_path = os.path.join(log_dir, jsonl_name)
        self._tb = None
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(os.path.join(log_dir, "tb"))
            except ImportError:
                self._tb = None
        self._t0 = time.time()

    def log(self, step: int, scalars: dict, **extra) -> dict:
        row = {k: (float(v) if hasattr(v, "__float__") else v)
               for k, v in scalars.items()}
        row.update(step=step, elapsed=time.time() - self._t0, **extra)
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                try:
                    self._tb.add_scalar(k, float(v), step)
                except (TypeError, ValueError):
                    pass
        return row

    def close(self):
        if self._tb is not None:
            self._tb.close()
