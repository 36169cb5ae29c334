"""Controller-dataset IO throughput: h5 vs native .epc, 1..N builder
threads (VERDICT r4 #6 — the multi-core scaling claim, measured).

Builds a synthetic VLA-augmented dataset at the controller deployment
frame size (384² resized cams), packs it to .epc (jpeg codec — the
deployment contract), and measures ``ControllerDataset.batches`` per
second for each (format × workers) cell.

NOTE the host topology in the output: on a 1-core dev VM thread scaling is
bounded by the single core (the .epc JPEG decode still runs off the GIL in
C++ threads — ``n_threads`` inside the cache — which is why epc can beat
h5 even at workers=1).

Run: JAX_PLATFORMS=cpu python tools/bench_epc_threads.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from vla_touch_tpu.data.controller_dataset import ControllerDataset
    from vla_touch_tpu.data.episode import make_synthetic_dataset
    from vla_touch_tpu.data.pack_epc import pack_dataset
    from vla_touch_tpu.runtime import native_loader

    native_loader.build_library()
    results = {"host_cpus": os.cpu_count()}
    with tempfile.TemporaryDirectory() as td:
        h5_dir, epc_dir = td + "/h5", td + "/epc"
        make_synthetic_dataset(h5_dir, n_episodes=3, num_steps=60,
                               img_size=48, chunk=16, lang_dim=16,
                               resized_size=384)
        pack_dataset(h5_dir, epc_dir, codec="jpeg", use_resized=True)

        def run(data_dir, fmt, workers, batch=16, reps=3):
            ds = ControllerDataset(data_dir=data_dir, data_format=fmt,
                                   context_frames=2, horizon=16)
            best = 0.0
            for _ in range(reps):
                n = 0
                t0 = time.perf_counter()
                for b in ds.batches(batch, np.random.default_rng(0),
                                    workers=workers):
                    n += 1
                dt = time.perf_counter() - t0
                best = max(best, n / dt)
            return round(best, 2)

        for fmt, d in (("h5", h5_dir), ("epc", epc_dir)):
            for w in (0, 2, 4):
                key = f"{fmt}_workers{w}_batches_per_s"
                results[key] = run(d, fmt, w)
                print(json.dumps({key: results[key]}), flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
