"""Measure training-input throughput: h5py vs the native .epc cache.

Answers VERDICT r3 #4's question — is the h5py path actually input-bound
at the RDT-1B operating point? — with numbers: builds a synthetic 384²
dataset, then times `VLAConsumerDataset.sample()+collate` end to end for
each data format (the full per-sample pipeline: episode read, frame
fetch/decode, pad/resize, masking, collation).

The trainer consumes batch_size*grad_accum samples per optimizer step;
with the measured per-sample cost this prints the max steps/s each loader
can feed and the fraction of an RDT-1B step budget it eats.

Usage:  python tools/bench_dataio.py [--steps-ms 450] [--n 64]
(--steps-ms: measured RDT-1B optimizer-step time to compare against.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64, help="samples per format")
    ap.add_argument("--num-steps", type=int, default=120)
    ap.add_argument("--img-size", type=int, default=384)
    ap.add_argument("--episodes", type=int, default=2)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--accum", type=int, default=4)
    ap.add_argument("--steps-ms", type=float, default=None,
                    help="optimizer-step ms to compute input-bound fraction")
    args = ap.parse_args()

    from vla_touch_tpu.config import DataConfig
    from vla_touch_tpu.data.consumer import VLAConsumerDataset, collate
    from vla_touch_tpu.data.episode import make_synthetic_dataset
    from vla_touch_tpu.data.pack_epc import pack_dataset

    root = tempfile.mkdtemp(prefix="dataio_")
    name = "bench"
    ddir = os.path.join(root, f"{name}_hdf5_gelsight")
    os.makedirs(ddir)
    make_synthetic_dataset(ddir, n_episodes=args.episodes,
                           num_steps=args.num_steps, img_size=args.img_size,
                           chunk=64, lang_dim=4096)
    formats = {"h5": dict(data_format="h5")}
    try:
        t0 = time.perf_counter()
        pack_dataset(ddir, codec="jpeg")
        pack_s = time.perf_counter() - t0
        formats["epc-jpeg"] = dict(data_format="epc")
    except Exception as e:  # native toolchain missing: report h5 only
        print(f"# epc pack unavailable: {e}", file=sys.stderr)
        pack_s = None

    results = {}
    for fmt, kw in formats.items():
        if fmt == "epc-jpeg":
            # re-pack raw into a separate dir for the raw-codec row
            pass
        cfg = DataConfig(data_root=root, dataset_names=(name,),
                         chunk_size=64, image_size=args.img_size, **kw)
        ds = VLAConsumerDataset(cfg, seed=0)
        ds.sample()  # warm (opens files, builds stats)
        t0 = time.perf_counter()
        batches = 0
        consumed = 0
        while consumed < args.n:
            samples = [ds.sample() for _ in range(args.batch)]
            collate(samples)
            consumed += args.batch
            batches += 1
        dt = time.perf_counter() - t0
        per_sample_ms = dt * 1e3 / consumed
        row = {"per_sample_ms": round(per_sample_ms, 2),
               "samples_per_s": round(consumed / dt, 1)}
        if args.steps_ms:
            need = args.batch * args.accum
            feed_ms = per_sample_ms * need
            row["feed_ms_per_step"] = round(feed_ms, 1)
            row["input_bound_frac_1thread"] = round(
                feed_ms / args.steps_ms, 3)
        results[fmt] = row
        print(json.dumps({fmt: row}), flush=True)
    if pack_s is not None:
        print(json.dumps({"pack_s_total": round(pack_s, 2)}))


if __name__ == "__main__":
    main()
