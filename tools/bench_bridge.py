"""Measure the BRIDGeR 10-step SDE refine and its scan-unroll ladder.

bench.py r4 stage breakdown put bridge_refine at ~12 ms — the LARGEST
stage of the 27 ms chunk+refine path (denoise is HBM-saturated at 6 ms,
cond-KV 8.6 ms at 0.65 MXU).  The SDE body is ~50 tiny ops on
(2B, 16, <=512) tensors, so the suspected cost is scan-iteration overhead
and missed cross-step fusion; this tool measures bridge_predict at
unroll in {1, 2, 5, 10} (identical math — unroll only changes loop
structure) plus the v/s-separate variant for reference.

Run on chip:  python tools/bench_bridge.py [--reps 6 --iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vla_touch_tpu.config import BridgeControllerConfig
    from vla_touch_tpu.models.controllers import bridge as BR

    rng = np.random.default_rng(0)
    bcfg = BridgeControllerConfig(inference_dtype="bfloat16")
    bst = BR.init_bridge_controller(bcfg, jax.random.PRNGKey(1))
    stats = {
        "vla_mins": np.zeros(10, np.float32),
        "vla_maxs": np.ones(10, np.float32),
        "action_mins": np.zeros(10, np.float32),
        "action_maxs": np.ones(10, np.float32),
    }
    B = 1
    state10 = jnp.asarray(rng.normal(size=(B, 10)), jnp.float32)
    vla10 = jnp.asarray(rng.normal(size=(B, bcfg.horizon, 10)), jnp.float32)
    cam1 = jnp.asarray(rng.normal(size=(B, bcfg.visual_dim)), jnp.float32)
    cam2 = jnp.asarray(rng.normal(size=(B, bcfg.visual_dim)), jnp.float32)
    forces = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)

    def make(unroll, impl):
        @jax.jit
        def f(p, e, key, s):
            return BR.bridge_predict(bcfg, p, e, stats, key, s, vla10,
                                     cam1_feat=cam1, cam2_feat=cam2,
                                     forces=forces, unroll=unroll,
                                     unet_impl=impl)
        return f

    variants = {
        "flax-u1": make(1, "flax"),
        "flax-u2": make(2, "flax"),
        "fused-u1": make(1, "fused"),
        "fused-u2": make(2, "fused"),
        "fused-u5": make(5, "fused"),
    }

    # compile + parity check (identical math across unrolls)
    k = jax.random.PRNGKey(3)
    outs = {}
    for name, f in variants.items():
        outs[name] = np.asarray(f(bst.params, bst.ema.shadow, k, state10),
                                np.float32)
    base = outs["flax-u1"]
    for name, o in outs.items():
        # identical math; bf16 reassociation across fused step boundaries
        # drifts a few ulps over 10 steps
        err = float(np.abs(o - base).max())
        assert err < 5e-2, (name, err)
        print(json.dumps({"variant": name, "max_abs_diff_vs_rolled":
                          round(err, 4)}), flush=True)

    lats = {name: [] for name in variants}
    for i in range(args.reps):
        for name, f in variants.items():
            t0 = time.perf_counter()
            s = state10
            for j in range(args.iters):
                out = f(bst.params, bst.ema.shadow,
                        jax.random.PRNGKey(i * args.iters + j), s)
                s = state10 + 0.0 * out[:, 0, :]
            np.asarray(out)
            lats[name].append((time.perf_counter() - t0) * 1e3 / args.iters)
    for name in variants:
        xs = lats[name]
        print(json.dumps({"variant": name,
                          "p50_ms": round(float(np.median(xs)), 2),
                          "min_ms": round(float(np.min(xs)), 2),
                          "lat_ms": [round(x, 2) for x in xs]}), flush=True)


if __name__ == "__main__":
    main()
