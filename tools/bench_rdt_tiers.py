"""On-chip sensitivity sweep for the mixed w4/int8 RDT serving recipe.

The B=1 denoise loop is weight-streaming bound: int8 streams ~1.64 GB/step
(~2.0 ms at v5e's ~819 GB/s), int4 would halve that — but all-int4 carries
~11% per-matmul weight error (4-bit uniform floor for Gaussian-class
weights, even with the MSE clip search) and fails the chunk-parity gate.
This tool measures, per tier, the RDT chunk correlation vs the bf16 oracle
AND the p50 chunk latency, so the bench policy (which tier holds the
parity-gated headline) is a measured decision, not a guess.

Tiers: int8 baseline; +kv_proj int8 (cuts ~2 ms off the one-time cond-KV
build at ~1%% KV error, ``quant_serve.py::quantize_rdt_params``); mixed w4
by matmul class (ffn = 57%% of streamed bytes, qkv 21%%, projs 21%%); all
int4 (both XLA grouped-dot and the nibble-streaming Pallas path).

Run on the real chip:  python tools/bench_rdt_tiers.py [--iters 8]
Prints one JSON line per tier.

Matches the serving loop of /root/reference/VLA/models/rdt_runner.py:122-165
(the reference offers no quantized serving at all).
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
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tiers", type=str, default="")
    ap.add_argument("--config", type=str, default="1b",
                    choices=("tiny", "170m", "1b"),
                    help="tiny = CPU smoke test of the harness itself")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vla_touch_tpu.config import (
        NoiseSchedulerConfig, rdt_1b, rdt_170m, rdt_tiny)
    from vla_touch_tpu.models.rdt import quant_serve as Q
    from vla_touch_tpu.models.rdt import runner as R

    rng = np.random.default_rng(0)
    mcfg = {"tiny": rdt_tiny, "170m": rdt_170m, "1b": rdt_1b}[args.config]()
    rcfg = R.RDTRunnerConfig(model=mcfg, noise=NoiseSchedulerConfig())
    m = rcfg.model

    params = jax.jit(lambda k: R.init_rdt(rcfg, k))(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    params["model"]["final_ffn"]["fc2"]["kernel"] = jnp.asarray(
        rng.normal(size=params["model"]["final_ffn"]["fc2"]["kernel"].shape)
        * 0.02, jnp.bfloat16)

    B, Ll = 1, min(64, m.max_lang_cond_len)
    lang = jnp.asarray(rng.normal(size=(B, Ll, m.lang_token_dim)),
                       jnp.bfloat16)
    lang_mask = jnp.ones((B, Ll), bool)
    img = jnp.asarray(rng.normal(size=(B, m.img_cond_len, m.img_token_dim)),
                      jnp.bfloat16)
    state128 = jnp.asarray(rng.normal(size=(B, 1, m.state_token_dim)),
                           jnp.bfloat16)
    amask = np.zeros((B, 1, m.output_dim), np.float32)
    amask[:, :, 30:40] = 1.0
    amask = jnp.asarray(amask)
    freqs = jnp.full((B,), 10.0, jnp.float32)

    # bf16 oracle chunk (fixed key + fixed init noise shared by every tier)
    noise0 = jnp.asarray(rng.normal(size=(B, m.horizon, m.output_dim)),
                         jnp.float32)
    key = jax.random.PRNGKey(123)
    want = np.asarray(R.rdt_predict_action(
        rcfg, params, key, lang, lang_mask, img, state128, amask, freqs,
        init_noise=noise0), np.float32)
    wsel = amask[0, 0].astype(bool)
    want_sel = want[:, :, np.asarray(wsel)].ravel()

    def one_rep(fn, qp, i):
        """One timed rep: ITERS chained (sequentially dependent) ticks."""
        t0 = time.perf_counter()
        s = state128
        for j in range(args.iters):
            out = fn(qp, jax.random.PRNGKey(i * args.iters + j), s)
            # true sequential dependence through the state token
            s = state128 + (0.0 * out[:, :1, :]).astype(state128.dtype)
        np.asarray(out)
        return (time.perf_counter() - t0) * 1e3 / args.iters

    sel_ffn = Q.make_w4_select(kinds=("fc1", "fc2"))
    sel_ffn_qkv = Q.make_w4_select(kinds=("fc1", "fc2", "qkv"))
    sel_ffn_half = Q.make_w4_select(blocks=range(7, 21), kinds=("fc1", "fc2"))
    TIERS = {
        "int8": (lambda p: Q.quantize_rdt_params(p), "bf16", "xla"),
        "int8+kv8": (lambda p: Q.quantize_rdt_params(p, kv_proj="int8"),
                     "bf16", "xla"),
        "mix-ffn": (lambda p: Q.quantize_rdt_params(
            p, weights="mixed", w4_select=sel_ffn), "bf16", "xla"),
        "mix-ffn-qkv": (lambda p: Q.quantize_rdt_params(
            p, weights="mixed", w4_select=sel_ffn_qkv), "bf16", "xla"),
        "mix-ffn-half": (lambda p: Q.quantize_rdt_params(
            p, weights="mixed", w4_select=sel_ffn_half), "bf16", "xla"),
        "int4": (lambda p: Q.quantize_rdt_params(p, weights="int4"),
                 "bf16", "xla"),
        "int4-pallas": (lambda p: Q.quantize_rdt_params(p, weights="int4"),
                        "bf16", "pallas"),
        "mix-ffn-pallas": (lambda p: Q.quantize_rdt_params(
            p, weights="mixed", w4_select=sel_ffn), "bf16", "pallas"),
        "mix-ffn-half-pallas": (lambda p: Q.quantize_rdt_params(
            p, weights="mixed", w4_select=sel_ffn_half), "bf16", "pallas"),
        "int8-pallas": (lambda p: Q.quantize_rdt_params(p),
                        "bf16", "pallas"),
        "mix-ffn+kv8": (lambda p: Q.quantize_rdt_params(
            p, weights="mixed", kv_proj="int8", w4_select=sel_ffn),
            "bf16", "xla"),
        "int8-pallas+kv8": (lambda p: Q.quantize_rdt_params(
            p, kv_proj="int8"), "bf16", "pallas"),
        "int4-pallas+kv8": (lambda p: Q.quantize_rdt_params(
            p, weights="int4", kv_proj="int8"), "bf16", "pallas"),
    }
    names = [t for t in args.tiers.split(",") if t] or list(TIERS)

    # Interleaved measurement: quantize + compile + corr-check every tier
    # first, then round-robin the timed reps so slow drift in the
    # tunnel/chip hits all tiers equally (sequential per-tier measurement
    # showed +-3 ms ordering effects).
    tiers = {}
    for name in names:
        quantizer, kv_cache, matmul = TIERS[name]
        qp = jax.jit(quantizer)(params)

        def fn(q, k, s, kv_cache=kv_cache, matmul=matmul):
            return Q.rdt_predict_action_quant(
                rcfg, q, k, lang, lang_mask, img, s, amask, freqs,
                kv_cache=kv_cache, matmul=matmul, init_noise=noise0)
        jfn = jax.jit(fn)
        got = np.asarray(jfn(qp, key, state128), np.float32)
        got_sel = got[:, :, np.asarray(wsel)].ravel()
        corr = float(np.corrcoef(want_sel, got_sel)[0, 1])
        tiers[name] = {"fn": jfn, "qp": qp, "corr": corr, "lat": []}
        print(json.dumps({"tier": name, "compiled": True,
                          "chunk_corr": round(corr, 5)}), flush=True)
    for i in range(args.reps):
        for name in names:
            t = tiers[name]
            t["lat"].append(one_rep(t["fn"], t["qp"], i))
    for name in names:
        t = tiers[name]
        print(json.dumps({
            "tier": name, "p50_ms": round(float(np.median(t["lat"])), 2),
            "min_ms": round(float(np.min(t["lat"])), 2),
            "chunk_corr": round(t["corr"], 5),
            "lat_ms": [round(x, 1) for x in t["lat"]]}), flush=True)


if __name__ == "__main__":
    main()
