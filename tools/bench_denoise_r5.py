"""Round-5 denoise-loop roofline attack (VERDICT r4 #2).

Measures, on the real chip with the chained methodology (sequentially
dependent iterations inside one timing window, one completion fetch):

1. the TRUE per-step marginal cost of the int8 denoise loop — chunk-only
   pipeline at 5 vs 1 solver steps (slope = per-step, intercept = fixed
   replan cost: adaptors + cond-KV build + dispatch);
2. the int8x KV-cache tier (XLA-dequantized int8 condition cache — halves
   the dominant per-step KV read) vs the bf16 cache;
3. scan unroll=5 on the solver loop;
4. parity (chunk corr vs the bf16-KV int8 pipeline) for every variant.

Run: JAX_PLATFORMS=axon python tools/bench_denoise_r5.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 6
ITERS = 8


def main():
    import jax
    import jax.numpy as jnp

    from vla_touch_tpu.config import NoiseSchedulerConfig, rdt_1b
    from vla_touch_tpu.models.rdt import quant_serve as Q
    from vla_touch_tpu.models.rdt import runner as R

    rng = np.random.default_rng(0)
    rcfg = R.RDTRunnerConfig(model=rdt_1b(), noise=NoiseSchedulerConfig())
    m = rcfg.model

    params = jax.jit(lambda k: R.init_rdt(rcfg, k))(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    params["model"]["final_ffn"]["fc2"]["kernel"] = jnp.asarray(
        rng.normal(size=params["model"]["final_ffn"]["fc2"]["kernel"].shape)
        * 0.02, jnp.bfloat16)
    qparams = jax.jit(Q.quantize_rdt_params)(params)

    B, Ll = 1, 64
    lang = jnp.asarray(rng.normal(size=(B, Ll, m.lang_token_dim)), jnp.bfloat16)
    lang_mask = jnp.ones((B, Ll), bool)
    img = jnp.asarray(rng.normal(size=(B, m.img_cond_len, m.img_token_dim)),
                      jnp.bfloat16)
    state128 = jnp.asarray(rng.normal(size=(B, 1, m.state_token_dim)),
                           jnp.bfloat16)
    amask = np.zeros((B, 1, m.output_dim), np.float32)
    amask[:, :, 30:40] = 1.0
    amask = jnp.asarray(amask)
    freqs = jnp.full((B,), 10.0, jnp.float32)

    def chunk_fn(steps, kv_cache="bf16", unroll=1):
        @jax.jit
        def fn(qp, key, s128):
            return Q.rdt_predict_action_quant(
                rcfg, qp, key, lang, lang_mask, img, s128, amask, freqs,
                num_inference_timesteps=steps, kv_cache=kv_cache,
                unroll=unroll)
        return fn

    def measure(fn, reps=REPS, iters=ITERS):
        s = state128
        out = fn(qparams, jax.random.PRNGKey(0), s)
        np.asarray(out)
        lat = []
        for i in range(reps):
            s_in = state128
            t0 = time.perf_counter()
            for j in range(iters):
                out = fn(qparams, jax.random.PRNGKey(i * iters + j), s_in)
                # sequential dependence: feed a slice of the chunk back
                s_in = state128 + out[:, :1, :].astype(jnp.bfloat16) * 1e-6
            np.asarray(out[..., :1])
            lat.append((time.perf_counter() - t0) * 1e3 / iters)
        return float(np.percentile(lat, 50))

    results = {}
    variants = {
        "int8_5step": chunk_fn(5),
        "int8_1step": chunk_fn(1),
        "int8_kvx_5step": chunk_fn(5, kv_cache="int8x"),
        "int8_kvx_1step": chunk_fn(1, kv_cache="int8x"),
        "int8_unroll5": chunk_fn(5, unroll=5),
        "int8_kvx_unroll5": chunk_fn(5, kv_cache="int8x", unroll=5),
    }
    # parity first (cheap, shares compile with the timed run)
    k = jax.random.PRNGKey(123)
    ref = np.asarray(variants["int8_5step"](qparams, k, state128), np.float32)
    for name in ("int8_kvx_5step", "int8_unroll5", "int8_kvx_unroll5"):
        out = np.asarray(variants[name](qparams, k, state128), np.float32)
        results[name + "_corr"] = round(float(
            np.corrcoef(ref.ravel(), out.ravel())[0, 1]), 6)

    for name, fn in variants.items():
        results[name + "_ms"] = round(measure(fn), 2)
        print(json.dumps({name: results[name + "_ms"]}), flush=True)

    t5, t1 = results["int8_5step_ms"], results["int8_1step_ms"]
    results["marginal_ms_per_step"] = round((t5 - t1) / 4.0, 3)
    results["fixed_replan_ms"] = round(t1 - (t5 - t1) / 4.0, 2)
    tx5, tx1 = results["int8_kvx_5step_ms"], results["int8_kvx_1step_ms"]
    results["kvx_marginal_ms_per_step"] = round((tx5 - tx1) / 4.0, 3)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
