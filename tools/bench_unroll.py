"""Does unrolling the denoise solver scan buy anything at RDT-1B?

The 5-step denoise loop re-streams ~1.25 GB (int8 weights + int8x KV
cache) per step; `lax.scan` adds loop overhead and a barrier per step,
while `unroll=5` lets XLA schedule across step boundaries.  The BRIDGeR
SDE scan measured unroll as a wash (ROUND_NOTES r4 — that loop is weight
re-streaming bound); this measures the RDT loop at the serving tier.

Run: python tools/bench_unroll.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/vla_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from vla_touch_tpu.config import NoiseSchedulerConfig, rdt_1b
    from vla_touch_tpu.models.rdt import quant_serve as Q
    from vla_touch_tpu.models.rdt import runner as R

    rng = np.random.default_rng(0)
    rcfg = R.RDTRunnerConfig(model=rdt_1b(), noise=NoiseSchedulerConfig())
    m = rcfg.model
    params = jax.jit(lambda k: R.init_rdt(rcfg, k))(jax.random.PRNGKey(0))
    qparams = jax.jit(lambda p: Q.quantize_rdt_params(p, kv_proj="int8"))(
        params)
    del params

    B, Ll = 1, 64
    lang = jnp.asarray(rng.normal(size=(B, Ll, m.lang_token_dim)),
                       jnp.float32)
    lang_mask = jnp.ones((B, Ll), bool)
    img = jnp.asarray(rng.normal(size=(B, m.img_cond_len, m.img_token_dim)),
                      jnp.float32)
    state = jnp.asarray(rng.normal(size=(B, 1, m.state_token_dim)),
                        jnp.float32)
    amask = jnp.ones((B, 1, m.output_dim), jnp.float32)
    freqs = jnp.full((B,), 10.0, jnp.float32)

    def chunk(unroll):
        @jax.jit
        def fn(qp, key, s):
            return Q.rdt_predict_action_quant(
                rcfg, qp, key, lang, lang_mask, img, s, amask, freqs,
                kv_cache="int8x", unroll=unroll)
        return fn

    def measure(fn, reps=8, iters=8):
        out = fn(qparams, jax.random.PRNGKey(0), state)
        np.asarray(out[..., :1])
        lat = []
        for i in range(reps):
            s_in = state
            t0 = time.perf_counter()
            for j in range(iters):
                out = fn(qparams, jax.random.PRNGKey(i * iters + j), s_in)
                s_in = state + out[0, 0, 0] * 1e-6  # true dependence
            np.asarray(out[..., :1])
            lat.append((time.perf_counter() - t0) * 1e3 / iters)
        return float(np.min(lat))

    results = {}
    # interleaved round-robin so tunnel drift hits both variants equally
    fns = {"unroll1": chunk(1), "unroll5": chunk(5)}
    for name, fn in fns.items():   # warm compile
        fn(qparams, jax.random.PRNGKey(0), state)
    for rnd in range(3):
        for name, fn in fns.items():
            t = measure(fn, reps=3, iters=8)
            results.setdefault(name, []).append(t)
            print(json.dumps({f"{name}_round{rnd}_ms": round(t, 2)}),
                  flush=True)
    print(json.dumps({k: round(min(v), 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
