"""Round-5 SigLIP serving-tier measurement (VERDICT r4 #1).

The SigLIP encode of the 6-image window is the largest full-tick stage
(39.6 ms, 64% of the cold tick, BENCH_r04) and was bf16-flax-only.  This
measures, on the real chip at the deployment shape (6 x 384^2):

- the flax tower (current bench stage);
- the serving twin in bf16 (head-group-chunked attention — keeps the
  729-token score tiles inside the fusion budget);
- the serving twin int8 w8a8 (block matmuls on the int8 MXU path);
- token-level corr of each vs flax f32-ish bf16 output.

Run: python tools/bench_vit_r5.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 6
ITERS = 6


def main():
    import jax
    import jax.numpy as jnp

    from vla_touch_tpu.models.encoders import vit_serve as VS
    from vla_touch_tpu.models.encoders.vit import SIGLIP_SO400M, SiglipVisionEncoder

    cfg = SIGLIP_SO400M
    S = cfg.image_size
    rng = np.random.default_rng(0)
    enc = SiglipVisionEncoder(cfg, dtype=jnp.bfloat16)
    params = jax.jit(enc.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, S, S, 3), jnp.bfloat16))["params"]
    x = jnp.asarray(rng.normal(size=(6, S, S, 3)) * 0.5, jnp.float32)

    sp_bf16 = jax.jit(lambda p: VS.quantize_vit_params(p, "bf16"))(params)
    sp_int8 = jax.jit(lambda p: VS.quantize_vit_params(p, "int8"))(params)
    sp_mixed = jax.jit(lambda p: VS.quantize_vit_params(
        p, "int8", keep_bf16_last=2))(params)

    @jax.jit
    def flax_fwd(p, x):
        return enc.apply({"params": p}, x.astype(jnp.bfloat16))

    @jax.jit
    def serve_fwd(p, x):
        return VS.vit_encode_serve(cfg, p, x.astype(jnp.bfloat16))

    def measure(fn, p):
        out = fn(p, x)
        np.asarray(out[..., :1])
        lat = []
        for i in range(REPS):
            xi = x
            t0 = time.perf_counter()
            for j in range(ITERS):
                out = fn(p, xi)
                xi = x + out[:1, :1, :1].reshape(1, 1, 1) * 1e-6  # chain
            np.asarray(out[..., :1])
            lat.append((time.perf_counter() - t0) * 1e3 / ITERS)
        return float(np.percentile(lat, 50)), out

    results = {}
    t_flax, ref = measure(flax_fwd, params)
    results["flax_bf16_ms"] = round(t_flax, 2)
    refn = np.asarray(ref, np.float32)
    for name, (fn, p) in {"serve_bf16": (serve_fwd, sp_bf16),
                          "serve_int8": (serve_fwd, sp_int8),
                          "serve_int8_keep2": (serve_fwd, sp_mixed)}.items():
        t, out = measure(fn, p)
        results[name + "_ms"] = round(t, 2)
        c = np.corrcoef(refn.ravel(),
                        np.asarray(out, np.float32).ravel())[0, 1]
        results[name + "_token_corr"] = round(float(c), 6)
        print(json.dumps({name: results[name + "_ms"]}), flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
