"""End-to-end benchmark: p50 action-chunk latency (RDT-1B + BRIDGeR refine).

Runs on the real TPU chip and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}

The measured pipeline is the deployment hot path (SURVEY.md §3.2 + §3.3):
one full RDT-1B action-chunk generation (5-step DPM-Solver++ over the
1.2B-param transformer) followed by one BRIDGeR refinement (10-step
Euler–Maruyama SDE over the triple UNet-1D).  Latency includes the
device→host fetch of the refined chunk (the control loop consumes actions on
host).

Two serving paths are measured — bf16 and the int8 weight-quantized twin
(``models/rdt/quant_serve.py``; the B=1 denoise loop is weight-streaming
bound, so int8 storage cuts ~1.2 GB of HBM reads per step).  The headline is
the faster path that passes the parity gate (refined-chunk correlation
> 0.999 vs bf16); both raw numbers are reported.

``vs_baseline`` is MEASURED÷MEASURED on the same chip: the denominator is
our headline path, the numerator is the reference's serving algorithm
re-implemented faithfully in-repo (``rdt_predict_action_reference_style``,
exactly ``VLA/models/rdt_runner.py:122-165`` semantics — conditions adapted
once, every denoise step re-runs the FULL transformer recomputing all
cross-attention K/V over the 4374-token image condition, no caches, no warm
start, bf16) feeding the same BRIDGeR refine.  Equivalence of the two
algorithms' outputs is pinned by
``test_rdt.py::test_reference_style_serving_matches_cached``.

``vs_a100_estimate`` keeps the cross-hardware context: the reference repo
publishes no numbers (BASELINE.md); RDT-1B reports ~6 Hz chunk inference on
its deployment GPU (≈166 ms) plus the BRIDGeR SDE (10 steps × 2 UNet
forwards, ≈35 ms measured class on A100-class hardware) ≈ 200 ms total.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_A100_MS_ESTIMATE = 200.0


def main():
    import jax
    import jax.numpy as jnp

    from vla_touch_tpu.config import (
        BridgeControllerConfig, NoiseSchedulerConfig, rdt_1b)
    from vla_touch_tpu.models.controllers import bridge as BR
    from vla_touch_tpu.models.rdt import runner as R

    from vla_touch_tpu.models.rdt import quant_serve as Q

    rng = np.random.default_rng(0)
    rcfg = R.RDTRunnerConfig(model=rdt_1b(), noise=NoiseSchedulerConfig())
    m = rcfg.model

    params = jax.jit(lambda k: R.init_rdt(rcfg, k))(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    # The DiT-convention zero-init final layer would make every chunk
    # identically zero; randomize it so the int8-vs-bf16 parity gate below
    # compares real outputs (timing is unaffected — same ops either way).
    params["model"]["final_ffn"]["fc2"]["kernel"] = jnp.asarray(
        rng.normal(size=params["model"]["final_ffn"]["fc2"]["kernel"].shape)
        * 0.02, jnp.bfloat16)
    qparams = Q.quantize_rdt_params(params)

    bcfg = BridgeControllerConfig(inference_dtype="bfloat16")
    bst = BR.init_bridge_controller(bcfg, jax.random.PRNGKey(1))
    stats = {
        "vla_mins": np.zeros(10, np.float32), "vla_maxs": np.ones(10, np.float32),
        "action_mins": np.zeros(10, np.float32),
        "action_maxs": np.ones(10, np.float32),
    }

    B, Ll = 1, 64
    lang = jnp.asarray(rng.normal(size=(B, Ll, m.lang_token_dim)), jnp.bfloat16)
    lang_mask = jnp.ones((B, Ll), bool)
    img = jnp.asarray(rng.normal(size=(B, m.img_cond_len, m.img_token_dim)),
                      jnp.bfloat16)
    state128 = jnp.asarray(rng.normal(size=(B, 1, m.state_token_dim)),
                           jnp.bfloat16)
    amask = np.zeros((B, 1, m.output_dim), np.float32)
    amask[:, :, 30:40] = 1.0  # Franka EEF slots (30..38) + gripper slot 10 elsewhere
    amask = jnp.asarray(amask)
    freqs = jnp.full((B,), 10.0, jnp.float32)

    state10 = jnp.asarray(rng.normal(size=(B, 10)), jnp.float32)
    cam1 = jnp.asarray(rng.normal(size=(B, bcfg.visual_dim)), jnp.float32)
    cam2 = jnp.asarray(rng.normal(size=(B, bcfg.visual_dim)), jnp.float32)
    forces = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)

    # One fused dispatch per control tick: the full RDT denoise + BRIDGeR
    # refine compiled together, with parameters as explicit arguments (an
    # outer jit over closures would capture 2.4GB of bf16 weights as
    # lowering constants).
    @jax.jit
    def pipeline(rdt_params, b_params, ema_shadow, key, state10_in):
        k1, k2 = jax.random.split(key)
        chunk128 = R.rdt_predict_action(rcfg, rdt_params, k1, lang, lang_mask,
                                        img, state128, amask, freqs)
        # Take the 10 Franka dims of the first 16 steps for refinement
        # (the deployment loop refines the executed sub-chunk).
        vla10 = chunk128[:, : bcfg.horizon, 30:40].astype(jnp.float32)
        refined = BR.bridge_predict(bcfg, b_params, ema_shadow, stats,
                                    k2, state10_in, vla10, cam1_feat=cam1,
                                    cam2_feat=cam2, forces=forces)
        return refined

    # Reference-faithful serving algorithm (the measured baseline): no
    # condition-KV cache — every solver step recomputes all cross-attn K/V,
    # exactly rdt_runner.py:122-165.  Same bf16 params, same BRIDGeR refine.
    @jax.jit
    def pipeline_ref_style(rdt_params, b_params, ema_shadow, key, state10_in):
        k1, k2 = jax.random.split(key)
        chunk128 = R.rdt_predict_action_reference_style(
            rcfg, rdt_params, k1, lang, lang_mask, img, state128, amask,
            freqs)
        vla10 = chunk128[:, : bcfg.horizon, 30:40].astype(jnp.float32)
        refined = BR.bridge_predict(bcfg, b_params, ema_shadow, stats,
                                    k2, state10_in, vla10, cam1_feat=cam1,
                                    cam2_feat=cam2, forces=forces)
        return refined

    # int8 serving twin: weight-quantized RDT (models/rdt/quant_serve.py)
    # feeding the same BRIDGeR refine.
    @jax.jit
    def pipeline_q8(qp, b_params, ema_shadow, key, state10_in):
        k1, k2 = jax.random.split(key)
        chunk128 = Q.rdt_predict_action_quant(rcfg, qp, k1, lang, lang_mask,
                                              img, state128, amask, freqs)
        vla10 = chunk128[:, : bcfg.horizon, 30:40].astype(jnp.float32)
        refined = BR.bridge_predict(bcfg, b_params, ema_shadow, stats,
                                    k2, state10_in, vla10, cam1_feat=cam1,
                                    cam2_feat=cam2, forces=forces)
        return refined

    # Steady-state replan: the deployment loop replans every 16 executed
    # ticks, warm-starting the solver from the previous chunk shifted by
    # those ticks (partial denoising, skip 2 of 5 steps).  Chained the same
    # way — each tick consumes the previous refined state AND feeds its own
    # chunk forward as the next prior.
    @jax.jit
    def pipeline_q8_warm(qp, b_params, ema_shadow, key, state10_in, prior128):
        k1, k2 = jax.random.split(key)
        chunk128 = Q.rdt_predict_action_quant(
            rcfg, qp, k1, lang, lang_mask, img, state128, amask, freqs,
            prior_chunk=prior128, skip_steps=2)
        vla10 = chunk128[:, : bcfg.horizon, 30:40].astype(jnp.float32)
        refined = BR.bridge_predict(bcfg, b_params, ema_shadow, stats,
                                    k2, state10_in, vla10, cam1_feat=cam1,
                                    cam2_feat=cam2, forces=forces)
        # shift by the 16 executed ticks and hold the last action — the
        # control loop's prior semantics (runtime/control_loop.py tick());
        # a roll would wrap stale start-of-chunk actions onto the tail
        next_prior = jnp.concatenate(
            [chunk128[:, 16:], jnp.repeat(chunk128[:, -1:], 16, axis=1)],
            axis=1)
        return refined, next_prior

    # The deployment control loop is device-resident (HBM conditioning
    # buffers, scan-compiled samplers); the host only reads tiny action
    # outputs.  The benchmark measures steady-state per-chunk latency by
    # dispatching ITERS sequentially-dependent control ticks asynchronously
    # (each consumes the previous refined state) and fetching once — this
    # keeps the device saturated and amortizes the dev-harness artifact of
    # a ~40-55ms network-tunnel RTT per host round-trip (measured: one
    # trivial jitted op with fetch costs ~56ms through the tunnel).
    def measure(tick, init_carry):
        """``tick(key, carry) -> (refined, carry')`` chained over ITERS
        sequentially-dependent control ticks, single completion fetch."""
        out, _ = tick(jax.random.PRNGKey(0), init_carry)
        np.asarray(out)  # compile + warm
        ITERS = 10
        lat = []
        for i in range(8):
            t0 = time.perf_counter()
            carry = init_carry
            for j in range(ITERS):
                refined, carry = tick(jax.random.PRNGKey(i * ITERS + j),
                                      carry)
            np.asarray(refined)  # single completion fetch
            lat.append((time.perf_counter() - t0) * 1e3 / ITERS)
        return float(np.percentile(lat, 50))

    def cold_tick(fn, rdt_p):
        def tick(key, s):
            refined = fn(rdt_p, bst.params, bst.ema.shadow, key, s)
            return refined, refined[:, 0, :]  # true sequential dependence
        return tick

    p50_bf16 = measure(cold_tick(pipeline, params), state10)
    p50_ref_style = measure(cold_tick(pipeline_ref_style, params), state10)
    p50_q8 = measure(cold_tick(pipeline_q8, qparams), state10)

    def warm_tick(key, carry):
        s, prior = carry
        refined, prior = pipeline_q8_warm(qparams, bst.params,
                                          bst.ema.shadow, key, s, prior)
        return refined, (refined[:, 0, :], prior)

    prior0 = jnp.zeros((B, m.horizon, m.output_dim), jnp.float32)
    p50_q8_warm = measure(warm_tick, (state10, prior0))

    # Serving-parity gate for the int8 path: the refined chunk must stay
    # directionally identical to the bf16 pipeline (the <1e-3 cross-
    # framework parity itself is asserted at f32 in test_golden_parity.py).
    k = jax.random.PRNGKey(123)
    a = np.asarray(pipeline(params, bst.params, bst.ema.shadow, k, state10),
                   np.float32)
    b = np.asarray(pipeline_q8(qparams, bst.params, bst.ema.shadow, k,
                               state10), np.float32)
    corr = float(np.corrcoef(a.ravel(), b.ravel())[0, 1])
    int8_ok = np.isfinite(corr) and corr > 0.999

    p50 = min(p50_bf16, p50_q8) if int8_ok else p50_bf16
    path = ("int8-w8 serving" if (int8_ok and p50_q8 < p50_bf16)
            else "bf16")

    print(json.dumps({
        "metric": "p50 action-chunk latency (RDT-1B 5-step + BRIDGeR "
                  f"10-step refine, b1, {path}, device-resident loop)",
        "value": round(p50, 2),
        "unit": "ms",
        # measured / measured, same chip: the reference's serving algorithm
        # (full per-step KV recompute, no caches) vs our headline path
        "vs_baseline": round(p50_ref_style / p50, 2),
        "reference_style_ms": round(p50_ref_style, 2),
        "vs_a100_estimate": round(REFERENCE_A100_MS_ESTIMATE / p50, 2),
        "bf16_ms": round(p50_bf16, 2),
        "int8_ms": round(p50_q8, 2),
        "int8_chunk_corr_vs_bf16": round(corr, 5),
        # steady-state deployment replan (warm start from the previous
        # chunk, skip 2 of 5 solver steps) — a different operating point,
        # reported alongside the cold-chunk headline
        "int8_warm2_ms": round(p50_q8_warm, 2),
    }))


if __name__ == "__main__":
    main()
