"""End-to-end benchmark: p50 action-chunk latency (RDT-1B + BRIDGeR refine).

Runs on the real TPU chip and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N, ...}

The measured pipeline is the deployment hot path (SURVEY.md §3.2 + §3.3):
one full RDT-1B action-chunk generation (5-step DPM-Solver++ over the
1.2B-param transformer) followed by one BRIDGeR refinement (10-step
Euler–Maruyama SDE over the triple UNet-1D).  Latency includes the
device→host fetch of the refined chunk (the control loop consumes actions
on host).

Serving tiers (each behind the same parity gate — refined-chunk
correlation > 0.999 vs the bf16 pipeline; the headline is the fastest
tier that PASSES):
  bf16      — full-precision cached-KV serving;
  int8      — per-channel int8 weights (quant_serve.py), XLA int8 matmuls;
  int8+kv8  — plus int8 cross-attn KV projections (cuts ~2 ms off the
              one-time cond-KV build at ~1% KV error);
  int4      — grouped int4 weights (MSE clip search) through the
              nibble-streaming Pallas kernel.  MEASURED NEGATIVE on
              parity: 4-bit uniform quantization of Gaussian-class
              weights has an ~11% per-matmul error floor that lands the
              chunk at corr ≈ 0.990 (tools/bench_rdt_tiers.py sweep:
              all-w4 0.9899, ffn-only w4 0.9975, half-the-blocks-ffn
              0.9989 — every mix < 0.999), so it is reported but expected
              to fail the gate; the parity floor of this denoise loop is
              int8.

Beyond the chunk latency, the driver JSON carries the FULL CONTROL TICK
(VERDICT r3 #3) — SigLIP-encoding the 6 camera frames + RDT chunk +
BRIDGeR refine, exactly the reference hot path
``/root/reference/VLA/scripts/franka_model_eef.py:224-313`` — cold and in
the steady-state replan operating point (t-1 SigLIP token cache + solver
warm start, runtime/policy.py::policy_step_cached_warm), plus a per-stage
breakdown and roofline utilizations (the B=1 denoise loop is
weight-streaming bound; the cond-KV build is MXU-bound).

``vs_baseline`` is MEASURED÷MEASURED on the same chip: the denominator is
our headline path, the numerator is the reference's serving algorithm
re-implemented faithfully in-repo (``rdt_predict_action_reference_style``,
exactly ``VLA/models/rdt_runner.py:122-165`` semantics — conditions
adapted once, every denoise step re-runs the FULL transformer recomputing
all cross-attention K/V over the 4374-token image condition, no caches, no
warm start, bf16) feeding the same BRIDGeR refine.  Equivalence of the two
algorithms' outputs is pinned by
``test_rdt.py::test_reference_style_serving_matches_cached``.

``vs_a100_estimate`` keeps the cross-hardware context: the reference repo
publishes no numbers (BASELINE.md); RDT-1B reports ~6 Hz chunk inference
on its deployment GPU (≈166 ms) plus the BRIDGeR SDE (10 steps × 2 UNet
forwards, ≈35 ms measured class on A100-class hardware) ≈ 200 ms total.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REFERENCE_A100_MS_ESTIMATE = 200.0
V5E_HBM_GBPS = 819.0           # v5e HBM bandwidth (roofline denominator)
V5E_BF16_TFLOPS = 197.0        # v5e MXU bf16 peak

# Self-check knobs (the driver runs the defaults): VLA_BENCH_CONFIG=tiny
# exercises every pipeline/stage at toy scale on CPU in ~2 min.
_CONFIG = os.environ.get("VLA_BENCH_CONFIG", "1b")
_REPS = int(os.environ.get("VLA_BENCH_REPS", "8"))
_ITERS = int(os.environ.get("VLA_BENCH_ITERS", "10"))


def main():
    import jax
    import jax.numpy as jnp

    from vla_touch_tpu.config import (
        BridgeControllerConfig, NoiseSchedulerConfig, rdt_1b, rdt_tiny)
    from vla_touch_tpu.models.controllers import bridge as BR
    from vla_touch_tpu.models.rdt import quant_serve as Q
    from vla_touch_tpu.models.rdt import runner as R

    rng = np.random.default_rng(0)
    mk = rdt_tiny if _CONFIG == "tiny" else rdt_1b
    rcfg = R.RDTRunnerConfig(model=mk(), noise=NoiseSchedulerConfig())
    m = rcfg.model

    params = jax.jit(lambda k: R.init_rdt(rcfg, k))(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    # The DiT-convention zero-init final layer would make every chunk
    # identically zero; randomize it so the parity gates below compare real
    # outputs (timing is unaffected — same ops either way).
    params["model"]["final_ffn"]["fc2"]["kernel"] = jnp.asarray(
        rng.normal(size=params["model"]["final_ffn"]["fc2"]["kernel"].shape)
        * 0.02, jnp.bfloat16)
    qparams = jax.jit(Q.quantize_rdt_params)(params)
    qparams_kv8 = jax.jit(
        lambda p: Q.quantize_rdt_params(p, kv_proj="int8"))(params)
    qparams_w4 = jax.jit(
        lambda p: Q.quantize_rdt_params(p, weights="int4"))(params)

    bcfg = BridgeControllerConfig(inference_dtype="bfloat16",
                                  horizon=min(16, m.horizon))
    bst = BR.init_bridge_controller(bcfg, jax.random.PRNGKey(1))
    stats = {
        "vla_mins": np.zeros(10, np.float32), "vla_maxs": np.ones(10, np.float32),
        "action_mins": np.zeros(10, np.float32),
        "action_maxs": np.ones(10, np.float32),
    }

    B, Ll = 1, min(64, m.max_lang_cond_len)
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
    def make_pipeline(chunk_fn):
        @jax.jit
        def pipeline(rdt_p, b_params, ema_shadow, key, state10_in):
            k1, k2 = jax.random.split(key)
            chunk128 = chunk_fn(rdt_p, k1)
            # Take the 10 Franka dims of the first 16 steps for refinement
            # (the deployment loop refines the executed sub-chunk).
            vla10 = chunk128[:, : bcfg.horizon, 30:40].astype(jnp.float32)
            return BR.bridge_predict(bcfg, b_params, ema_shadow, stats,
                                     k2, state10_in, vla10, cam1_feat=cam1,
                                     cam2_feat=cam2, forces=forces)
        return pipeline

    pipeline = make_pipeline(lambda p, k: R.rdt_predict_action(
        rcfg, p, k, lang, lang_mask, img, state128, amask, freqs))
    # Reference-faithful serving algorithm (the measured baseline): no
    # condition-KV cache — every solver step recomputes all cross-attn K/V,
    # exactly rdt_runner.py:122-165.  Same bf16 params, same BRIDGeR refine.
    pipeline_ref_style = make_pipeline(
        lambda p, k: R.rdt_predict_action_reference_style(
            rcfg, p, k, lang, lang_mask, img, state128, amask, freqs))
    pipeline_q8 = make_pipeline(lambda p, k: Q.rdt_predict_action_quant(
        rcfg, p, k, lang, lang_mask, img, state128, amask, freqs))
    pipeline_w4 = make_pipeline(lambda p, k: Q.rdt_predict_action_quant(
        rcfg, p, k, lang, lang_mask, img, state128, amask, freqs,
        matmul="pallas"))

    # Steady-state replan: the deployment loop replans every 16 executed
    # ticks, warm-starting the solver from the previous chunk shifted by
    # those ticks (partial denoising, skip 2 of 5 steps).  Chained the same
    # way — each tick consumes the previous refined state AND feeds its own
    # chunk forward as the next prior.
    SHIFT = 16 if m.horizon >= 32 else max(m.horizon // 2, 1)

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
            [chunk128[:, SHIFT:],
             jnp.repeat(chunk128[:, -1:], SHIFT, axis=1)], axis=1)
        return refined, next_prior

    # The deployment control loop is device-resident (HBM conditioning
    # buffers, scan-compiled samplers); the host only reads tiny action
    # outputs.  The benchmark measures steady-state per-chunk latency by
    # dispatching ITERS sequentially-dependent control ticks asynchronously
    # (each consumes the previous refined state) and fetching once — this
    # keeps the device saturated and amortizes the dev-harness artifact of
    # a ~40-55ms network-tunnel RTT per host round-trip (measured: one
    # trivial jitted op with fetch costs ~56ms through the tunnel).
    def measure(tick, init_carry, reps=_REPS, iters=_ITERS):
        """``tick(key, carry) -> (refined, carry')`` chained over ``iters``
        sequentially-dependent control ticks, single completion fetch."""
        out, _ = tick(jax.random.PRNGKey(0), init_carry)
        np.asarray(out)  # compile + warm
        lat = []
        for i in range(reps):
            t0 = time.perf_counter()
            carry = init_carry
            for j in range(iters):
                refined, carry = tick(jax.random.PRNGKey(i * iters + j),
                                      carry)
            np.asarray(refined)  # single completion fetch
            lat.append((time.perf_counter() - t0) * 1e3 / iters)
        return float(np.percentile(lat, 50))

    def cold_tick(fn, rdt_p):
        def tick(key, s):
            refined = fn(rdt_p, bst.params, bst.ema.shadow, key, s)
            return refined, refined[:, 0, :]  # true sequential dependence
        return tick

    p50_bf16 = measure(cold_tick(pipeline, params), state10)
    p50_ref_style = measure(cold_tick(pipeline_ref_style, params), state10)
    p50_q8 = measure(cold_tick(pipeline_q8, qparams), state10)
    p50_kv8 = measure(cold_tick(pipeline_q8, qparams_kv8), state10)
    p50_w4 = measure(cold_tick(pipeline_w4, qparams_w4), state10)

    def warm_tick(key, carry):
        s, prior = carry
        refined, prior = pipeline_q8_warm(qparams, bst.params,
                                          bst.ema.shadow, key, s, prior)
        return refined, (refined[:, 0, :], prior)

    prior0 = jnp.zeros((B, m.horizon, m.output_dim), jnp.float32)
    p50_q8_warm = measure(warm_tick, (state10, prior0))

    # Serving-parity gates: each quantized tier's refined chunk must stay
    # directionally identical to the bf16 pipeline (the <1e-3 cross-
    # framework parity itself is asserted at f32 in test_golden_parity.py).
    k = jax.random.PRNGKey(123)
    ref_out = np.asarray(pipeline(params, bst.params, bst.ema.shadow, k,
                                  state10), np.float32)

    def gate(fn, qp):
        out = np.asarray(fn(qp, bst.params, bst.ema.shadow, k, state10),
                         np.float32)
        c = float(np.corrcoef(ref_out.ravel(), out.ravel())[0, 1])
        return c, bool(np.isfinite(c) and c > 0.999)

    corr_q8, ok_q8 = gate(pipeline_q8, qparams)
    corr_kv8, ok_kv8 = gate(pipeline_q8, qparams_kv8)
    corr_w4, ok_w4 = gate(pipeline_w4, qparams_w4)

    tiers = [(p50_bf16, "bf16", True), (p50_q8, "int8-w8 serving", ok_q8),
             (p50_kv8, "int8-w8+kv8 serving", ok_kv8),
             (p50_w4, "int4-w4 pallas serving", ok_w4)]
    p50, path = min((p, n) for p, n, ok in tiers if ok)

    # ---- full control tick (reference hot path franka_model_eef.py:224-313:
    # SigLIP on the 6 camera frames + chunk + refine), cold and steady-state
    # (t-1 SigLIP token cache + solver warm start) -------------------------
    from vla_touch_tpu.runtime import policy as P

    if _CONFIG == "tiny":
        from vla_touch_tpu.models.encoders.vit import ViTConfig
        vis_cfg = ViTConfig(hidden_size=m.img_token_dim, num_layers=1,
                            num_heads=4, mlp_dim=64, image_size=28,
                            patch_size=14, use_cls_token=False,
                            use_layerscale=False, gelu_tanh=True)
        pcfg = P.PolicyConfig(rdt=rcfg, vision=vis_cfg, image_size=28)
    else:
        pcfg = P.PolicyConfig(rdt=rcfg)
    S = pcfg.image_size
    vparams = jax.jit(
        lambda k: P.SiglipVisionEncoder(pcfg.vision, dtype=jnp.bfloat16).init(
            k, jnp.zeros((1, S, S, 3), jnp.bfloat16))["params"]
    )(jax.random.PRNGKey(2))
    frames6 = jnp.asarray(rng.integers(0, 256, (B, 6, S, S, 3)),
                          jnp.uint8)
    fmask6 = jnp.ones((B, 6), bool)
    proprio = jnp.asarray(rng.normal(size=(B, 10)), jnp.float32)

    @jax.jit
    def full_tick_cold(qp, vp, b_params, ema_shadow, key, s):
        k1, k2 = jax.random.split(key)
        actions = P.policy_step(pcfg, qp, vp, k1, proprio, frames6, fmask6,
                                lang, lang_mask)
        vla10 = actions[:, : bcfg.horizon].astype(jnp.float32)
        return BR.bridge_predict(bcfg, b_params, ema_shadow, stats, k2, s,
                                 vla10, cam1_feat=cam1, cam2_feat=cam2,
                                 forces=forces)

    @jax.jit
    def full_tick_warm(qp, vp, b_params, ema_shadow, key, s, prev_tokens,
                       prior_actions):
        k1, k2 = jax.random.split(key)
        actions, cur = P.policy_step_cached_warm(
            pcfg, qp, vp, k1, proprio, frames6[:, 3:], fmask6[:, 3:],
            prev_tokens, lang, lang_mask, prior_actions, 2)
        vla10 = actions[:, : bcfg.horizon].astype(jnp.float32)
        refined = BR.bridge_predict(bcfg, b_params, ema_shadow, stats, k2,
                                    s, vla10, cam1_feat=cam1,
                                    cam2_feat=cam2, forces=forces)
        next_prior = jnp.concatenate(
            [actions[:, SHIFT:], jnp.repeat(actions[:, -1:], SHIFT, axis=1)],
            axis=1)
        return refined, cur, next_prior

    def cold_full(key, s):
        refined = full_tick_cold(qparams, vparams, bst.params,
                                 bst.ema.shadow, key, s)
        return refined, refined[:, 0, :]

    tokens0 = P.encode_frames(pcfg, vparams, frames6[:, 3:], fmask6[:, 3:])
    prior_a0 = jnp.zeros((B, m.horizon, 10), jnp.float32)

    def warm_full(key, carry):
        s, tok, prior = carry
        refined, tok, prior = full_tick_warm(
            qparams, vparams, bst.params, bst.ema.shadow, key, s, tok, prior)
        return refined, (refined[:, 0, :], tok, prior)

    p50_full_cold = measure(cold_full, state10, reps=5)
    p50_full_warm = measure(warm_full, (state10, tokens0, prior_a0), reps=5)

    # ---- franka operating point: the left-wrist camera is ALWAYS the
    # padded background (unified_vla_dataset_episode.py:354-363) and the
    # reference still SigLIP-encodes it every step
    # (franka_model_eef.py:243-289).  The static-absent path splices
    # precomputed background tokens instead — 4 images encoded, not 6
    # (exactness pinned by tests/test_policy_cache.py). -------------------
    fmask6_fr = np.ones((B, 6), bool)
    fmask6_fr[:, [2, 5]] = False
    fmask6_fr = jnp.asarray(fmask6_fr)
    bg_tok = P.encode_background_tokens(pcfg, vparams)

    @jax.jit
    def full_tick_cold_franka(qp, vp, b_params, ema_shadow, key, s):
        k1, k2 = jax.random.split(key)
        actions = P.policy_step(pcfg, qp, vp, k1, proprio, frames6,
                                fmask6_fr, lang, lang_mask,
                                absent=(2, 5), bg_tokens=bg_tok)
        vla10 = actions[:, : bcfg.horizon].astype(jnp.float32)
        return BR.bridge_predict(bcfg, b_params, ema_shadow, stats, k2, s,
                                 vla10, cam1_feat=cam1, cam2_feat=cam2,
                                 forces=forces)

    @jax.jit
    def full_tick_warm_franka(qp, vp, b_params, ema_shadow, key, s,
                              prev_tokens, prior_actions):
        k1, k2 = jax.random.split(key)
        actions, cur = P.policy_step_cached_warm(
            pcfg, qp, vp, k1, proprio, frames6[:, 3:], fmask6_fr[:, 3:],
            prev_tokens, lang, lang_mask, prior_actions, 2,
            absent=(2,), bg_tokens=bg_tok)
        vla10 = actions[:, : bcfg.horizon].astype(jnp.float32)
        refined = BR.bridge_predict(bcfg, b_params, ema_shadow, stats, k2,
                                    s, vla10, cam1_feat=cam1,
                                    cam2_feat=cam2, forces=forces)
        next_prior = jnp.concatenate(
            [actions[:, SHIFT:], jnp.repeat(actions[:, -1:], SHIFT, axis=1)],
            axis=1)
        return refined, cur, next_prior

    def cold_full_franka(key, s):
        refined = full_tick_cold_franka(qparams, vparams, bst.params,
                                        bst.ema.shadow, key, s)
        return refined, refined[:, 0, :]

    tokens0_fr = P.encode_frames(pcfg, vparams, frames6[:, 3:],
                                 fmask6_fr[:, 3:], absent=(2,),
                                 bg_tokens=bg_tok)

    def warm_full_franka(key, carry):
        s, tok, prior = carry
        refined, tok, prior = full_tick_warm_franka(
            qparams, vparams, bst.params, bst.ema.shadow, key, s, tok,
            prior)
        return refined, (refined[:, 0, :], tok, prior)

    p50_full_cold_fr = measure(cold_full_franka, state10, reps=5)
    p50_full_warm_fr = measure(warm_full_franka,
                               (state10, tokens0_fr, prior_a0), reps=5)

    # ---- per-stage breakdown + roofline ----------------------------------
    @jax.jit
    def stage_siglip(vp, key):
        return P.encode_frames(pcfg, vp, frames6, fmask6)

    @jax.jit
    def stage_cond(qp, key):
        from vla_touch_tpu.ops.quant import qdense_any
        lang_c = Q._adaptor(qp["lang_adaptor"], lang, qd=qdense_any)
        img_c = Q._adaptor(qp["img_adaptor"], img, qd=qdense_any)
        kv = Q.compute_cond_kv_quant(qp["model"], m, lang_c, img_c)
        return kv[0][0]

    @jax.jit
    def stage_bridge(b_params, ema_shadow, key, s):
        vla10 = jnp.zeros((B, bcfg.horizon, 10), jnp.float32)
        return BR.bridge_predict(bcfg, b_params, ema_shadow, stats, key, s,
                                 vla10, cam1_feat=cam1, cam2_feat=cam2,
                                 forces=forces)

    def measure_stage(fn, *args, reps=6, iters=8):
        out = fn(*args)
        jax.tree.leaves(out)[0].block_until_ready()
        np.asarray(jax.tree.leaves(out)[0][..., :1])
        lat = []
        for i in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            np.asarray(jax.tree.leaves(out)[0][..., :1])
            lat.append((time.perf_counter() - t0) * 1e3 / iters)
        return float(np.percentile(lat, 50))

    ms_siglip = measure_stage(stage_siglip, vparams, jax.random.PRNGKey(0))
    ms_cond = measure_stage(stage_cond, qparams, jax.random.PRNGKey(0))
    ms_bridge = measure_stage(stage_bridge, bst.params, bst.ema.shadow,
                              jax.random.PRNGKey(0), state10)
    # denoise = chunk pipeline minus cond build minus refine (the three run
    # in one fused dispatch in the pipelines; this decomposition is the
    # per-stage attribution, not a re-measurement of the headline)
    ms_denoise = max(p50_q8 - ms_cond - ms_bridge, 0.0)

    # Roofline: the denoise loop re-reads every transformer weight each
    # solver step (weight-streaming bound).  Bytes = the int8 tree minus
    # the per-chunk-only leaves (cross-attn kv projections, lang/img
    # adaptors).
    def streamed_bytes(tree):
        total = 0
        skip_roots = {"lang_adaptor", "img_adaptor"}

        def walk(node, path):
            nonlocal total
            if hasattr(node, "nbytes"):
                if path[0] in skip_roots or "kv" in path:
                    return
                total += node.nbytes
                return
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(v, path + (k,))
        walk(tree, ())
        return total

    sb = streamed_bytes(qparams)
    per_step_ms = ms_denoise / 5.0
    hbm_util = (sb / (per_step_ms / 1e3) / 1e9) / V5E_HBM_GBPS \
        if per_step_ms > 0 else float("nan")
    # cond-KV build is MXU-bound: FLOPs = kv projections over the 4374-token
    # image condition (14 blocks) + 64-token lang (14) + the two adaptors.
    D = m.hidden_size
    Li = m.img_cond_len
    nb = m.depth // 2                            # blocks per condition
    fl = 0
    fl += nb * 2 * Li * D * (2 * D)              # img kv projs
    fl += nb * 2 * Ll * D * (2 * D)              # lang kv projs
    fl += 2 * Li * (m.img_token_dim * D + D * D)  # img adaptor mlp2x
    fl += 2 * Ll * (m.lang_token_dim * D + D * D)
    mxu_util = (fl / (ms_cond / 1e3) / 1e12) / V5E_BF16_TFLOPS

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
        "int8_chunk_corr_vs_bf16": round(corr_q8, 5),
        "int8_kv8_ms": round(p50_kv8, 2),
        "int8_kv8_corr_vs_bf16": round(corr_kv8, 5),
        # int4 is the measured-negative tier: fastest weight streaming but
        # below the parity gate (see module docstring) — reported, not
        # eligible for the headline unless corr > 0.999
        "int4_pallas_ms": round(p50_w4, 2),
        "int4_chunk_corr_vs_bf16": round(corr_w4, 5),
        # steady-state deployment replan (warm start from the previous
        # chunk, skip 2 of 5 solver steps) — a different operating point,
        # reported alongside the cold-chunk headline
        "int8_warm2_ms": round(p50_q8_warm, 2),
        # FULL control tick = SigLIP(6 imgs) + RDT chunk + BRIDGeR refine
        # (reference step() hot path); warm = t-1 SigLIP cache (3 new
        # frames) + solver warm start, the deployment steady state
        "full_tick_ms": round(p50_full_cold, 2),
        "full_tick_warm_ms": round(p50_full_warm, 2),
        # the franka deployment operating point: left wrist statically
        # absent -> SigLIP encodes 4 (cold) / 2 (warm) images, background
        # tokens spliced in exactly
        "full_tick_franka_ms": round(p50_full_cold_fr, 2),
        "full_tick_franka_warm_ms": round(p50_full_warm_fr, 2),
        "stage_ms": {"siglip_6img": round(ms_siglip, 2),
                     "rdt_cond_kv": round(ms_cond, 2),
                     "rdt_denoise_5step": round(ms_denoise, 2),
                     "bridge_refine": round(ms_bridge, 2)},
        "denoise_weight_stream_gb_per_step": round(sb / 1e9, 3),
        "denoise_hbm_utilization": round(hbm_util, 3),
        "cond_kv_mxu_utilization": round(mxu_util, 3),
    }))


if __name__ == "__main__":
    main()
