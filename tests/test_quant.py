"""Int8 quantization: op-level error bounds + quantized RDT serving parity."""

import jax
import jax.numpy as jnp
import numpy as np

from vla_touch_tpu.config import NoiseSchedulerConfig, rdt_tiny
from vla_touch_tpu.models.rdt import quant_serve as Q
from vla_touch_tpu.models.rdt import runner as R
from vla_touch_tpu.ops.quant import qdense, quantize_linear, quantize_tree

TINY = rdt_tiny()
RCFG = R.RDTRunnerConfig(model=TINY, noise=NoiseSchedulerConfig(
    num_inference_timesteps=3))


def test_qdense_error_bound(rng):
    w = rng.normal(size=(128, 64)).astype(np.float32) * 0.1
    b = rng.normal(size=(64,)).astype(np.float32) * 0.01
    x = rng.normal(size=(4, 7, 128)).astype(np.float32)
    qp = quantize_linear({"kernel": w, "bias": b})
    assert qp["w_i8"].dtype == jnp.int8
    got = np.asarray(qdense(jnp.asarray(x), qp, out_dtype=jnp.float32))
    want = x @ w + b
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.03, rel


def test_quantize_tree_selectivity():
    params = {
        "a": {"kernel": np.ones((4, 4), np.float32), "bias": np.zeros(4)},
        "t_embedder": {"fc1": {"kernel": np.ones((4, 4), np.float32),
                               "bias": np.zeros(4)}},
        "norm": {"weight": np.ones(4)},
    }
    q = quantize_tree(params, lambda path, leaf: "embedder" not in
                      "/".join(path))
    assert "w_i8" in q["a"]
    assert "kernel" in q["t_embedder"]["fc1"]     # excluded
    assert "weight" in q["norm"]                   # passthrough


def test_quantized_predict_action_close_to_float(rng):
    params = R.init_rdt(RCFG, jax.random.PRNGKey(0))
    # The final layer is zero-initialized (DiT convention), which would make
    # both outputs exactly 0; randomize it so the comparison is meaningful.
    params["model"]["final_ffn"]["fc2"] = {
        "kernel": jnp.asarray(rng.normal(
            size=params["model"]["final_ffn"]["fc2"]["kernel"].shape) * 0.05,
            jnp.float32),
        "bias": params["model"]["final_ffn"]["fc2"]["bias"],
    }
    qparams = Q.quantize_rdt_params(params)

    m = TINY
    B, Ll = 2, 7
    lang = jnp.asarray(rng.normal(size=(B, Ll, m.lang_token_dim)), jnp.float32)
    lang_mask = jnp.ones((B, Ll), bool)
    img = jnp.asarray(rng.normal(size=(B, m.img_cond_len, m.img_token_dim)),
                      jnp.float32)
    state = jnp.asarray(rng.normal(size=(B, 1, m.state_token_dim)), jnp.float32)
    amask = jnp.ones((B, 1, m.output_dim), jnp.float32)
    freqs = jnp.asarray([10.0, 25.0])

    ref = R.rdt_predict_action(RCFG, params, jax.random.PRNGKey(1), lang,
                               lang_mask, img, state, amask, freqs)
    got = Q.rdt_predict_action_quant(RCFG, qparams, jax.random.PRNGKey(1),
                                     lang, lang_mask, img, state, amask, freqs)
    assert got.shape == ref.shape
    ref_n, got_n = np.asarray(ref), np.asarray(got)
    rel = np.abs(got_n - ref_n).max() / max(np.abs(ref_n).max(), 1e-6)
    # int8 through 2 blocks x 3 denoise steps accumulates a few % error —
    # well inside the SDE refiner's stochastic band.
    assert rel < 0.15, rel
    # Correlation stays near-perfect (directionally identical chunks).
    corr = np.corrcoef(ref_n.ravel(), got_n.ravel())[0, 1]
    assert corr > 0.99, corr


def test_kv_projections_stay_bf16(rng):
    """Cross-attn kv projections are excluded from int8 (compute-bound, no
    measured speedup) and must match the float kv path to bf16 precision."""
    params = R.init_rdt(RCFG, jax.random.PRNGKey(1))
    qparams = Q.quantize_rdt_params(params)
    mp = qparams["model"]
    for i in range(TINY.depth):
        kv = mp[f"block{i}"]["cross_attn"]["kv"]
        assert "w_i8" not in kv and kv["kernel"].dtype == jnp.bfloat16
        # everything else in the block is int8
        assert "w_i8" in mp[f"block{i}"]["attn"]["qkv"]
        assert "w_i8" in mp[f"block{i}"]["ffn"]["fc1"]

    m = TINY
    B = 2
    lang_c = jnp.asarray(rng.normal(size=(B, 5, m.hidden_size)), jnp.float32)
    img_c = jnp.asarray(rng.normal(size=(B, m.img_cond_len, m.hidden_size)),
                        jnp.float32)
    got = Q.compute_cond_kv_quant(mp, m, lang_c, img_c)
    assert len(got) == m.depth
    # bf16 kv vs f32 oracle on block 0
    fp = params["model"]["block0"]["cross_attn"]
    c = lang_c + np.asarray(params["model"]["lang_cond_pos_embed"][:, :5])
    kv_f32 = np.asarray(c @ np.asarray(fp["kv"]["kernel"])
                        + np.asarray(fp["kv"]["bias"]))
    hd = m.hidden_size // m.num_heads
    v_f32 = kv_f32.reshape(B, 5, 2, m.num_heads, hd)[:, :, 1]
    np.testing.assert_allclose(np.asarray(got[0][1], np.float32), v_f32,
                               rtol=2e-2, atol=2e-2)


def test_quantized_predict_int8_kv_cache(rng):
    """kv_cache='int8' (Pallas flash over the quantized cache) stays close
    to the bf16-cache quant path: the only new error is KV int8 rounding."""
    from jax.experimental.pallas import tpu as pltpu

    params = R.init_rdt(RCFG, jax.random.PRNGKey(0))
    params["model"]["final_ffn"]["fc2"] = {
        "kernel": jnp.asarray(rng.normal(
            size=params["model"]["final_ffn"]["fc2"]["kernel"].shape) * 0.05,
            jnp.float32),
        "bias": params["model"]["final_ffn"]["fc2"]["bias"],
    }
    qparams = Q.quantize_rdt_params(params)

    m = TINY
    B, Ll = 1, 7
    lang = jnp.asarray(rng.normal(size=(B, Ll, m.lang_token_dim)), jnp.float32)
    lang_mask = jnp.ones((B, Ll), bool)
    img = jnp.asarray(rng.normal(size=(B, m.img_cond_len, m.img_token_dim)),
                      jnp.float32)
    state = jnp.asarray(rng.normal(size=(B, 1, m.state_token_dim)), jnp.float32)
    amask = jnp.ones((B, 1, m.output_dim), jnp.float32)
    freqs = jnp.asarray([10.0])

    ref = Q.rdt_predict_action_quant(RCFG, qparams, jax.random.PRNGKey(1),
                                     lang, lang_mask, img, state, amask,
                                     freqs)
    with pltpu.force_tpu_interpret_mode():
        got = Q.rdt_predict_action_quant(RCFG, qparams, jax.random.PRNGKey(1),
                                         lang, lang_mask, img, state, amask,
                                         freqs, kv_cache="int8")
    ref_n, got_n = np.asarray(ref), np.asarray(got)
    rel = np.abs(got_n - ref_n).max() / max(np.abs(ref_n).max(), 1e-6)
    assert rel < 0.1, rel
    corr = np.corrcoef(ref_n.ravel(), got_n.ravel())[0, 1]
    assert corr > 0.99, corr


def test_quantized_predict_pallas_matmul(rng):
    """matmul='pallas' (fused a8w8 kernel) is numerically identical to the
    XLA int8 path — same quantization scheme, same integers."""
    from jax.experimental.pallas import tpu as pltpu

    from vla_touch_tpu.config import rdt_tiny as _tiny

    # all matmul dims must be multiples of 128 for the kernel
    m = _tiny(hidden_size=128, lang_token_dim=128, img_token_dim=128,
              img_cond_len=16)
    rcfg = R.RDTRunnerConfig(model=m, noise=NoiseSchedulerConfig(
        num_inference_timesteps=2))
    params = R.init_rdt(rcfg, jax.random.PRNGKey(0))
    params["model"]["final_ffn"]["fc2"] = {
        "kernel": jnp.asarray(rng.normal(
            size=params["model"]["final_ffn"]["fc2"]["kernel"].shape) * 0.05,
            jnp.float32),
        "bias": params["model"]["final_ffn"]["fc2"]["bias"],
    }
    qparams = Q.quantize_rdt_params(params)

    B, Ll = 1, 5
    lang = jnp.asarray(rng.normal(size=(B, Ll, m.lang_token_dim)), jnp.float32)
    lang_mask = jnp.ones((B, Ll), bool)
    img = jnp.asarray(rng.normal(size=(B, m.img_cond_len, m.img_token_dim)),
                      jnp.float32)
    state = jnp.asarray(rng.normal(size=(B, 1, m.state_token_dim)), jnp.float32)
    amask = jnp.ones((B, 1, m.output_dim), jnp.float32)
    freqs = jnp.asarray([10.0])

    ref = Q.rdt_predict_action_quant(rcfg, qparams, jax.random.PRNGKey(1),
                                     lang, lang_mask, img, state, amask,
                                     freqs)
    with pltpu.force_tpu_interpret_mode():
        got = Q.rdt_predict_action_quant(rcfg, qparams, jax.random.PRNGKey(1),
                                         lang, lang_mask, img, state, amask,
                                         freqs, matmul="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_quantized_predict_int8t_kv_cache(rng):
    """Transposed int8 KV cache (the layout that truly halves reads at
    head_dim 64) matches the bf16-cache quant path up to KV rounding."""
    from jax.experimental.pallas import tpu as pltpu

    params = R.init_rdt(RCFG, jax.random.PRNGKey(0))
    params["model"]["final_ffn"]["fc2"] = {
        "kernel": jnp.asarray(rng.normal(
            size=params["model"]["final_ffn"]["fc2"]["kernel"].shape) * 0.05,
            jnp.float32),
        "bias": params["model"]["final_ffn"]["fc2"]["bias"],
    }
    qparams = Q.quantize_rdt_params(params)

    m = TINY
    B, Ll = 1, 7
    lang = jnp.asarray(rng.normal(size=(B, Ll, m.lang_token_dim)), jnp.float32)
    lang_mask = jnp.ones((B, Ll), bool)
    img = jnp.asarray(rng.normal(size=(B, m.img_cond_len, m.img_token_dim)),
                      jnp.float32)
    state = jnp.asarray(rng.normal(size=(B, 1, m.state_token_dim)), jnp.float32)
    amask = jnp.ones((B, 1, m.output_dim), jnp.float32)
    freqs = jnp.asarray([10.0])

    ref = Q.rdt_predict_action_quant(RCFG, qparams, jax.random.PRNGKey(1),
                                     lang, lang_mask, img, state, amask,
                                     freqs)
    with pltpu.force_tpu_interpret_mode():
        got = Q.rdt_predict_action_quant(RCFG, qparams, jax.random.PRNGKey(1),
                                         lang, lang_mask, img, state, amask,
                                         freqs, kv_cache="int8t")
    ref_n, got_n = np.asarray(ref), np.asarray(got)
    rel = np.abs(got_n - ref_n).max() / max(np.abs(ref_n).max(), 1e-6)
    assert rel < 0.1, rel
    corr = np.corrcoef(ref_n.ravel(), got_n.ravel())[0, 1]
    assert corr > 0.99, corr


# ---- grouped int4 (w4) ------------------------------------------------------


def test_w4_pack_roundtrip_and_group_size(rng):
    from vla_touch_tpu.ops.quant import (
        pick_group_size, quantize_linear_w4, unpack_w4)

    assert pick_group_size(1152) == 192       # G=6 (128 would leave G=9 odd)
    assert pick_group_size(4608) == 128
    assert pick_group_size(256) == 128
    w = rng.normal(size=(256, 128)).astype(np.float32) * 0.1
    qp = quantize_linear_w4({"kernel": w})
    assert qp["w4_pack"].shape == (128, 128) and qp["w4_pack"].dtype == jnp.int8
    assert qp["scale4"].shape == (2, 128)
    w_i4 = np.asarray(unpack_w4(qp["w4_pack"], 256))
    assert w_i4.min() >= -7 and w_i4.max() <= 7
    # default quantizer runs the MSE clip search: within the clipped range
    # the round-to-nearest bound holds, and the searched scale must not be
    # worse in MSE than the naive group-max scale
    deq = (w_i4.reshape(2, 128, 128)
           * np.asarray(qp["scale4"])[:, None, :]).reshape(256, 128)
    step = np.asarray(qp["scale4"])[:, None, :] \
        .repeat(128, axis=1).reshape(256, 128)
    w_clip = np.clip(w, -7 * step, 7 * step)
    assert np.all(np.abs(deq - w_clip) <= step / 2 + 1e-6)

    qp_max = quantize_linear_w4({"kernel": w}, clip_search=False)
    deq_max = (np.asarray(unpack_w4(qp_max["w4_pack"], 256))
               .reshape(2, 128, 128)
               * np.asarray(qp_max["scale4"])[:, None, :]).reshape(256, 128)
    step_max = np.asarray(qp_max["scale4"])[:, None, :] \
        .repeat(128, axis=1).reshape(256, 128)
    # group-max scaling never clips: the strict half-step bound holds
    assert np.all(np.abs(deq_max - w) <= step_max / 2 + 1e-6)
    assert float(((deq - w) ** 2).mean()) \
        <= float(((deq_max - w) ** 2).mean()) + 1e-12


def test_qdense_w4_error_bound(rng):
    from vla_touch_tpu.ops.quant import qdense_any, quantize_linear_w4

    w = rng.normal(size=(256, 128)).astype(np.float32) * 0.1
    b = rng.normal(size=(128,)).astype(np.float32) * 0.01
    x = rng.normal(size=(4, 7, 256)).astype(np.float32)
    qp = quantize_linear_w4({"kernel": w, "bias": b})
    got = np.asarray(qdense_any(jnp.asarray(x), qp, out_dtype=jnp.float32))
    want = x @ w + b
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    # group-max int4 on Gaussian weights: ~12-13% relative (max≈3sigma over
    # a 128-group, step/sqrt(12) noise) — the documented w4 fidelity trade
    assert rel < 0.2, rel
    assert got.shape == (4, 7, 128)


def test_w4_pallas_kernel_matches_xla(rng):
    """Interpret-mode w4a8 kernel == qdense_w4 given matched bf16 inputs."""
    from vla_touch_tpu.ops.pallas_matmul import qdense_pallas_w4, w4a8_matmul
    from vla_touch_tpu.ops.quant import qdense_w4, quantize_linear_w4

    # (4352, 128, 1) has G=34 groups: covers the ROLLED kernel loop (G>32,
    # the LLM-MLP regime where full unrolling overflowed scoped VMEM).
    for K, N, M in [(1152, 384, 66), (256, 128, 1), (4352, 128, 1)]:
        w = rng.normal(size=(K, N)).astype(np.float32) * 0.05
        b = rng.normal(size=(N,)).astype(np.float32) * 0.01
        x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
        qp = quantize_linear_w4({"kernel": w, "bias": b})
        want = qdense_w4(x, qp, out_dtype=jnp.float32)
        got = w4a8_matmul(x, qp["w4_pack"], qp["scale4"], qp["bias"],
                          out_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        got2 = qdense_pallas_w4(x, qp, out_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_w4_pallas_kernel_differentiable(rng):
    """jax.grad through the w4 kernel path (the QLoRA train-through-
    quantized-base flow) must not crash on pallas_call's missing diff rule
    and must match the XLA path's gradient exactly (custom_vjp backward =
    vjp of qdense_w4)."""
    from vla_touch_tpu.ops.pallas_matmul import qdense_pallas_w4
    from vla_touch_tpu.ops.quant import qdense_w4, quantize_linear_w4

    K, N, M = 256, 128, 3
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.05
    b = rng.normal(size=(N,)).astype(np.float32) * 0.01
    qp = quantize_linear_w4({"kernel": w, "bias": b})
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)

    # Fixed cotangent: the kernel's forward differs from XLA's at the
    # bf16-input cast, so a loss like sum(y^2) would feed each path a
    # slightly different g; a constant weighting isolates the BACKWARD,
    # which must be bit-identical (the custom_vjp bwd IS qdense_w4's vjp).
    c = jnp.asarray(rng.normal(size=(M, N)), jnp.float32)

    def f_pal(xx):
        return jnp.sum(qdense_pallas_w4(xx, qp, out_dtype=jnp.float32,
                                        interpret=True) * c)

    def f_xla(xx):
        return jnp.sum(qdense_w4(xx, qp, out_dtype=jnp.float32) * c)

    g_pal = np.asarray(jax.grad(f_pal)(x))
    g_xla = np.asarray(jax.grad(f_xla)(x))
    np.testing.assert_allclose(g_pal, g_xla, rtol=1e-6, atol=1e-7)


def test_quantize_rdt_params_int4_layout():
    params = R.init_rdt(RCFG, jax.random.PRNGKey(0))
    qparams = Q.quantize_rdt_params(params, weights="int4")
    mp = qparams["model"]
    for i in range(TINY.depth):
        assert "w4_pack" in mp[f"block{i}"]["attn"]["qkv"]
        assert "w4_pack" in mp[f"block{i}"]["ffn"]["fc1"]
        kv = mp[f"block{i}"]["cross_attn"]["kv"]
        assert "w4_pack" not in kv and kv["kernel"].dtype == jnp.bfloat16
    # adaptor input dims (32 / 48) have no valid group size -> int8 fallback
    assert "w_i8" in qparams["lang_adaptor"]["fc0"]
    assert "w_i8" in qparams["img_adaptor"]["fc0"]


def test_quantized_predict_action_int4(rng):
    """The w4 serving path produces directionally-correct chunks (corr gate
    relaxed vs int8 — group-max int4 is the fidelity-for-bytes trade)."""
    params = R.init_rdt(RCFG, jax.random.PRNGKey(0))
    params["model"]["final_ffn"]["fc2"] = {
        "kernel": jnp.asarray(rng.normal(
            size=params["model"]["final_ffn"]["fc2"]["kernel"].shape) * 0.05,
            jnp.float32),
        "bias": params["model"]["final_ffn"]["fc2"]["bias"],
    }
    qparams = Q.quantize_rdt_params(params, weights="int4")

    m = TINY
    B, Ll = 1, 7
    lang = jnp.asarray(rng.normal(size=(B, Ll, m.lang_token_dim)), jnp.float32)
    lang_mask = jnp.ones((B, Ll), bool)
    img = jnp.asarray(rng.normal(size=(B, m.img_cond_len, m.img_token_dim)),
                      jnp.float32)
    state = jnp.asarray(rng.normal(size=(B, 1, m.state_token_dim)),
                        jnp.float32)
    amask = jnp.ones((B, 1, m.output_dim), jnp.float32)
    freqs = jnp.asarray([10.0])

    ref = R.rdt_predict_action(RCFG, params, jax.random.PRNGKey(1), lang,
                               lang_mask, img, state, amask, freqs)
    got = Q.rdt_predict_action_quant(RCFG, qparams, jax.random.PRNGKey(1),
                                     lang, lang_mask, img, state, amask,
                                     freqs)
    ref_n, got_n = np.asarray(ref), np.asarray(got)
    assert np.isfinite(got_n).all()
    corr = np.corrcoef(ref_n.ravel(), got_n.ravel())[0, 1]
    assert corr > 0.9, corr


def test_quantized_predict_action_int4_pallas(rng):
    """matmul='pallas' on an int4 tree routes through the w4a8 nibble kernel
    (interpret mode; kernel-unfriendly dims fall back to XLA) and matches
    the XLA int4 path."""
    from jax.experimental.pallas import tpu as pltpu

    from vla_touch_tpu.config import rdt_tiny as _tiny

    m = _tiny(hidden_size=128, lang_token_dim=128, img_token_dim=128,
              img_cond_len=16)
    RCFG_ = R.RDTRunnerConfig(model=m, noise=NoiseSchedulerConfig(
        num_inference_timesteps=2))
    params = R.init_rdt(RCFG_, jax.random.PRNGKey(0))
    params["model"]["final_ffn"]["fc2"] = {
        "kernel": jnp.asarray(rng.normal(
            size=params["model"]["final_ffn"]["fc2"]["kernel"].shape) * 0.05,
            jnp.float32),
        "bias": params["model"]["final_ffn"]["fc2"]["bias"],
    }
    qparams = Q.quantize_rdt_params(params, weights="int4")

    B, Ll = 1, 7
    lang = jnp.asarray(rng.normal(size=(B, Ll, m.lang_token_dim)), jnp.float32)
    lang_mask = jnp.ones((B, Ll), bool)
    img = jnp.asarray(rng.normal(size=(B, m.img_cond_len, m.img_token_dim)),
                      jnp.float32)
    state = jnp.asarray(rng.normal(size=(B, 1, m.state_token_dim)),
                        jnp.float32)
    amask = jnp.ones((B, 1, m.output_dim), jnp.float32)
    freqs = jnp.asarray([10.0])

    ref = Q.rdt_predict_action_quant(RCFG_, qparams, jax.random.PRNGKey(1),
                                     lang, lang_mask, img, state, amask,
                                     freqs)
    with pltpu.force_tpu_interpret_mode():
        got = Q.rdt_predict_action_quant(RCFG_, qparams, jax.random.PRNGKey(1),
                                         lang, lang_mask, img, state, amask,
                                         freqs, matmul="pallas")
    # same quantization scheme both paths; differences only from bf16
    # activation handling inside the kernel
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)


def test_quantized_warm_replan_matches_float_warm(rng):
    """The int8 warm-start replan tracks the float warm path (same renoise +
    solver-tail semantics; only int8 rounding differs)."""
    params = R.init_rdt(RCFG, jax.random.PRNGKey(0))
    params["model"]["final_ffn"]["fc2"] = {
        "kernel": jnp.asarray(rng.normal(
            size=params["model"]["final_ffn"]["fc2"]["kernel"].shape) * 0.05,
            jnp.float32),
        "bias": params["model"]["final_ffn"]["fc2"]["bias"],
    }
    qparams = Q.quantize_rdt_params(params)

    m = TINY
    B, Ll = 1, 7
    lang = jnp.asarray(rng.normal(size=(B, Ll, m.lang_token_dim)), jnp.float32)
    lang_mask = jnp.ones((B, Ll), bool)
    img = jnp.asarray(rng.normal(size=(B, m.img_cond_len, m.img_token_dim)),
                      jnp.float32)
    state = jnp.asarray(rng.normal(size=(B, 1, m.state_token_dim)),
                        jnp.float32)
    amask = jnp.ones((B, 1, m.output_dim), jnp.float32)
    freqs = jnp.asarray([10.0])
    prior = jnp.asarray(rng.normal(size=(B, m.horizon, m.output_dim)) * 0.3,
                        jnp.float32)

    ref = R.rdt_predict_action(RCFG, params, jax.random.PRNGKey(1), lang,
                               lang_mask, img, state, amask, freqs,
                               prior_chunk=prior, skip_steps=1)
    got = Q.rdt_predict_action_quant(RCFG, qparams, jax.random.PRNGKey(1),
                                     lang, lang_mask, img, state, amask,
                                     freqs, prior_chunk=prior, skip_steps=1)
    ref_n, got_n = np.asarray(ref), np.asarray(got)
    corr = np.corrcoef(ref_n.ravel(), got_n.ravel())[0, 1]
    assert corr > 0.99, corr
    # degenerate skip=0 == the plain quant path exactly
    cold = Q.rdt_predict_action_quant(RCFG, qparams, jax.random.PRNGKey(1),
                                      lang, lang_mask, img, state, amask,
                                      freqs)
    warm0 = Q.rdt_predict_action_quant(RCFG, qparams, jax.random.PRNGKey(1),
                                       lang, lang_mask, img, state, amask,
                                       freqs, prior_chunk=prior,
                                       skip_steps=0)
    np.testing.assert_array_equal(np.asarray(cold), np.asarray(warm0))


def test_kv_proj_int8_option(rng):
    """kv_proj='int8' quantizes the cross-attn kv projections too; the
    chunk stays near the bf16-kv quant path (only KV rounding differs)."""
    params = R.init_rdt(RCFG, jax.random.PRNGKey(0))
    params["model"]["final_ffn"]["fc2"] = {
        "kernel": jnp.asarray(rng.normal(
            size=params["model"]["final_ffn"]["fc2"]["kernel"].shape) * 0.05,
            jnp.float32),
        "bias": params["model"]["final_ffn"]["fc2"]["bias"],
    }
    q_bf = Q.quantize_rdt_params(params)
    q_i8 = Q.quantize_rdt_params(params, kv_proj="int8")
    for i in range(TINY.depth):
        assert "w_i8" in q_i8["model"][f"block{i}"]["cross_attn"]["kv"]
    # int4 weights + int8 kv: kv must be int8, not w4
    q_4 = Q.quantize_rdt_params(params, weights="int4", kv_proj="int8")
    assert "w_i8" in q_4["model"]["block0"]["cross_attn"]["kv"]
    assert "w4_pack" not in q_4["model"]["block0"]["cross_attn"]["kv"]

    m = TINY
    B, Ll = 1, 7
    lang = jnp.asarray(rng.normal(size=(B, Ll, m.lang_token_dim)), jnp.float32)
    lang_mask = jnp.ones((B, Ll), bool)
    img = jnp.asarray(rng.normal(size=(B, m.img_cond_len, m.img_token_dim)),
                      jnp.float32)
    state = jnp.asarray(rng.normal(size=(B, 1, m.state_token_dim)),
                        jnp.float32)
    amask = jnp.ones((B, 1, m.output_dim), jnp.float32)
    freqs = jnp.asarray([10.0])
    a = Q.rdt_predict_action_quant(RCFG, q_bf, jax.random.PRNGKey(1), lang,
                                   lang_mask, img, state, amask, freqs)
    b = Q.rdt_predict_action_quant(RCFG, q_i8, jax.random.PRNGKey(1), lang,
                                   lang_mask, img, state, amask, freqs)
    corr = np.corrcoef(np.asarray(a).ravel(), np.asarray(b).ravel())[0, 1]
    assert corr > 0.995, corr

def test_w4_swiglu_megakernel_matches_unfused(rng):
    """Interpret-mode single-launch SwiGLU MLP == the unfused qdense_w4
    chain (same x-quant and act-quant semantics), over both the unrolled
    (G<=32) and rolled (G>32, group_size=32) down projections."""
    from vla_touch_tpu.ops.pallas_matmul import (
        _w4_swiglu_ref, w4_swiglu_mlp)
    from vla_touch_tpu.ops.quant import quantize_linear_w4

    for K, F, N, gs_down, M in [(256, 512, 256, 128, 1),
                                (256, 2176, 256, 32, 3)]:
        wg = rng.normal(size=(K, F)).astype(np.float32) * 0.05
        wu = rng.normal(size=(K, F)).astype(np.float32) * 0.05
        wd = rng.normal(size=(F, N)).astype(np.float32) * 0.05
        bgu = rng.normal(size=(2 * F,)).astype(np.float32) * 0.01
        gu = quantize_linear_w4(
            {"kernel": np.concatenate([wg, wu], 1), "bias": bgu})
        down = quantize_linear_w4({"kernel": wd}, group_size=gs_down)
        x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
        want = np.asarray(_w4_swiglu_ref(x, gu, down, jnp.float32))
        got = np.asarray(w4_swiglu_mlp(x, gu, down, out_dtype=jnp.float32,
                                       interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_w4_swiglu_dispatcher_and_grad(rng):
    """Large-M calls compose the per-matmul dispatchers; grad through the
    megakernel path equals the XLA composition's grad (custom_vjp)."""
    from vla_touch_tpu.ops.pallas_matmul import (
        _w4_swiglu_ref, qdense_pallas_swiglu)
    from vla_touch_tpu.ops.quant import quantize_linear_w4

    K, F, N = 256, 512, 256
    gu = quantize_linear_w4(
        {"kernel": rng.normal(size=(K, 2 * F)).astype(np.float32) * 0.05})
    down = quantize_linear_w4(
        {"kernel": rng.normal(size=(F, N)).astype(np.float32) * 0.05})

    # large-M path (prompt regime): still numerically the unfused chain
    xm = jnp.asarray(rng.normal(size=(40, K)), jnp.bfloat16)
    got = np.asarray(qdense_pallas_swiglu(xm, gu, down,
                                          out_dtype=jnp.float32,
                                          interpret=True))
    want = np.asarray(_w4_swiglu_ref(xm, gu, down, jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    # gradient contract (decode-regime M)
    x = jnp.asarray(rng.normal(size=(2, K)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(2, N)), jnp.float32)

    def f_pal(xx):
        return jnp.sum(qdense_pallas_swiglu(xx, gu, down,
                                            out_dtype=jnp.float32,
                                            interpret=True) * c)

    def f_xla(xx):
        return jnp.sum(_w4_swiglu_ref(xx, gu, down, jnp.float32) * c)

    g_pal = np.asarray(jax.grad(f_pal)(x))
    g_xla = np.asarray(jax.grad(f_xla)(x))
    np.testing.assert_allclose(g_pal, g_xla, rtol=1e-6, atol=1e-7)


def test_w4_postattn_megakernel_matches_unfused(rng):
    """Interpret-mode post-attention megakernel (o + residual + rmsnorm +
    SwiGLU MLP + residual in one launch) == the unfused op sequence.

    The reference MUST be ``_w4_postattn_ref`` (the kernel's exact dtype
    ladder, with ``_silu_mul``'s f32 logistic): a bf16 ``jax.nn.silu``
    chain differs by one rounding, which the per-token int8 activation
    quant amplifies to a full quant step on ~6%% of elements — the round-3
    deterministic failure on the bench TPU.  Against the exact ladder the
    interpret-mode kernel is bit-identical on CPU and TPU."""
    from vla_touch_tpu.ops.pallas_matmul import (
        _w4_postattn_ref, w4_postattn_fused)
    from vla_touch_tpu.ops.quant import quantize_linear_w4

    ref = _w4_postattn_ref

    Ka, D, F, M = 384, 256, 512, 2
    wo = rng.normal(size=(Ka, D)).astype(np.float32) * 0.05
    wg = rng.normal(size=(D, F)).astype(np.float32) * 0.05
    wu = rng.normal(size=(D, F)).astype(np.float32) * 0.05
    wd = rng.normal(size=(F, D)).astype(np.float32) * 0.05
    o_qp = quantize_linear_w4({"kernel": wo})
    gu_qp = quantize_linear_w4({"kernel": np.concatenate([wg, wu], 1)})
    down_qp = quantize_linear_w4({"kernel": wd})
    nw = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.2 + 1.0)
    x = jnp.asarray(rng.normal(size=(M, 1, D)), jnp.bfloat16)
    att = jnp.asarray(rng.normal(size=(M, 1, Ka)), jnp.bfloat16)

    want = np.asarray(ref(x, att, o_qp, gu_qp, down_qp, nw, 1e-6),
                      np.float32)
    got = np.asarray(w4_postattn_fused(x, att, o_qp, gu_qp, down_qp, nw,
                                       eps=1e-6, interpret=True), np.float32)
    # exact ladder: the only residual risk is a platform reassociating the
    # f32 rmsnorm mean (sub-ulp), which can flip an int8 round() on a
    # knife-edge element — hence a tight-but-not-zero bound
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    # oversize M degrades to the composed fallback: same op sequence, but
    # under jit XLA re-fuses the bf16 rmsnorm chain (verified: identical
    # under jax.disable_jit()), so the bound is one bf16 ulp of the O(4)
    # outputs rather than exact
    xm = jnp.asarray(rng.normal(size=(40, D)), jnp.bfloat16)
    am = jnp.asarray(rng.normal(size=(40, Ka)), jnp.bfloat16)
    got2 = np.asarray(w4_postattn_fused(xm, am, o_qp, gu_qp, down_qp, nw,
                                        eps=1e-6, interpret=True), np.float32)
    want2 = np.asarray(ref(xm, am, o_qp, gu_qp, down_qp, nw, 1e-6),
                       np.float32)
    np.testing.assert_allclose(got2, want2, rtol=3e-2, atol=5e-2)


def test_w4_megakernel_fallbacks_handle_unfriendly_dims(rng):
    """Kernel-unfriendly dims (N not a multiple of 128) must degrade to the
    XLA path through the dispatching entries, not trip the raw kernel's
    layout asserts (review finding, reproduced pre-fix)."""
    from vla_touch_tpu.ops.pallas_matmul import (
        _w4_postattn_ref, _w4_swiglu_ref, w4_postattn_fused, w4_swiglu_mlp)
    from vla_touch_tpu.ops.quant import quantize_linear_w4

    Ka, D, F = 128, 64, 64
    o_qp = quantize_linear_w4(
        {"kernel": rng.normal(size=(Ka, D)).astype(np.float32) * 0.05})
    gu_qp = quantize_linear_w4(
        {"kernel": rng.normal(size=(D, 2 * F)).astype(np.float32) * 0.05})
    down_qp = quantize_linear_w4(
        {"kernel": rng.normal(size=(F, D)).astype(np.float32) * 0.05})
    nw = jnp.ones((D,), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, D)), jnp.bfloat16)
    att = jnp.asarray(rng.normal(size=(2, Ka)), jnp.bfloat16)

    got = np.asarray(w4_swiglu_mlp(x, gu_qp, down_qp,
                                   out_dtype=jnp.float32, interpret=True))
    want = np.asarray(_w4_swiglu_ref(x, gu_qp, down_qp, jnp.float32))
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=5e-2)

    y = w4_postattn_fused(x, att, o_qp, gu_qp, down_qp, nw, eps=1e-6,
                          interpret=True)
    want2 = _w4_postattn_ref(x, att, o_qp, gu_qp, down_qp, nw, 1e-6)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(want2, np.float32),
                               rtol=3e-2, atol=5e-2)


def test_quantized_predict_int8x_kv_cache(rng):
    """kv_cache='int8x' (XLA-dequantized int8 condition cache) matches the
    bf16-cache quant path within KV int8 rounding, and the unrolled solver
    scan is bit-identical to the rolled one."""
    params = R.init_rdt(RCFG, jax.random.PRNGKey(0))
    params["model"]["final_ffn"]["fc2"] = {
        "kernel": jnp.asarray(rng.normal(
            size=params["model"]["final_ffn"]["fc2"]["kernel"].shape) * 0.05,
            jnp.float32),
        "bias": params["model"]["final_ffn"]["fc2"]["bias"],
    }
    qparams = Q.quantize_rdt_params(params)

    m = TINY
    B, Ll = 1, 7
    lang = jnp.asarray(rng.normal(size=(B, Ll, m.lang_token_dim)), jnp.float32)
    lang_mask = jnp.ones((B, Ll), bool)
    img = jnp.asarray(rng.normal(size=(B, m.img_cond_len, m.img_token_dim)),
                      jnp.float32)
    state = jnp.asarray(rng.normal(size=(B, 1, m.state_token_dim)), jnp.float32)
    amask = jnp.ones((B, 1, m.output_dim), jnp.float32)
    freqs = jnp.asarray([10.0])
    args = (lang, lang_mask, img, state, amask, freqs)

    ref = np.asarray(Q.rdt_predict_action_quant(
        RCFG, qparams, jax.random.PRNGKey(1), *args))
    got = np.asarray(Q.rdt_predict_action_quant(
        RCFG, qparams, jax.random.PRNGKey(1), *args, kv_cache="int8x"))
    rel = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert rel < 0.1, rel
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr > 0.99, corr

    unrolled = np.asarray(Q.rdt_predict_action_quant(
        RCFG, qparams, jax.random.PRNGKey(1), *args, kv_cache="int8x",
        unroll=8))
    np.testing.assert_array_equal(unrolled, got)
