"""SigLIP t-1 token cache: cached replan path == full path exactly."""

import numpy as np

from vla_touch_tpu.config import NoiseSchedulerConfig, rdt_tiny
from vla_touch_tpu.models.encoders.vit import ViTConfig
from vla_touch_tpu.models.rdt import runner as R
from vla_touch_tpu.runtime import policy as P

import jax
import jax.numpy as jnp

TINY_VIT = ViTConfig(hidden_size=48, num_layers=1, num_heads=4, mlp_dim=96,
                     image_size=28, patch_size=14, use_cls_token=False,
                     use_layerscale=False, gelu_tanh=True)
TINY_RDT = rdt_tiny()


def _cfg():
    return P.PolicyConfig(
        rdt=R.RDTRunnerConfig(model=TINY_RDT, noise=NoiseSchedulerConfig(
            num_inference_timesteps=3)),
        vision=TINY_VIT, image_size=28)


def test_cached_step_equals_full_step(rng):
    cfg = _cfg()
    model = P.create_model(cfg, seed=0, cache_frames=False)
    proprio = jnp.asarray(rng.normal(size=(1, 10)), jnp.float32)
    frames = jnp.asarray(rng.integers(0, 255, (1, 6, 28, 28, 3)), jnp.uint8)
    mask = jnp.asarray([[True, True, False, True, True, False]])
    text = jnp.asarray(rng.normal(size=(1, 4, TINY_RDT.lang_token_dim)),
                       jnp.float32)
    tmask = jnp.ones((1, 4), bool)
    key = jax.random.PRNGKey(7)

    full = P.policy_step(cfg, model.rdt_params, model.vision_params, key,
                         proprio, frames, mask, text, tmask)
    prev_tokens = P.encode_frames(cfg, model.vision_params, frames[:, :3],
                                  mask[:, :3])
    cached, cur = P.policy_step_cached(
        cfg, model.rdt_params, model.vision_params, key, proprio,
        frames[:, 3:], mask[:, 3:], prev_tokens, text, tmask)
    np.testing.assert_allclose(np.asarray(full), np.asarray(cached),
                               rtol=1e-5, atol=1e-6)
    # carried tokens are exactly the t-frame encodings
    direct = P.encode_frames(cfg, model.vision_params, frames[:, 3:],
                             mask[:, 3:])
    np.testing.assert_allclose(np.asarray(cur), np.asarray(direct),
                               rtol=1e-6, atol=1e-7)


def test_wrapper_cache_hit_and_invalidation(rng):
    cfg = _cfg()
    base = P.create_model(cfg, seed=0, cache_frames=False)
    cached_model = P.RoboticDiffusionTransformerModel(
        cfg, base.rdt_params, base.vision_params, cache_frames=True)
    plain_model = P.RoboticDiffusionTransformerModel(
        cfg, base.rdt_params, base.vision_params, cache_frames=False)

    text = rng.normal(size=(4, TINY_RDT.lang_token_dim)).astype(np.float32)
    proprio = rng.normal(size=10)
    f = [rng.integers(0, 255, (28, 28, 3), np.uint8) for _ in range(3)]

    # tick 1: window [f0, f1]; tick 2: window [f1, f2] (shift-by-one) — the
    # cached wrapper must hit its cache on tick 2 and match the plain path.
    w1 = [f[0], None, None, f[1], None, None]
    w2 = [f[1], None, None, f[2], None, None]
    a1c = cached_model.step(proprio, w1, text)
    assert cached_model._token_cache is not None
    digest_before = cached_model._token_cache[0]
    a2c = cached_model.step(proprio, w2, text)

    a1p = plain_model.step(proprio, w1, text)
    a2p = plain_model.step(proprio, w2, text)
    np.testing.assert_allclose(a1c, a1p, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(a2c, a2p, rtol=1e-5, atol=1e-6)
    assert cached_model._token_cache[0] != digest_before

    # Non-contiguous window (random new t-1 frame): digest must miss, and
    # the result must still match the plain path (stale tokens never used).
    g = rng.integers(0, 255, (28, 28, 3), np.uint8)
    w3 = [g, None, None, f[0], None, None]
    a3c = cached_model.step(proprio, w3, text)
    a3p = plain_model.step(proprio, w3, text)
    np.testing.assert_allclose(a3c, a3p, rtol=1e-5, atol=1e-6)

    cached_model.reset()
    assert cached_model._token_cache is None


def test_cached_warm_equals_warm(rng):
    """The combined cached+warm dispatch == policy_step_warm exactly, and
    degenerates to policy_step_cached at skip_steps ~ 0-equivalent prior."""
    cfg = _cfg()
    model = P.create_model(cfg, seed=0, cache_frames=False)
    proprio = jnp.asarray(rng.normal(size=(1, 10)), jnp.float32)
    frames = jnp.asarray(rng.integers(0, 255, (1, 6, 28, 28, 3)), jnp.uint8)
    mask = jnp.ones((1, 6), bool)
    text = jnp.asarray(rng.normal(size=(1, 4, TINY_RDT.lang_token_dim)),
                       jnp.float32)
    tmask = jnp.ones((1, 4), bool)
    prior = jnp.asarray(rng.normal(size=(1, TINY_RDT.horizon, 10)) * 0.1,
                        jnp.float32)
    key = jax.random.PRNGKey(3)

    warm = P.policy_step_warm(cfg, model.rdt_params, model.vision_params,
                              key, proprio, frames, mask, text, tmask,
                              prior, 1)
    prev_tokens = P.encode_frames(cfg, model.vision_params, frames[:, :3],
                                  mask[:, :3])
    combo, cur = P.policy_step_cached_warm(
        cfg, model.rdt_params, model.vision_params, key, proprio,
        frames[:, 3:], mask[:, 3:], prev_tokens, text, tmask, prior, 1)
    np.testing.assert_allclose(np.asarray(warm), np.asarray(combo),
                               rtol=1e-5, atol=1e-6)


def test_wrapper_warm_step(rng):
    """RoboticDiffusionTransformerModel.step(prior_actions=..., skip_steps=)
    routes through the combined dispatch and matches the functional path."""
    cfg = _cfg()
    base = P.create_model(cfg, seed=0, cache_frames=False)
    # the DiT-convention zero-init final layer would make every chunk
    # identically zero; randomize it so cold-vs-warm actually differ
    base.rdt_params["model"]["final_ffn"]["fc2"]["kernel"] = jnp.asarray(
        rng.normal(size=base.rdt_params["model"]["final_ffn"]["fc2"]
                   ["kernel"].shape) * 0.05, jnp.float32)
    model = P.RoboticDiffusionTransformerModel(
        cfg, base.rdt_params, base.vision_params, cache_frames=True)
    imgs = [np.asarray(rng.integers(0, 255, (28, 28, 3)), np.uint8)
            for _ in range(6)]
    proprio = rng.normal(size=(10,)).astype(np.float32)
    text = rng.normal(size=(4, TINY_RDT.lang_token_dim)).astype(np.float32)
    prior = rng.normal(size=(TINY_RDT.horizon, 10)).astype(np.float32) * 0.1

    out_cold = model.step(proprio, imgs, text)
    out_warm = model.step(proprio, imgs, text, prior_actions=prior,
                          skip_steps=1)
    assert out_cold.shape == out_warm.shape == (1, TINY_RDT.horizon, 10)
    assert np.isfinite(out_warm).all()
    # the warm path actually differs from the cold one (it starts from the
    # re-noised prior, not pure noise)
    assert np.abs(out_cold - out_warm).max() > 1e-6


def test_policy_serves_quantized_tree(rng):
    """A quantize_rdt_params tree drops into every policy dispatch (cold,
    cached, warm) and tracks the bf16 policy output."""
    from vla_touch_tpu.models.rdt import quant_serve as Q

    cfg = _cfg()
    model = P.create_model(cfg, seed=0, cache_frames=False)
    model.rdt_params["model"]["final_ffn"]["fc2"]["kernel"] = jnp.asarray(
        rng.normal(size=model.rdt_params["model"]["final_ffn"]["fc2"]
                   ["kernel"].shape) * 0.05, jnp.float32)
    qparams = Q.quantize_rdt_params(model.rdt_params)

    proprio = jnp.asarray(rng.normal(size=(1, 10)), jnp.float32)
    frames = jnp.asarray(rng.integers(0, 255, (1, 6, 28, 28, 3)), jnp.uint8)
    mask = jnp.ones((1, 6), bool)
    text = jnp.asarray(rng.normal(size=(1, 4, TINY_RDT.lang_token_dim)),
                       jnp.float32)
    tmask = jnp.ones((1, 4), bool)
    key = jax.random.PRNGKey(5)

    ref = P.policy_step(cfg, model.rdt_params, model.vision_params, key,
                        proprio, frames, mask, text, tmask)
    got = P.policy_step(cfg, qparams, model.vision_params, key,
                        proprio, frames, mask, text, tmask)
    assert got.shape == ref.shape
    corr = np.corrcoef(np.asarray(ref).ravel(), np.asarray(got).ravel())[0, 1]
    assert corr > 0.99, corr

    prior = jnp.asarray(rng.normal(size=(1, TINY_RDT.horizon, 10)) * 0.1,
                        jnp.float32)
    prev = P.encode_frames(cfg, model.vision_params, frames[:, :3],
                           mask[:, :3])
    combo, _ = P.policy_step_cached_warm(
        cfg, qparams, model.vision_params, key, proprio, frames[:, 3:],
        mask[:, 3:], prev, text, tmask, prior, 1)
    assert np.isfinite(np.asarray(combo)).all()


def test_absent_camera_tokens_match_masked(rng):
    """Static-absent frames (precomputed background tokens spliced in)
    must equal the full 6-image encode with those frames masked out —
    the reference's franka operating point pays full SigLIP cost for the
    padded left wrist (franka_model_eef.py:243-289); we skip it exactly."""
    cfg = _cfg()
    model = P.create_model(cfg, seed=0)
    frames = jnp.asarray(rng.integers(0, 255, (1, 6, 28, 28, 3)), jnp.uint8)
    # left wrist (cam 2) absent in both frame windows -> indices (2, 5)
    mask = jnp.asarray([[True, True, False, True, True, False]])

    full = P.encode_frames(cfg, model.vision_params, frames, mask)
    bg = P.encode_background_tokens(cfg, model.vision_params)
    fast = P.encode_frames(cfg, model.vision_params, frames, mask,
                           absent=(2, 5), bg_tokens=bg)
    np.testing.assert_allclose(np.asarray(full), np.asarray(fast),
                               rtol=1e-5, atol=1e-6)


def test_wrapper_absent_camera_matches_full(rng):
    cfg = _cfg()
    base = P.create_model(cfg, seed=0, cache_frames=False)
    fast = P.RoboticDiffusionTransformerModel(
        cfg, base.rdt_params, base.vision_params, cache_frames=True,
        absent_cameras=(2,))
    plain = P.RoboticDiffusionTransformerModel(
        cfg, base.rdt_params, base.vision_params, cache_frames=True)

    text = rng.normal(size=(4, TINY_RDT.lang_token_dim)).astype(np.float32)
    proprio = rng.normal(size=10)
    f = [rng.integers(0, 255, (28, 28, 3), np.uint8) for _ in range(4)]

    for w in ([f[0], f[1], None, f[2], f[3], None],
              [f[2], f[3], None, f[0], f[1], None]):
        a_fast = fast.step(proprio, w, text)
        a_plain = plain.step(proprio, w, text)
        np.testing.assert_allclose(a_fast, a_plain, rtol=1e-5, atol=1e-6)


def test_policy_kv_cache_int8x_tracks_bf16(rng):
    """kv_cache='int8x' (int8-stored condition cache, XLA-fused dequant in
    the attention reads) flows through every policy dispatch and tracks
    the bf16-cache output on the same quantized tree."""
    from vla_touch_tpu.models.rdt import quant_serve as Q

    cfg = _cfg()
    model = P.create_model(cfg, seed=0, cache_frames=False)
    # the final projection is zero-initialized (DiT-style) — perturb it so
    # the chunk is non-constant and the corr is meaningful
    model.rdt_params["model"]["final_ffn"]["fc2"]["kernel"] = jnp.asarray(
        rng.normal(size=model.rdt_params["model"]["final_ffn"]["fc2"]
                   ["kernel"].shape) * 0.05, jnp.float32)
    qparams = Q.quantize_rdt_params(model.rdt_params)

    proprio = jnp.asarray(rng.normal(size=(1, 10)), jnp.float32)
    frames = jnp.asarray(rng.integers(0, 255, (1, 6, 28, 28, 3)), jnp.uint8)
    mask = jnp.ones((1, 6), bool)
    text = jnp.asarray(rng.normal(size=(1, 4, TINY_RDT.lang_token_dim)),
                       jnp.float32)
    tmask = jnp.ones((1, 4), bool)
    key = jax.random.PRNGKey(5)

    ref = P.policy_step(cfg, qparams, model.vision_params, key,
                        proprio, frames, mask, text, tmask)
    got = P.policy_step(cfg, qparams, model.vision_params, key,
                        proprio, frames, mask, text, tmask,
                        kv_cache="int8x")
    assert got.shape == ref.shape
    corr = np.corrcoef(np.asarray(ref).ravel(), np.asarray(got).ravel())[0, 1]
    assert corr > 0.99, corr

    # steady-state dispatch: cached tokens + warm start + int8x cache
    prior = jnp.asarray(rng.normal(size=(1, TINY_RDT.horizon, 10)) * 0.1,
                        jnp.float32)
    prev = P.encode_frames(cfg, model.vision_params, frames[:, :3],
                           mask[:, :3])
    combo, cur = P.policy_step_cached_warm(
        cfg, qparams, model.vision_params, key, proprio, frames[:, 3:],
        mask[:, 3:], prev, text, tmask, prior, 1, kv_cache="int8x")
    combo_ref, _ = P.policy_step_cached_warm(
        cfg, qparams, model.vision_params, key, proprio, frames[:, 3:],
        mask[:, 3:], prev, text, tmask, prior, 1)
    c2 = np.corrcoef(np.asarray(combo_ref).ravel(),
                     np.asarray(combo).ravel())[0, 1]
    assert np.isfinite(np.asarray(combo)).all()
    assert c2 > 0.99, c2
