"""Multi-robot serving pool: dynamic batching over the one-jit policy step.

Correctness contract: every submitted request's Future resolves to exactly
its row of the equivalent directly-batched ``policy_step`` call (same
padding, same key), regardless of arrival order, ragged text lengths, or
bucket padding."""

import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vla_touch_tpu.config import NoiseSchedulerConfig, rdt_tiny
from vla_touch_tpu.models.encoders.vit import ViTConfig
from vla_touch_tpu.models.rdt import runner as R
from vla_touch_tpu.runtime import policy as P
from vla_touch_tpu.runtime import serving_pool as SP

TINY_VIT = ViTConfig(hidden_size=48, num_layers=1, num_heads=4, mlp_dim=96,
                     image_size=28, patch_size=14, use_cls_token=False,
                     use_layerscale=False, gelu_tanh=True)
TINY_RDT = rdt_tiny()


def _cfg():
    return P.PolicyConfig(
        rdt=R.RDTRunnerConfig(model=TINY_RDT, noise=NoiseSchedulerConfig(
            num_inference_timesteps=3)),
        vision=TINY_VIT, image_size=28)


def _request(rng, L=4):
    return {
        "proprio": rng.normal(size=(10,)).astype(np.float32),
        "images": rng.integers(0, 255, (6, 28, 28, 3)).astype(np.uint8),
        "image_mask": np.ones((6,), bool),
        "text_embeds": rng.normal(
            size=(L, TINY_RDT.lang_token_dim)).astype(np.float32),
        "text_mask": np.ones((L,), bool),
    }


def _recording_step(cfg, model, calls):
    """Batched step that records every dispatched batch and uses a FIXED
    key so the direct-call oracle below sees identical numerics."""
    key = jax.random.PRNGKey(11)

    def step(proprio, images, image_mask, text_embeds, text_mask):
        calls.append(proprio.shape[0])
        return P.policy_step(cfg, model.rdt_params, model.vision_params,
                             key, jnp.asarray(proprio), jnp.asarray(images),
                             jnp.asarray(image_mask),
                             jnp.asarray(text_embeds),
                             jnp.asarray(text_mask))

    return step, key


def test_pool_rows_match_direct_batched_call(rng):
    cfg = _cfg()
    model = P.create_model(cfg, seed=0, cache_frames=False)
    calls = []
    step, key = _recording_step(cfg, model, calls)
    reqs = [_request(rng) for _ in range(3)]

    with SP.PolicyServingPool(step, max_batch=8, max_wait_ms=200,
                              buckets=(1, 2, 4, 8)) as pool:
        futs = [pool.submit(**r) for r in reqs]
        rows = [f.result(timeout=120) for f in futs]

    # 3 requests coalesce into one bucket-4 dispatch (row 0 zero-padded).
    assert calls == [4]
    direct = P.policy_step(
        cfg, model.rdt_params, model.vision_params, key,
        jnp.asarray(np.stack([r["proprio"] for r in reqs]
                             + [np.zeros_like(reqs[0]["proprio"])])),
        jnp.asarray(np.stack([r["images"] for r in reqs]
                             + [np.zeros_like(reqs[0]["images"])])),
        jnp.asarray(np.stack([r["image_mask"] for r in reqs]
                             + [np.zeros_like(reqs[0]["image_mask"])])),
        jnp.asarray(np.stack([r["text_embeds"] for r in reqs]
                             + [np.zeros_like(reqs[0]["text_embeds"])])),
        jnp.asarray(np.stack([r["text_mask"] for r in reqs]
                             + [np.zeros_like(reqs[0]["text_mask"])])))
    for i, row in enumerate(rows):
        np.testing.assert_allclose(row, np.asarray(direct[i]), rtol=1e-5,
                                   atol=1e-6)


def test_pool_pads_ragged_text_lengths(rng):
    cfg = _cfg()
    model = P.create_model(cfg, seed=0, cache_frames=False)
    calls = []
    step, key = _recording_step(cfg, model, calls)
    r_short = _request(rng, L=2)
    r_long = _request(rng, L=5)

    with SP.PolicyServingPool(step, max_batch=2, max_wait_ms=200,
                              buckets=(1, 2)) as pool:
        f1 = pool.submit(**r_short)
        f2 = pool.submit(**r_long)
        a, b = f1.result(timeout=120), f2.result(timeout=120)

    assert calls == [2]
    # Oracle: short row zero-padded to L=5 with mask False on the padding.
    text = np.zeros((2, 5, TINY_RDT.lang_token_dim), np.float32)
    text[0, :2] = r_short["text_embeds"]
    text[1] = r_long["text_embeds"]
    tmask = np.zeros((2, 5), bool)
    tmask[0, :2] = True
    tmask[1] = True
    direct = P.policy_step(
        cfg, model.rdt_params, model.vision_params, key,
        jnp.asarray(np.stack([r_short["proprio"], r_long["proprio"]])),
        jnp.asarray(np.stack([r_short["images"], r_long["images"]])),
        jnp.asarray(np.stack([r_short["image_mask"],
                              r_long["image_mask"]])),
        jnp.asarray(text), jnp.asarray(tmask))
    np.testing.assert_allclose(a, np.asarray(direct[0]), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(b, np.asarray(direct[1]), rtol=1e-5,
                               atol=1e-6)


def test_pool_serves_lone_request_after_timeout(rng):
    cfg = _cfg()
    model = P.create_model(cfg, seed=0, cache_frames=False)
    calls = []
    step, _ = _recording_step(cfg, model, calls)
    with SP.PolicyServingPool(step, max_batch=8, max_wait_ms=5,
                              buckets=(1, 2, 4, 8)) as pool:
        fut = pool.submit(**_request(rng))
        chunk = fut.result(timeout=120)
    assert calls == [1]          # lone request dispatched at bucket 1
    assert chunk.shape == (TINY_RDT.horizon, 10)


def test_pool_concurrent_sessions_deterministic(rng):
    """N robot threads hammering the pool: every request resolves, and the
    from_policy key stream keeps results reproducible across two pools."""
    cfg = _cfg()
    model = P.create_model(cfg, seed=0, cache_frames=False)
    reqs = [_request(rng) for _ in range(6)]

    def run_once():
        out = [None] * len(reqs)
        # max_batch == len(reqs): the dispatcher waits (up to max_wait) for
        # exactly one full batch, so both runs dispatch identically and the
        # seeded key stream makes the rows reproducible.
        pool = SP.from_policy(cfg, model.rdt_params, model.vision_params,
                              seed=3, max_batch=6, max_wait_ms=2000,
                              buckets=(6,))
        with pool:
            futs = [pool.submit(**r) for r in reqs]
            for i, f in enumerate(futs):
                out[i] = f.result(timeout=120)
        return out

    a, b = run_once(), run_once()
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_pool_fixed_text_pad_keeps_one_shape_per_bucket(rng):
    """With ``text_pad_len`` set (as ``from_policy`` does from the model's
    max_lang_cond_len), every dispatched batch has the SAME text shape no
    matter the per-request instruction lengths — one jit compile per
    bucket, ever; and an over-length request fails loudly instead of
    silently growing the shape."""
    shapes = []

    def step(proprio, images, image_mask, text_embeds, text_mask):
        shapes.append(text_embeds.shape)
        return np.zeros((proprio.shape[0], 4, 10), np.float32)

    with SP.PolicyServingPool(step, max_batch=2, max_wait_ms=5,
                              buckets=(1, 2), text_pad_len=8) as pool:
        pool.submit(**_request(rng, L=2)).result(timeout=30)
        pool.submit(**_request(rng, L=5)).result(timeout=30)
        assert [s[1] for s in shapes] == [8, 8]
        with pytest.raises(ValueError, match="exceeds"):
            pool.submit(**_request(rng, L=9)).result(timeout=30)


def test_pool_close_is_idempotent_and_strands_no_future(rng):
    done = threading.Event()

    def step(proprio, *a):
        done.wait(5)
        return np.zeros((proprio.shape[0], 4, 10), np.float32)

    pool = SP.PolicyServingPool(step, max_batch=1, max_wait_ms=1,
                                buckets=(1,))
    fut = pool.submit(**_request(rng))
    done.set()
    fut.result(timeout=30)
    pool.close()
    pool.close()                       # second close is a no-op
    with pytest.raises(RuntimeError):
        pool.submit(**_request(rng))


def test_pool_propagates_errors(rng):
    def bad_step(*a):
        raise RuntimeError("boom")

    with SP.PolicyServingPool(bad_step, max_batch=2, max_wait_ms=5,
                              buckets=(1, 2)) as pool:
        fut = pool.submit(**_request(rng))
        with pytest.raises(RuntimeError, match="boom"):
            fut.result(timeout=30)


def test_pool_rejects_after_close(rng):
    def step(*a):
        raise AssertionError("should not run")

    pool = SP.PolicyServingPool(step, max_batch=2, max_wait_ms=5,
                                buckets=(1, 2))
    pool.close()
    with pytest.raises(RuntimeError):
        pool.submit(**_request(rng))
