"""Stochastic-interpolants math vs an independent numpy transcription of the
documented reference equations (bridge_model.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vla_touch_tpu.config import InterpolantConfig
from vla_touch_tpu.models.controllers import interpolants as SI

CFG = InterpolantConfig()  # canonical: linear, 2^0.5*t(t-1), 1-t, vs, d=0.03


def test_schedule_functions():
    t = jnp.linspace(0.01, 0.99, 50)
    tn = np.asarray(t)
    np.testing.assert_allclose(np.asarray(SI.epsilon(CFG, t)), 1 - tn, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(SI.gamma(CFG, t)), 1.4142 * tn * (1 - tn), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(SI.gamma_der(CFG, t)), 1.4142 * (1 - 2 * tn), atol=1e-6
    )
    ref_inv = np.clip(1 / (1.4142 * tn * (1 - tn) + 1e-4), 0, 200.0)
    np.testing.assert_allclose(np.asarray(SI.gamma_inv(CFG, t)), ref_inv, rtol=1e-5)


def test_all_interpolant_families_weights_sum_sane():
    t = jnp.linspace(0.001, 0.999, 41)
    for it in ["linear", "reverse_power3", "reverse_power4", "power3",
               "power4", "reverse_linear"]:
        cfg = dataclasses.replace(CFG, interpolant_type=it)
        w0, w1 = SI.interpolant_weights(cfg, t)
        w0, w1 = np.asarray(w0), np.asarray(w1)
        # Endpoints: all these families start at x0 and end at x1.
        assert abs(w0[0] - 1) < 0.01 and abs(w1[0]) < 0.01, it
        assert abs(w0[-1]) < 0.05 and abs(w1[-1] - 1) < 0.05, it


def test_q_sample_zero_noise_is_pure_interpolation(rng):
    cfg = dataclasses.replace(CFG, beta_max=0.0)
    x0 = jnp.asarray(rng.normal(size=(4, 8, 10)), jnp.float32)
    x1 = jnp.asarray(rng.normal(size=(4, 8, 10)), jnp.float32)
    t = jnp.asarray([0.2, 0.5, 0.8, 0.95], jnp.float32)
    xt, z = SI.q_sample(cfg, jax.random.PRNGKey(0), t, x0, x1)
    tn = np.asarray(t)[:, None, None]
    ref = (1 - tn) * np.asarray(x0) + tn * np.asarray(x1)
    np.testing.assert_allclose(np.asarray(xt), ref, atol=1e-6)
    assert np.all(np.asarray(z) == 0)


def test_losses_match_numpy_transcription(rng):
    """si_losses with linear nets vs a direct numpy evaluation of
    bridge_model.py:183-218."""
    B, T, D = 3, 8, 4
    x0 = rng.normal(size=(B, T, D)).astype(np.float32)
    x1 = rng.normal(size=(B, T, D)).astype(np.float32)
    xt = rng.normal(size=(B, T, D)).astype(np.float32)
    z = rng.normal(size=(B, T, D)).astype(np.float32)
    cond = rng.normal(size=(B, 6)).astype(np.float32)
    t = np.array([0.2, 0.5, 0.9], np.float32)

    # Deterministic linear "nets" distinguish v/s/b.
    def mk(scalar):
        def f(x, t, c):
            return scalar * x + t[:, None, None] * 0.1
        return f

    nets = {"v": mk(1.0), "s": mk(-0.5), "b": mk(0.25)}
    got = SI.si_losses(CFG, jax.random.PRNGKey(0), nets,
                       jnp.asarray(xt), jnp.asarray(t), jnp.asarray(x0),
                       jnp.asarray(x1), jnp.asarray(z), jnp.asarray(cond))

    def flat(a):
        return a.reshape(B, -1)

    partial_t = x1 - x0  # linear interpolant derivative
    v = flat(1.0 * xt + t[:, None, None] * 0.1)
    s = flat(-0.5 * xt + t[:, None, None] * 0.1)
    b = flat(0.25 * xt + t[:, None, None] * 0.1)
    pt = flat(partial_t)
    zf = flat(z)
    gd = (1.4142 * (1 - 2 * t))[:, None]
    v_loss = np.mean(0.5 * (v**2).sum(-1) - (pt * v).sum(-1))
    s_loss = np.mean(0.5 * (s**2).sum(-1) + (zf * s).sum(-1))
    b_loss = np.mean(0.5 * (b**2).sum(-1) - ((pt + gd * zf) * b).sum(-1))

    np.testing.assert_allclose(float(got.v_loss), v_loss, rtol=1e-4)
    np.testing.assert_allclose(float(got.s_loss), s_loss, rtol=1e-4)
    np.testing.assert_allclose(float(got.b_loss), b_loss, rtol=1e-4)
    np.testing.assert_allclose(float(got.total), v_loss + s_loss + b_loss, rtol=1e-4)


def _numpy_sde_vs(cfg, v_fn, s_fn, x_init, cond, n):
    """Direct transcription of bridge_model.py:334-387 (forward, d=0)."""
    delta_t = 1.0 / n
    x = x_init.copy()
    for step in range(1, n + 1):
        t = np.clip(step / n, cfg.t_min, 1 - cfg.t_min)
        tb = np.full((x.shape[0],), t, np.float32)
        gamma_t = 1.4142 * t * (1 - t)
        dot_gamma_t = 1.4142 * (1 - 2 * t)
        gamma_inv = np.clip(1 / (1.4142 * t * (1 - t) + 1e-4), 0, 200.0)
        v = v_fn(x, tb, cond)
        s = s_fn(x, tb, cond) * gamma_inv
        eps = 1 - t
        b = v - dot_gamma_t * gamma_t * s * eps
        x = x + (b + eps * s) * delta_t
    return x


def test_sde_vs_matches_numpy_transcription(rng):
    cfg = dataclasses.replace(CFG, beta_max=0.0)  # deterministic
    B, T, D = 2, 8, 4

    def v_fn(x, t, c):
        return np.tanh(x) * 0.3 + t[:, None, None] * 0.05

    def s_fn(x, t, c):
        return -0.2 * x

    x_init = rng.normal(size=(B, T, D)).astype(np.float32)
    cond = rng.normal(size=(B, 6)).astype(np.float32)

    nets = {
        "v": lambda x, t, c: jnp.tanh(x) * 0.3 + t[:, None, None] * 0.05,
        "s": lambda x, t, c: -0.2 * x,
    }
    got = SI.sde_sample(cfg, nets, jnp.asarray(x_init), jnp.asarray(cond),
                        jax.random.PRNGKey(0), diffuse_steps=10)
    want = _numpy_sde_vs(cfg, v_fn, s_fn, x_init, cond, 10)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_sde_bs_runs_and_noise_statistics(rng):
    cfg = dataclasses.replace(CFG, sde_type="bs")
    nets = {
        "b": lambda x, t, c: jnp.zeros_like(x),
        "s": lambda x, t, c: jnp.zeros_like(x),
    }
    x_init = jnp.zeros((256, 4, 2), jnp.float32)
    out = SI.sde_sample(cfg, nets, x_init, None, jax.random.PRNGKey(1),
                        diffuse_steps=10)
    # Pure-noise walk: std = d * sum over steps of (dt*sqrt(2 eps(t)))
    stds = [1.0 / 10 * np.sqrt(2 * (1 - np.clip((s + 1) / 10, 0.001, 0.999)))
            for s in range(10)]
    expect = cfg.beta_max * np.sqrt(np.sum(np.square(stds)))
    got_std = float(jnp.std(out))
    assert abs(got_std - expect) / expect < 0.15, (got_std, expect)


def test_training_loss_gradient_flows(rng):
    """End-to-end: si_training_loss is differentiable through real UNets."""
    from vla_touch_tpu.models.controllers.unet1d import SITripleUnet

    model = SITripleUnet(input_dim=4, down_dims=(32, 64))
    x = jnp.asarray(rng.normal(size=(2, 8, 4)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(2, 16)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)), c)["params"]

    def loss_fn(p):
        nets = {
            k: (lambda xt, t, cond, _k=k: model.apply(
                {"params": p}, xt, t, cond,
                method=getattr(SITripleUnet, f"apply_{_k}")))
            for k in ("v", "s", "b")
        }
        return SI.si_training_loss(CFG, jax.random.PRNGKey(1), nets, c, x,
                                   vla_act=x * 0.9).total

    g = jax.grad(loss_fn)(params)
    norms = [float(jnp.linalg.norm(leaf)) for leaf in jax.tree.leaves(g)]
    assert all(np.isfinite(norms))
    assert sum(norms) > 0
