"""Scheduler correctness: closed-form DDPM properties, DPM-Solver++ exactness
on analytically solvable models, and convergence-order checks."""

import jax
import jax.numpy as jnp
import numpy as np

from vla_touch_tpu.ops import schedulers as S


def test_squaredcos_betas_formula():
    T = 1000
    betas = S.make_betas(T, "squaredcos_cap_v2")

    def alpha_bar(t):
        return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

    ref = np.minimum(
        1 - alpha_bar((np.arange(T) + 1) / T) / alpha_bar(np.arange(T) / T), 0.999
    )
    np.testing.assert_allclose(betas, ref, atol=1e-12)
    assert betas[0] > 0 and betas[-1] == 0.999


def test_add_noise_closed_form(rng):
    sched = S.DiffusionSchedule.create(1000)
    x0 = jnp.asarray(rng.normal(size=(4, 8, 10)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=(4, 8, 10)), jnp.float32)
    t = jnp.array([0, 10, 500, 999])
    xt = sched.add_noise(x0, noise, t)
    acp = np.cumprod(1 - S.make_betas(1000))
    for b in range(4):
        ref = np.sqrt(acp[int(t[b])]) * np.asarray(x0[b]) + np.sqrt(
            1 - acp[int(t[b])]
        ) * np.asarray(noise[b])
        np.testing.assert_allclose(np.asarray(xt[b]), ref, rtol=1e-5, atol=1e-5)


def test_dpm_tables_linspace_spacing():
    sched = S.DiffusionSchedule.create(1000)
    tables = S.make_dpm_tables(sched, 5)
    # diffusers "linspace": linspace(0, 999, 6).round()[::-1][:-1]
    np.testing.assert_array_equal(
        np.asarray(tables.timesteps), [999, 799, 599, 400, 200]
    )
    assert np.asarray(tables.use_first_order).tolist() == [True, False, False, False, True]
    # Final sigma zero -> last alpha_t == 1, sigma_t == 0.
    assert float(tables.alpha_t[-1]) == 1.0
    assert float(tables.sigma_t[-1]) == 0.0


def test_sample_prediction_constant_model_is_exact(rng):
    """With prediction_type='sample' and a model that always returns c, the
    sampler must land exactly on c (final sigma zero makes the last step an
    exact replacement)."""
    sched = S.DiffusionSchedule.create(1000)
    c = jnp.asarray(rng.normal(size=(2, 16, 10)), jnp.float32)
    x_init = jnp.asarray(rng.normal(size=(2, 16, 10)), jnp.float32)
    out = S.sample_dpm_solver(lambda x, t: c, x_init, sched, 5, "sample")
    np.testing.assert_allclose(np.asarray(out), np.asarray(c), rtol=1e-4, atol=1e-5)


def test_epsilon_prediction_exact_for_true_noise_model(rng):
    """If the model returns the exact epsilon for a known x0 (i.e. the
    posterior is deterministic), the ODE solution is x0."""
    sched = S.DiffusionSchedule.create(1000)
    x0 = jnp.asarray(rng.normal(size=(3, 8)), jnp.float32)
    tables = S.make_dpm_tables(sched, 10)

    # eps(x, t) consistent with x = a x0 + s eps  ->  eps = (x - a x0)/s.
    # Build a model that infers eps from the *current solver step*'s (a, s).
    # We exploit that model is called once per step in order, so use t to
    # find the step index.
    ts = np.asarray(tables.timesteps)

    def model(x, t):
        step = jnp.argmax(jnp.equal(jnp.asarray(ts), t[0]))
        a, s = tables.alpha_t[step], tables.sigma_t[step]
        return (x - a * x0) / s

    x_init = jnp.asarray(np.random.default_rng(1).normal(size=(3, 8)), jnp.float32)
    out = S.sample_dpm_solver(model, x_init, sched, 10, "epsilon")
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=2e-3, atol=2e-3)


def test_second_order_beats_first_order():
    """On a time-dependent linear model the 2M solver should be much more
    accurate than forcing first-order every step, at equal step count."""
    sched = S.DiffusionSchedule.create(1000)

    def x0_model(x, t):
        # A smooth, t-dependent x0-prediction (not constant, so order matters).
        tt = t[0].astype(jnp.float32) / 1000.0
        return jnp.tanh(x) * (0.5 + tt)

    x_init = jnp.full((1, 4), 1.5, jnp.float32)

    ref = S.sample_dpm_solver(x0_model, x_init, sched, 200, "sample")

    coarse2 = S.sample_dpm_solver(x0_model, x_init, sched, 8, "sample")

    # First-order-only variant: monkeypatch the order flags via tables by
    # sampling with num_inference_steps=8 but patched flags.
    tables = S.make_dpm_tables(sched, 8)
    tables1 = S.DPMSolverTables(
        timesteps=tables.timesteps,
        alpha_t=tables.alpha_t,
        sigma_t=tables.sigma_t,
        lambda_t=tables.lambda_t,
        use_first_order=jnp.ones_like(tables.use_first_order),
    )

    def run_with_tables(tbl):
        x = x_init.astype(jnp.float32)
        x0_prev = jnp.zeros_like(x)
        for i in range(8):
            t = jnp.broadcast_to(tbl.timesteps[i], (1,))
            x0 = x0_model(x, t)
            x = S.dpm_solver_step(x, x0, x0_prev, i, tbl)
            x0_prev = x0
        return x

    coarse1 = run_with_tables(tables1)
    err2 = float(jnp.abs(coarse2 - ref).max())
    err1 = float(jnp.abs(coarse1 - ref).max())
    assert err2 < err1, (err2, err1)


def test_scan_matches_python_loop(rng):
    """The lax.scan sampler must equal an explicit per-step loop of the same
    update (guards against carry/index off-by-ones)."""
    sched = S.DiffusionSchedule.create(1000)
    w = jnp.asarray(rng.normal(size=(6, 6)) * 0.1, jnp.float32)

    def model(x, t):
        return jnp.tanh(x @ w) + 0.01 * t[:, None].astype(jnp.float32) / 1000.0

    x_init = jnp.asarray(rng.normal(size=(2, 6)), jnp.float32)
    steps = 5
    out_scan = S.sample_dpm_solver(model, x_init, sched, steps, "sample")

    tables = S.make_dpm_tables(sched, steps)
    x = x_init.astype(jnp.float32)
    x0_prev = jnp.zeros_like(x)
    for i in range(steps):
        t = jnp.broadcast_to(tables.timesteps[i], (2,))
        x0 = S.model_output_to_x0(model(x, t), x, i, tables, "sample")
        x = S.dpm_solver_step(x, x0, x0_prev, i, tables)
        x0_prev = x0
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(x), rtol=1e-5, atol=1e-6)


def test_ddpm_sampler_runs_and_is_finite(rng):
    sched = S.DiffusionSchedule.create(50)
    c = jnp.asarray(rng.normal(size=(2, 4)), jnp.float32)
    out = S.sample_ddpm(lambda x, t: c, jnp.zeros((2, 4), jnp.float32), sched,
                        jax.random.PRNGKey(0), "sample")
    assert np.isfinite(np.asarray(out)).all()
    # Ancestral sampling with constant x0-prediction concentrates near c.
    assert float(jnp.abs(out - c).mean()) < 0.2
