"""Diffusion noise schedulers as pure, scan-compatible JAX functions.

TPU-native replacements for the two diffusers schedulers the reference relies
on (``/root/reference/VLA/models/rdt_runner.py:63-76``):

- :class:`DDPMScheduler`-equivalent forward process (``add_noise``) for
  training, with the ``squaredcos_cap_v2`` / ``linear`` / ``scaled_linear``
  beta schedules.
- :class:`DPMSolverMultistepScheduler`-equivalent sampling (DPM-Solver++ 2M,
  midpoint, data-prediction formulation) used by
  ``RDTRunner.conditional_sample`` (``rdt_runner.py:144-160``).

Everything here is stateless: schedule tables are precomputed into a
:class:`DiffusionSchedule` pytree at setup, and the solver step is a pure
function of ``(x, model_outputs history, step index)`` so the whole denoise
loop compiles into one ``jax.lax.scan``.

Math reference: Lu et al., "DPM-Solver++: Fast Solver for Guided Sampling of
Diffusion Probabilistic Models" (arXiv:2211.01095), eqs. for the 2M multistep
update in data-prediction space:

  x_t = (sigma_t / sigma_s) x_s - alpha_t (e^{-h} - 1) D0
        - 0.5 alpha_t (e^{-h} - 1) D1                      [midpoint]

with lambda = log(alpha/sigma), h = lambda_t - lambda_s, D0 the current
x0-prediction and D1 the finite-difference of the last two predictions.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np


def make_betas(num_train_timesteps: int,
               beta_schedule: str = "squaredcos_cap_v2",
               beta_start: float = 0.0001,
               beta_end: float = 0.02) -> np.ndarray:
    """Beta table; formulas match the diffusers conventions by name."""
    T = num_train_timesteps
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, T, dtype=np.float64)
    if beta_schedule == "scaled_linear":
        return np.linspace(beta_start**0.5, beta_end**0.5, T, dtype=np.float64) ** 2
    if beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        i = np.arange(T, dtype=np.float64)
        betas = 1.0 - alpha_bar((i + 1) / T) / alpha_bar(i / T)
        return np.minimum(betas, 0.999)
    raise ValueError(f"Unknown beta_schedule: {beta_schedule}")


@partial(jax.tree_util.register_dataclass,
         data_fields=["alphas_cumprod"],
         meta_fields=["num_train_timesteps", "beta_schedule", "beta_start",
                      "beta_end"])
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed schedule tables (all float32, length = num_train_timesteps).

    The beta-schedule config rides along as static pytree metadata so solver
    tables can be (re)computed in pure numpy even when the schedule object is
    captured inside a jitted function.
    """

    alphas_cumprod: jax.Array
    num_train_timesteps: int = 1000
    beta_schedule: str = "squaredcos_cap_v2"
    beta_start: float = 0.0001
    beta_end: float = 0.02

    def alphas_cumprod_np(self) -> np.ndarray:
        betas = make_betas(self.num_train_timesteps, self.beta_schedule,
                           self.beta_start, self.beta_end)
        return np.cumprod(1.0 - betas)

    @classmethod
    def create(cls, num_train_timesteps: int = 1000,
               beta_schedule: str = "squaredcos_cap_v2",
               beta_start: float = 0.0001, beta_end: float = 0.02):
        betas = make_betas(num_train_timesteps, beta_schedule, beta_start, beta_end)
        acp = np.cumprod(1.0 - betas)
        return cls(alphas_cumprod=jnp.asarray(acp, dtype=jnp.float32),
                   num_train_timesteps=num_train_timesteps,
                   beta_schedule=beta_schedule, beta_start=beta_start,
                   beta_end=beta_end)

    # ---- DDPM forward process (training) ------------------------------------
    def add_noise(self, x0, noise, timesteps):
        """x_t = sqrt(acp_t) x0 + sqrt(1 - acp_t) eps.

        ``timesteps``: int array (B,), broadcast over trailing dims of x0.
        """
        acp = self.alphas_cumprod[timesteps]
        shape = acp.shape + (1,) * (x0.ndim - acp.ndim)
        sa = jnp.sqrt(acp).reshape(shape).astype(x0.dtype)
        sn = jnp.sqrt(1.0 - acp).reshape(shape).astype(x0.dtype)
        return sa * x0 + sn * noise

    def velocity(self, x0, noise, timesteps):
        """v-prediction target: v = sqrt(acp) eps - sqrt(1-acp) x0."""
        acp = self.alphas_cumprod[timesteps]
        shape = acp.shape + (1,) * (x0.ndim - acp.ndim)
        sa = jnp.sqrt(acp).reshape(shape).astype(x0.dtype)
        sn = jnp.sqrt(1.0 - acp).reshape(shape).astype(x0.dtype)
        return sa * noise - sn * x0


# ---- DPM-Solver++ multistep sampler ------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DPMSolverTables:
    """Per-inference-step tables for the DPM-Solver++ 2M scan.

    Shapes are (num_inference_steps,) for ``timesteps`` (the model-facing
    train-timestep index per step) and (num_inference_steps + 1,) for the
    sigma-derived tables (entry i = state *before* step i; the final entry is
    the target of the last step).
    """

    timesteps: jax.Array    # int32 (S,)
    alpha_t: jax.Array      # f32 (S+1,)
    sigma_t: jax.Array      # f32 (S+1,)
    lambda_t: jax.Array     # f32 (S+1,)
    use_first_order: jax.Array  # bool (S,) — order-1 update at this step


def make_dpm_tables(schedule: DiffusionSchedule, num_inference_steps: int,
                    lower_order_final: bool = True,
                    final_sigma: Literal["zero", "sigma_min"] = "zero",
                    ) -> DPMSolverTables:
    """Precompute the solver tables ("linspace" timestep spacing).

    Pure numpy (works at trace time inside jit).
    """
    T = schedule.num_train_timesteps
    acp = schedule.alphas_cumprod_np().astype(np.float64)
    # Descending train-timestep grid, matching diffusers' "linspace" spacing.
    timesteps = (
        np.linspace(0, T - 1, num_inference_steps + 1)
        .round()[::-1][:-1]
        .astype(np.int64)
    )
    # Karras-style sigma = sqrt((1-acp)/acp) per train timestep, interpolated.
    sigmas_full = np.sqrt((1 - acp) / acp)
    sigmas = np.interp(timesteps, np.arange(T), sigmas_full)
    if final_sigma == "zero":
        last = 0.0
    else:
        last = float(np.sqrt((1 - acp[0]) / acp[0]))
    sigmas = np.concatenate([sigmas, [last]])

    # alpha_t = 1/sqrt(1+sigma^2), sigma_t = sigma * alpha_t (so x = a x0 + s eps).
    alpha_t = 1.0 / np.sqrt(1.0 + sigmas**2)
    sigma_t = sigmas * alpha_t
    lam = np.log(np.maximum(alpha_t, 1e-20)) - np.log(np.maximum(sigma_t, 1e-20))

    first = np.zeros(num_inference_steps, dtype=bool)
    first[0] = True  # no history yet
    if lower_order_final and num_inference_steps < 15:
        first[-1] = True

    return DPMSolverTables(
        timesteps=jnp.asarray(timesteps, jnp.int32),
        alpha_t=jnp.asarray(alpha_t, jnp.float32),
        sigma_t=jnp.asarray(sigma_t, jnp.float32),
        lambda_t=jnp.asarray(lam, jnp.float32),
        use_first_order=jnp.asarray(first),
    )


def model_output_to_x0(model_output, x, step_idx, tables: DPMSolverTables,
                       prediction_type: str):
    """Convert the network output at solver step ``step_idx`` to an
    x0-prediction (data-prediction space)."""
    a = tables.alpha_t[step_idx]
    s = tables.sigma_t[step_idx]
    if prediction_type == "sample":
        return model_output
    if prediction_type == "epsilon":
        return (x - s * model_output) / a
    if prediction_type == "v_prediction":
        return a * x - s * model_output
    raise ValueError(f"Unsupported prediction type {prediction_type}")


def dpm_solver_step(x, x0_pred, x0_prev, step_idx, tables: DPMSolverTables):
    """One DPM-Solver++ 2M (midpoint) update, branchless over solver order.

    ``x0_prev`` is the x0-prediction from the previous step (ignored when
    ``use_first_order[step_idx]``).  All math in float32; caller casts back.
    """
    i = step_idx
    lam_s, lam_t = tables.lambda_t[i], tables.lambda_t[i + 1]
    sig_s, sig_t = tables.sigma_t[i], tables.sigma_t[i + 1]
    a_t = tables.alpha_t[i + 1]
    h = lam_t - lam_s

    phi = jnp.expm1(-h)  # (e^{-h} - 1)
    first_term = (sig_t / sig_s) * x - a_t * phi * x0_pred

    # Second-order correction with the previous prediction.
    use_first = tables.use_first_order[i]
    lam_s1 = tables.lambda_t[jnp.maximum(i, 1) - 1]
    h_0 = lam_s - lam_s1
    # Guard r0 against 0/0 at the first step (result is discarded by the
    # `use_first` select, but NaNs must not be materialized).
    r0 = jnp.where(use_first, 1.0, h_0 / h)
    d1 = (x0_pred - x0_prev) / r0
    second_term = -0.5 * a_t * phi * d1

    return jnp.where(use_first, first_term, first_term + second_term)


def sample_dpm_solver(model_fn, x_init, schedule: DiffusionSchedule,
                      num_inference_steps: int,
                      prediction_type: str = "sample",
                      lower_order_final: bool = True,
                      final_sigma: Literal["zero", "sigma_min"] = "zero",
                      start_index: int = 0, unroll: int = 1):
    """Run the full DPM-Solver++ denoise loop as a single ``lax.scan``.

    ``model_fn(x, t)``: x (B, ...) float, t int32 (B,) train-timestep indices
    -> prediction of the configured type.  Equivalent of the reference's
    per-step python loop (``rdt_runner.py:146-160``) but fully compiled.

    ``start_index`` > 0 runs only the schedule TAIL (partial denoising for
    warm-started replans, à la Falcon/Δ-DiT): ``x_init`` must then sit at
    step ``start_index``'s noise level — build it with
    :func:`dpm_renoise`.  The first executed step drops to first order
    (no model-output history exists yet).

    ``unroll`` is passed to the scan (the loop is 3–5 iterations at serving
    operating points, so full unroll lets XLA schedule across step
    boundaries at negligible code-size cost).
    """
    if not 0 <= start_index < num_inference_steps:
        raise ValueError(
            f"start_index {start_index} not in [0, {num_inference_steps}) — "
            "an empty solver tail would silently return the (re)noised "
            "input unchanged")
    tables = make_dpm_tables(schedule, num_inference_steps,
                             lower_order_final, final_sigma)
    if start_index:
        tables = dataclasses.replace(
            tables,
            use_first_order=tables.use_first_order.at[start_index].set(True))
    in_dtype = x_init.dtype
    batch = x_init.shape[0]

    def body(carry, step_idx):
        x, x0_prev = carry
        t = jnp.broadcast_to(tables.timesteps[step_idx], (batch,))
        out = model_fn(x.astype(in_dtype), t).astype(jnp.float32)
        x0 = model_output_to_x0(out, x, step_idx, tables, prediction_type)
        x_next = dpm_solver_step(x, x0, x0_prev, step_idx, tables)
        return (x_next, x0), None

    x0_init = jnp.zeros_like(x_init, dtype=jnp.float32)
    (x_final, _), _ = jax.lax.scan(
        body, (x_init.astype(jnp.float32), x0_init),
        jnp.arange(start_index, num_inference_steps),
        unroll=min(unroll, num_inference_steps - start_index),
    )
    return x_final.astype(in_dtype)


def dpm_renoise(x0, noise, schedule: DiffusionSchedule,
                num_inference_steps: int, start_index: int,
                lower_order_final: bool = True,
                final_sigma: Literal["zero", "sigma_min"] = "zero"):
    """Place a clean sample at the noise level of solver step
    ``start_index`` (x = alpha_t x0 + sigma_t eps in the solver's tables
    convention) — the warm-start entry point for partial denoising."""
    tables = make_dpm_tables(schedule, num_inference_steps,
                             lower_order_final, final_sigma)
    a = tables.alpha_t[start_index]
    s = tables.sigma_t[start_index]
    return (a * x0.astype(jnp.float32) + s * noise.astype(jnp.float32))


# ---- DDPM ancestral sampler (used by the reference for training-time eval
#      parity checks and available as a fallback) ------------------------------


def sample_ddpm(model_fn, x_init, schedule: DiffusionSchedule, key,
                prediction_type: str = "sample", clip_sample: bool = False):
    """Full-length ancestral DDPM sampling as a scan (T = train timesteps)."""
    acp = schedule.alphas_cumprod
    T = schedule.num_train_timesteps
    acp_prev = jnp.concatenate([jnp.ones((1,), acp.dtype), acp[:-1]])
    alphas = acp / acp_prev
    batch = x_init.shape[0]

    def body(carry, t):
        x, k = carry
        k, sub = jax.random.split(k)
        tb = jnp.broadcast_to(t, (batch,))
        out = model_fn(x, tb).astype(jnp.float32)
        a_t, acp_t, acp_p = alphas[t], acp[t], acp_prev[t]
        beta_t = 1.0 - a_t
        if prediction_type == "sample":
            x0 = out
        elif prediction_type == "epsilon":
            x0 = (x - jnp.sqrt(1 - acp_t) * out) / jnp.sqrt(acp_t)
        else:
            raise ValueError(prediction_type)
        if clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
        # q(x_{t-1} | x_t, x0) posterior mean/variance.
        coef_x0 = jnp.sqrt(acp_p) * beta_t / (1 - acp_t)
        coef_xt = jnp.sqrt(a_t) * (1 - acp_p) / (1 - acp_t)
        mean = coef_x0 * x0 + coef_xt * x
        var = jnp.clip(beta_t * (1 - acp_p) / (1 - acp_t), 1e-20)
        noise = jax.random.normal(sub, x.shape, dtype=jnp.float32)
        x_next = mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) * noise
        return (x_next, k), None

    ts = jnp.arange(T - 1, -1, -1)
    (x, _), _ = jax.lax.scan(body, (x_init.astype(jnp.float32), key), ts)
    return x.astype(x_init.dtype)
