"""Stochastic-interpolants bridge diffusion (BRIDGeR) as pure JAX functions.

TPU-native re-expression of
``/root/reference/VLA/residual_controller/bridge/bridge_model.py``: the
interpolant/γ/ε schedule families, the implicit v/s/b training losses, and the
Euler–Maruyama SDE samplers — with every sampling loop compiled as a single
``jax.lax.scan`` and all randomness drawn from explicit PRNG keys.

The bridge transports the VLA prior action chunk x₀ to the expert chunk x₁
through xₜ = w₀(t)x₀ + w₁(t)x₁ + γ(t)z,  z ~ d·N(0, I).

Reference quirks preserved deliberately (they are part of the trained-model
contract):

- the SDE noise term is ``Δt·sqrt(2ε(t))·d·randn`` (Δt, not √Δt;
  ``bridge_model.py:319,329``);
- ε and the noise scale are evaluated at the *scalar* t of the step (t is
  shared across the batch at sample time);
- γ-inverse is clamped to [0, 200] (``bridge_model.py:93-101``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vla_touch_tpu.config import InterpolantConfig


# ---- schedule families --------------------------------------------------------

_SQRT2 = 1.4142


def epsilon(cfg: InterpolantConfig, t):
    et = cfg.epsilon_type
    if et == "t(t-1)":
        return t * (1 - t)
    if et == "1-t":
        return (1 - t) * 1.0
    if et == "1-sqrt(t)":
        return 1 - jnp.sqrt(t)
    if et == "1-t^2":
        return 1 - jnp.square(t)
    if et == "0":
        return t * 0.0
    raise NotImplementedError(et)


def gamma(cfg: InterpolantConfig, t):
    gt = cfg.gamma_type
    if gt == "(2t(t-1))^0.5":
        return _SQRT2 * jnp.sqrt(t * (1 - t))
    if gt == "2^0.5*t(t-1)":
        return _SQRT2 * t * (1 - t)
    if gt == "(1-t)^2(2t)^0.5":
        return _SQRT2 * jnp.square(1 - t) * jnp.sqrt(t)
    raise NotImplementedError(gt)


def gamma_der(cfg: InterpolantConfig, t):
    gt = cfg.gamma_type
    if gt == "(2t(t-1))^0.5":
        return (1 - 2 * t) / jnp.sqrt(2 * (t - jnp.square(t)) + 1e-4)
    if gt == "2^0.5*t(t-1)":
        return _SQRT2 * (1 - 2 * t)
    if gt == "(1-t)^2(2t)^0.5":
        return _SQRT2 * (2 * (t - 1) * jnp.sqrt(t)
                         + jnp.square(1 - t) / (2.0 * jnp.sqrt(t + 1e-4)))
    raise NotImplementedError(gt)


def gamma_inv(cfg: InterpolantConfig, t):
    gt = cfg.gamma_type
    if gt == "(2t(t-1))^0.5":
        raw = 1 / (_SQRT2 * jnp.sqrt(t * (1 - t) + 1e-4))
    elif gt == "2^0.5*t(t-1)":
        raw = 1 / (_SQRT2 * t * (1 - t) + 1e-4)
    elif gt == "(1-t)^2(2t)^0.5":
        raw = 1 / (_SQRT2 * jnp.square(1 - t) * jnp.sqrt(t) + 1e-4)
    else:
        raise NotImplementedError(gt)
    return jnp.clip(raw, 0.0, cfg.gamma_inv_max)


def interpolant_weights(cfg: InterpolantConfig, t):
    """(w0, w1) mixing weights of the interpolant (``bridge_model.py:103-147``)."""
    it = cfg.interpolant_type
    if it == "linear":
        return 1 - t, t
    if it == "reverse_power3":
        return 1 - t**3, t**3
    if it == "reverse_power4":
        return 1 - t**4, t**4
    if it == "power3":
        return (1 - t) ** 3, 1 - (1 - t) ** 3
    if it == "power4":
        return (1 - t) ** 4, 1 - (1 - t) ** 4
    if it == "gaussian_encode_decode":
        c2 = jnp.square(jnp.cos(t * jnp.pi))
        return c2 * (t <= 0.5), c2 * (t > 0.5)
    if it == "reverse_linear":
        w0 = (1 - 2 * t) * (t <= 0.5)
        return w0, 1 - w0
    raise NotImplementedError(it)


def interpolant_dev(cfg: InterpolantConfig, x0, x1, t):
    """∂ₜ xₜ (deterministic part), ``bridge_model.py:149-181``."""
    it = cfg.interpolant_type
    if it == "linear":
        return x1 - x0
    if it == "power3":
        return 3 * (1 - t) ** 2 * (x1 - x0)
    if it == "power4":
        return 4 * (1 - t) ** 3 * (x1 - x0)
    if it == "reverse_power3":
        return 3 * t**2 * (x1 - x0)
    if it == "reverse_power4":
        return 4 * t**3 * (x1 - x0)
    if it == "gaussian_encode_decode":
        core = -2 * jnp.pi * jnp.cos(jnp.pi * t) * jnp.sin(jnp.pi * t)
        return core * jnp.where(t <= 0.5, x0, x1)
    if it == "reverse_linear":
        return jnp.where(t <= 0.5, 2 * (x1 - x0), 0.0)
    raise NotImplementedError(it)


def _bdims(t, x):
    """Broadcast per-sample t (B,) across x's trailing dims."""
    return t.reshape(t.shape + (1,) * (x.ndim - t.ndim))


# ---- forward process + losses -------------------------------------------------


def q_sample(cfg: InterpolantConfig, key, t, x0, x1):
    """Sample xₜ ~ q(xₜ | x₀, x₁); returns (xₜ, z) with z the *unscaled-by-γ*
    noise (already scaled by d = beta_max, matching the reference)."""
    tb = jnp.clip(_bdims(t, x0), cfg.t_min, 1.0 - cfg.t_min)
    z = cfg.beta_max * jax.random.normal(key, x0.shape, dtype=jnp.float32)
    w0, w1 = interpolant_weights(cfg, tb)
    xt = w0 * x0 + w1 * x1 + gamma(cfg, tb) * z
    return xt, z


class SILosses(NamedTuple):
    total: jax.Array
    v_loss: jax.Array
    s_loss: jax.Array
    b_loss: jax.Array


def si_losses(cfg: InterpolantConfig, key, nets: dict, xt, t, x0, x1, z, cond):
    """Implicit v/s/b losses (``bridge_model.py:183-246``).

    ``nets``: dict with callables ``v``, ``s``, ``b`` of signature
    (x, t, cond) -> prediction, already bound to parameters.
    """
    del key
    t = jnp.clip(t, cfg.t_min, 1.0 - cfg.t_min)
    tb = _bdims(t, x0)
    partial_t = interpolant_dev(cfg, x0, x1, tb)

    def flat(a):
        return a.reshape(a.shape[0], -1)

    v = nets["v"](xt, t, cond)
    v_loss = jnp.mean(
        0.5 * jnp.sum(jnp.square(flat(v)), -1)
        - jnp.sum(flat(partial_t) * flat(v), -1)
    )

    s = nets["s"](xt, t, cond)
    s_loss = jnp.mean(
        0.5 * jnp.sum(jnp.square(flat(s)), -1)
        + jnp.sum(flat(z) * flat(s), -1)
    )

    b = nets["b"](xt, t, cond)
    gd = gamma_der(cfg, t)[:, None]
    b_loss = jnp.mean(
        0.5 * jnp.sum(jnp.square(flat(b)), -1)
        - jnp.sum((flat(partial_t) + gd * flat(z)) * flat(b), -1)
    )

    return SILosses(v_loss + s_loss + b_loss, v_loss, s_loss, b_loss)


def si_training_loss(cfg: InterpolantConfig, key, nets: dict, obs_cond,
                     expert_act, vla_act=None):
    """Full training objective (``bridge_model.py:220-246``): sample t and xₜ,
    then sum the three implicit losses.  ``vla_act=None`` falls back to a
    Gaussian prior."""
    k_t, k_z, k_prior, k_loss = jax.random.split(key, 4)
    x1 = expert_act.astype(jnp.float32)
    if vla_act is None:
        x0 = jax.random.normal(k_prior, x1.shape, dtype=jnp.float32)
    else:
        x0 = vla_act.astype(jnp.float32)
    t = jax.random.uniform(k_t, (x1.shape[0],), dtype=jnp.float32)
    xt, z = q_sample(cfg, k_z, t, x0, x1)
    xt = jax.lax.stop_gradient(xt)
    return si_losses(cfg, k_loss, nets, xt, t, x0, x1, z, obs_cond)


# ---- SDE samplers (scan) ------------------------------------------------------


def sde_sample(cfg: InterpolantConfig, nets: dict, x_prior, cond, key,
               diffuse_steps: int | None = None, score_weight: float = 1.0,
               record_traj: bool = False, noise_seq=None,
               unroll: int | None = None):
    """Forward Euler–Maruyama simulation of the bridge SDE, one lax.scan.

    ``nets``: ``{"v": fn, "s": fn}`` for sde_type 'vs' or ``{"b": fn,
    "s": fn}`` for 'bs', each (x, t, cond) -> drift term; bind EMA params for
    deployment parity (``bridge_model.py:267``).

    ``noise_seq`` (n_steps,) + x.shape standard normals overrides the
    key-derived Brownian increments — recorded-noise injection makes the
    stochastic rollout exactly reproducible for cross-framework golden
    parity (SURVEY §7 hard part 3).
    """
    n = diffuse_steps or cfg.diffusion_steps
    delta_t = 1.0 / n
    x0 = x_prior.astype(jnp.float32)

    def body(carry, step):
        x, k = carry
        k, sub = jax.random.split(k)
        t_scalar = jnp.clip((step + 1).astype(jnp.float32) / n,
                            cfg.t_min, 1.0 - cfg.t_min)
        t = jnp.full((x.shape[0],), t_scalar, jnp.float32)
        if cfg.sde_type == "vs" and "vs_fused" in nets:
            # TPU optimization: both UNets evaluated as one batched program
            # (stacked params + vmap) — halves the sequential kernel chain.
            v_val, s_raw = nets["vs_fused"](x, t, cond)
            s_val = s_raw * _bdims(gamma_inv(cfg, t), x)
            ggd = _bdims(gamma_der(cfg, t) * gamma(cfg, t), x)
            b_val = v_val - ggd * s_val * epsilon(cfg, t_scalar)
        elif cfg.sde_type == "vs":
            s_val = nets["s"](x, t, cond) * _bdims(gamma_inv(cfg, t), x)
            v_val = nets["v"](x, t, cond)
            ggd = _bdims(gamma_der(cfg, t) * gamma(cfg, t), x)
            b_val = v_val - ggd * s_val * epsilon(cfg, t_scalar)
        elif cfg.sde_type == "bs":
            s_val = nets["s"](x, t, cond) * _bdims(gamma_inv(cfg, t), x)
            b_val = nets["b"](x, t, cond)
        else:
            raise NotImplementedError(cfg.sde_type)
        eps_t = epsilon(cfg, t_scalar)
        noise_scale = delta_t * jnp.sqrt(2 * eps_t)
        if noise_seq is None:
            dw = cfg.beta_max * jax.random.normal(sub, x.shape, jnp.float32)
        else:
            dw = cfg.beta_max * jnp.asarray(noise_seq, jnp.float32)[step]
        x_new = x + (b_val + score_weight * eps_t * s_val) * delta_t
        x_new = x_new + noise_scale * dw
        return (x_new, k), (x_new if record_traj else None)

    # The SDE body is ~50 tiny ops on (B, H<=16, C<=512) tensors; unroll
    # was measured a WASH on v5e (tools/bench_bridge.py: u1 8.3 / u2 8.1 /
    # u5 9.7 ms p50 — the per-step cost is weight re-streaming, not scan
    # iteration overhead), so the default stays rolled (compile time,
    # memory); the knob remains for other platforms.
    if unroll is None:
        unroll = 1
    (x_final, _), traj = jax.lax.scan(body, (x0, key), jnp.arange(n),
                                      unroll=min(unroll, n))
    if record_traj:
        return x_final, jnp.concatenate([x0[None], traj], axis=0)
    return x_final
