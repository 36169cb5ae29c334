"""Pure-bf16 parameter storage with stochastically-rounded updates.

``param_dtype='bfloat16'`` + int8 Adam moments + bf16 accumulator/EMA is the
memory recipe that fits RDT-1B at the reference's accum>=4 operating point
(``finetune.sh`` bs4xaccum4) on ONE 16 GB chip.  The quality contract: with
stochastic rounding the bf16 parameter trajectory tracks the f32-master
trajectory in expectation; these tests pin (a) mechanics and (b) convergence
parity at tiny scale.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_touch_tpu.config import NoiseSchedulerConfig, TrainConfig, rdt_tiny
from vla_touch_tpu.models.rdt import runner as R
from vla_touch_tpu.train import rdt_train as T

RCFG = R.RDTRunnerConfig(model=rdt_tiny(), noise=NoiseSchedulerConfig())
BF16 = dict(param_dtype="bfloat16", accum_dtype="bfloat16",
            ema_dtype="bfloat16", use_8bit_adam=True)


def _batch(rng, accum=1, micro=4):
    m = RCFG.model

    def r(*s):
        return jnp.asarray(rng.normal(size=(accum, micro) + s), jnp.float32)

    return {
        "lang_tokens": r(6, m.lang_token_dim),
        "lang_mask": jnp.ones((accum, micro, 6), bool),
        "img_tokens": r(m.img_cond_len, m.img_token_dim),
        "state_tokens": r(1, m.state_token_dim),
        "action_gt": r(m.horizon, m.output_dim),
        "action_mask": jnp.ones((accum, micro, 1, m.output_dim)),
        "ctrl_freqs": jnp.full((accum, micro), 10.0),
    }


def test_bf16_param_step_mechanics(rng):
    tcfg = TrainConfig(lr_warmup_steps=0, **BF16)
    state = T.init_train_state(RCFG, tcfg, jax.random.PRNGKey(0))
    assert jax.tree.leaves(state.params)[0].dtype == jnp.bfloat16
    new_state, metrics = jax.jit(
        lambda s, k, b: T.train_step(RCFG, tcfg, s, k, b)
    )(state, jax.random.PRNGKey(1), _batch(rng))
    assert np.isfinite(float(metrics["loss"]))
    assert jax.tree.leaves(new_state.params)[0].dtype == jnp.bfloat16
    moved = sum(
        float(jnp.sum(jnp.abs(a.astype(jnp.float32) -
                              b.astype(jnp.float32))))
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(new_state.params)))
    assert moved > 0


def test_warm_start_params_are_cast_to_recipe_dtypes():
    """Finetuning from a ported f32 checkpoint (the recipe's primary flow,
    --pretrained_model_name_or_path) must apply the same param/EMA dtype
    casts as a fresh init — an f32 warm start silently re-inflating the
    state would defeat the single-chip memory recipe."""
    tcfg = TrainConfig(lr_warmup_steps=0, **BF16)
    f32_params = R.init_rdt(RCFG, jax.random.PRNGKey(7))
    assert jax.tree.leaves(f32_params)[0].dtype == jnp.float32
    state = T.init_train_state(RCFG, tcfg, jax.random.PRNGKey(0),
                               params=f32_params)
    assert all(p.dtype == jnp.bfloat16
               for p in jax.tree.leaves(state.params))
    assert all(s.dtype == jnp.bfloat16
               for s in jax.tree.leaves(state.ema.shadow))
    # Values survive the cast (shadow starts at the warm-start params).
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state.params)[0], np.float32),
        np.asarray(jax.tree.leaves(f32_params)[0], np.float32), atol=0.01)


def test_bf16_param_requires_8bit_adam():
    tcfg = TrainConfig(param_dtype="bfloat16", use_8bit_adam=False)
    with pytest.raises(ValueError, match="use_8bit_adam"):
        T.init_train_state(RCFG, tcfg, jax.random.PRNGKey(0))


@pytest.mark.slow
def test_bf16_training_convergence_matches_f32_master(rng):
    """Train the tiny RDT on a fixed batch cycle; the pure-bf16(+SR) run
    must reach a final loss comparable to the f32-master oracle — the
    sub-ulp updates survive through stochastic rounding."""
    batches = [_batch(rng) for _ in range(4)]

    def run(tkw, steps=240):
        tcfg = TrainConfig(lr_warmup_steps=0, learning_rate=3e-4, **tkw)
        state = T.init_train_state(RCFG, tcfg, jax.random.PRNGKey(0))
        step = jax.jit(lambda s, k, b: T.train_step(RCFG, tcfg, s, k, b),
                       donate_argnums=(0,))
        losses = []
        for i in range(steps):
            state, m = step(state, jax.random.PRNGKey(100 + i),
                            batches[i % len(batches)])
            losses.append(float(m["loss"]))
        return np.asarray(losses)

    f32 = run(dict(use_8bit_adam=True))
    bf16 = run(BF16)

    f32_final = f32[-20:].mean()
    bf16_final = bf16[-20:].mean()
    # The oracle learns (measured: 1.01 -> 0.68 over 240 steps)...
    assert f32_final < 0.75 * f32[:5].mean()
    # ...and bf16+SR tracks it closely (measured: 0.6807 vs 0.6805).
    assert abs(bf16_final - f32_final) < 0.10 * f32_final, (
        bf16_final, f32_final)
