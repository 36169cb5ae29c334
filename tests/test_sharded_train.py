"""Multi-device sharded training on the virtual 8-device CPU mesh:
DP gradient equivalence, TP parameter sharding, ZeRO opt-state placement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_touch_tpu.config import NoiseSchedulerConfig, TrainConfig, rdt_tiny
from vla_touch_tpu.models.rdt import runner as R
from vla_touch_tpu.parallel import mesh as mesh_lib
from vla_touch_tpu.train import rdt_train as T

TINY = rdt_tiny()
RCFG = R.RDTRunnerConfig(model=TINY, noise=NoiseSchedulerConfig())
TCFG = TrainConfig(grad_accum=2, lr_warmup_steps=0, learning_rate=1e-4)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _batch(rng, accum, micro):
    m = TINY
    B = micro
    def r(*s):
        return jnp.asarray(rng.normal(size=(accum, B) + s), jnp.float32)
    return {
        "lang_tokens": r(6, m.lang_token_dim),
        "lang_mask": jnp.ones((accum, B, 6), bool),
        "img_tokens": r(m.img_cond_len, m.img_token_dim),
        "state_tokens": r(1, m.state_token_dim),
        "action_gt": r(m.horizon, m.output_dim),
        "action_mask": jnp.ones((accum, B, 1, m.output_dim)),
        "ctrl_freqs": jnp.full((accum, B), 10.0),
    }


def test_dp_sharded_step_matches_single_device(rng):
    mesh = mesh_lib.make_mesh(n_data=8, n_model=1)
    state = T.init_train_state(RCFG, TCFG, jax.random.PRNGKey(0))
    batch = _batch(rng, accum=2, micro=8)

    step_fn, state_sh = T.make_sharded_train_step(mesh, RCFG, TCFG)
    sharded = T.shard_train_state(mesh, state, state_sh)
    new_sharded, metrics = step_fn(sharded, jax.random.PRNGKey(1), batch)

    # Single-device oracle.
    state2 = T.init_train_state(RCFG, TCFG, jax.random.PRNGKey(0))
    new_single, metrics2 = jax.jit(
        lambda s, k, b: T.train_step(RCFG, TCFG, s, k, b)
    )(state2, jax.random.PRNGKey(1), batch)

    np.testing.assert_allclose(float(metrics["loss"]), float(metrics2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(new_sharded.params),
                    jax.tree.leaves(new_single.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
    assert int(new_sharded.step) == 1
    # EMA decay at step 0 is 0 -> shadow unchanged from init params... but
    # params moved, so shadow != new params.
    assert int(new_sharded.ema.num_updates) == 1


def test_zero3_shards_params_and_matches_replicated(rng):
    """FSDP/ZeRO-3 (`--zero3`): parameters + EMA shadow live sharded over
    the data axis — per-chip param state ~1/8 here — and one optimizer
    step is numerically identical to the replicated single-device step
    (GSPMD's all-gather/reduce-scatter insertion is math-preserving)."""
    tcfg3 = TrainConfig(grad_accum=2, lr_warmup_steps=0, learning_rate=1e-4,
                        zero3=True)
    mesh = mesh_lib.make_mesh(n_data=8, n_model=1)
    state = T.init_train_state(RCFG, tcfg3, jax.random.PRNGKey(0))
    batch = _batch(rng, accum=2, micro=8)

    step_fn, state_sh = T.make_sharded_train_step(mesh, RCFG, tcfg3)
    sharded = T.shard_train_state(mesh, state, state_sh)

    # Every sizeable leaf (params AND ema shadow) is actually data-sharded.
    qkv = sharded.params["model"]["block0"]["attn"]["qkv"]["kernel"]
    assert "data" in tuple(qkv.sharding.spec)
    assert qkv.addressable_data(0).size == qkv.size // 8
    shadow_qkv = sharded.ema.shadow["model"]["block0"]["attn"]["qkv"]["kernel"]
    assert shadow_qkv.addressable_data(0).size == shadow_qkv.size // 8
    sharded_frac = sum(
        l.addressable_data(0).size for l in jax.tree.leaves(sharded.params)
    ) / sum(l.size for l in jax.tree.leaves(sharded.params))
    assert sharded_frac < 0.2          # ~1/8 + a few replicated small leaves

    new_sharded, metrics = step_fn(sharded, jax.random.PRNGKey(1), batch)

    state2 = T.init_train_state(RCFG, TCFG, jax.random.PRNGKey(0))
    new_single, metrics2 = jax.jit(
        lambda s, k, b: T.train_step(RCFG, TCFG, s, k, b)
    )(state2, jax.random.PRNGKey(1), batch)

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(new_sharded.params),
                    jax.tree.leaves(new_single.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_zero3_composes_with_tp(rng):
    """On a (data=4, model=2) mesh the qkv kernel is sharded over BOTH axes
    (Megatron TP on the output features, FSDP on the input features) and
    the step still runs to a finite loss."""
    tcfg3 = TrainConfig(grad_accum=1, lr_warmup_steps=0, learning_rate=1e-4,
                        zero3=True)
    mesh = mesh_lib.make_mesh(n_data=4, n_model=2)
    state = T.init_train_state(RCFG, tcfg3, jax.random.PRNGKey(0))
    step_fn, state_sh = T.make_sharded_train_step(mesh, RCFG, tcfg3)
    sharded = T.shard_train_state(mesh, state, state_sh)

    qkv = sharded.params["model"]["block0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == jax.sharding.PartitionSpec("data", "model")
    assert qkv.addressable_data(0).size == qkv.size // 8

    new_state, metrics = step_fn(sharded, jax.random.PRNGKey(1),
                                 _batch(rng, accum=1, micro=4))
    assert np.isfinite(float(metrics["loss"]))


def test_tp_mesh_runs_and_shards_params(rng):
    mesh = mesh_lib.make_mesh(n_data=4, n_model=2)
    state = T.init_train_state(RCFG, TCFG, jax.random.PRNGKey(0))
    batch = _batch(rng, accum=1, micro=4)

    step_fn, state_sh = T.make_sharded_train_step(mesh, RCFG, TCFG)
    sharded = T.shard_train_state(mesh, state, state_sh)

    # qkv kernels must actually be sharded over the model axis.
    qkv = sharded.params["model"]["block0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == jax.sharding.PartitionSpec(None, "model")

    new_state, metrics = step_fn(sharded, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(metrics["loss"]))

    # TP result must match the DP-only result.
    state2 = T.init_train_state(RCFG, TCFG, jax.random.PRNGKey(0))
    new_single, m2 = jax.jit(
        lambda s, k, b: T.train_step(RCFG, TCFG, s, k, b)
    )(state2, jax.random.PRNGKey(1), batch)
    np.testing.assert_allclose(float(metrics["loss"]), float(m2["loss"]),
                               rtol=1e-4)


def test_8bit_adam_train_step(rng):
    """One RDT train step with blockwise-int8 optimizer moments."""
    import dataclasses

    tcfg8 = dataclasses.replace(TCFG, use_8bit_adam=True)
    state = T.init_train_state(RCFG, tcfg8, jax.random.PRNGKey(0))
    # The chained state: (clip EmptyState, Adam8bitState).
    inner = state.opt_state[1]
    assert jax.tree.leaves(inner.m_q)[0].dtype == jnp.int8
    batch = _batch(rng, accum=1, micro=2)
    new_state, metrics = jax.jit(
        lambda s, k, b: T.train_step(RCFG, tcfg8, s, k, b)
    )(state, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(metrics["loss"]))
    # Params actually moved.
    d = sum(float(jnp.sum(jnp.abs(a - b))) for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(new_state.params)))
    assert d > 0


def test_bf16_grad_accum_close_to_f32(rng):
    """accum_dtype='bfloat16' (the 1B-accum4-on-one-chip memory lever) must
    produce an optimizer step close to the f32-accumulator oracle: the
    accumulator rounding (~2^-8 relative per add) is far below gradient
    noise between microbatches."""
    import dataclasses

    batch = _batch(rng, accum=4, micro=2)
    outs = {}
    for dt in ("float32", "bfloat16"):
        tcfg = dataclasses.replace(TCFG, accum_dtype=dt)
        state = T.init_train_state(RCFG, tcfg, jax.random.PRNGKey(0))
        new_state, metrics = jax.jit(
            lambda s, k, b, t=tcfg: T.train_step(RCFG, t, s, k, b)
        )(state, jax.random.PRNGKey(1), batch)
        outs[dt] = (new_state, metrics, state)

    np.testing.assert_allclose(float(outs["bfloat16"][1]["loss"]),
                               float(outs["float32"][1]["loss"]), rtol=1e-5)
    # Per-leaf relative error of the parameter UPDATE (not the params —
    # updates are ~1e-4 of param scale and carry all the signal).
    p0 = jax.tree.leaves(outs["float32"][2].params)
    pf = jax.tree.leaves(outs["float32"][0].params)
    pb = jax.tree.leaves(outs["bfloat16"][0].params)
    num = den = 0.0
    for a, f, b in zip(p0, pf, pb):
        num += float(jnp.sum(jnp.square((f - a) - (b - a))))
        den += float(jnp.sum(jnp.square(f - a)))
    rel = (num / max(den, 1e-30)) ** 0.5
    assert rel < 0.05, rel


def test_zero_sharding_places_moments_on_data_axis():
    mesh = mesh_lib.make_mesh(n_data=8, n_model=1)
    tree = {"a": jnp.zeros((16, 4)), "b": jnp.zeros((3,)), "c": jnp.zeros(())}
    sh = mesh_lib.zero_sharding(mesh, tree)
    assert sh["a"].spec == jax.sharding.PartitionSpec("data", None)
    assert sh["b"].spec == jax.sharding.PartitionSpec()  # 3 not divisible
    assert sh["c"].spec == jax.sharding.PartitionSpec()


def test_tp_sharded_serving_matches_single_device(rng):
    """Inference-time tensor parallelism: rdt_predict_action over TP-sharded
    params (the serving analogue of the TP train step — how a model larger
    than one chip, or a latency-critical deployment, serves on a mesh) must
    reproduce the single-device chunk."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = mesh_lib.make_mesh(n_data=2, n_model=4)
    params = R.init_rdt(RCFG, jax.random.PRNGKey(0))
    params["model"]["final_ffn"]["fc2"]["kernel"] = jnp.asarray(
        rng.normal(size=params["model"]["final_ffn"]["fc2"]["kernel"].shape)
        * 0.05, jnp.float32)

    m = TINY
    B, Ll = 2, 6
    lang = jnp.asarray(rng.normal(size=(B, Ll, m.lang_token_dim)), jnp.float32)
    lang_mask = jnp.ones((B, Ll), bool)
    img = jnp.asarray(rng.normal(size=(B, m.img_cond_len, m.img_token_dim)),
                      jnp.float32)
    state = jnp.asarray(rng.normal(size=(B, 1, m.state_token_dim)), jnp.float32)
    amask = jnp.ones((B, 1, m.output_dim), jnp.float32)
    freqs = jnp.full((B,), 10.0)
    noise = jnp.asarray(rng.normal(size=(B, m.horizon, m.output_dim)),
                        jnp.float32)

    want = R.rdt_predict_action(RCFG, params, jax.random.PRNGKey(1), lang,
                                lang_mask, img, state, amask, freqs,
                                init_noise=noise)

    sh = mesh_lib.rdt_param_shardings(mesh, params)
    params_tp = jax.tree.map(
        lambda p, s: jax.device_put(p, s), params, sh)
    rep = NamedSharding(mesh, P())
    args = [jax.device_put(x, rep)
            for x in (lang, lang_mask, img, state, amask, freqs, noise)]
    got = R.rdt_predict_action(RCFG, params_tp, jax.random.PRNGKey(1),
                               args[0], args[1], args[2], args[3], args[4],
                               args[5], init_noise=args[6])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_cross_topology_checkpoint_restore(rng, tmp_path):
    """Save a sharded train state at one topology (DP8 + ZeRO-3/FSDP),
    restore it at another (DP4 x TP2 ZeRO-2, and single-device), resume,
    and match the uninterrupted run — the reference's resume story is
    exactly 'come back on different hardware'
    (``/root/reference/VLA/train/train.py:347-389``).  Orbax restores each
    leaf with the TARGET tree's sharding regardless of the sharding it was
    saved under; two post-restore steps also exercise the restored
    optimizer moments (the second step's loss depends on them)."""
    import dataclasses

    from vla_touch_tpu.utils import checkpoint as ckpt
    from vla_touch_tpu.utils.ema import EmaState

    tcfg_z3 = dataclasses.replace(TCFG, zero3=True)
    k_step1, k_step2, k_step3 = (jax.random.PRNGKey(i) for i in (1, 2, 3))
    batch1 = _batch(rng, 2, 8)
    batch2 = _batch(rng, 2, 8)   # micro=8 divides both meshes' data axes
    batch3 = _batch(rng, 2, 8)

    # -- topology A: DP8, ZeRO-3 params/EMA, one step, save -------------------
    mesh_a = mesh_lib.make_mesh(n_data=8, n_model=1)
    state = T.init_train_state(RCFG, tcfg_z3, jax.random.PRNGKey(0))
    step_a, sh_a = T.make_sharded_train_step(mesh_a, RCFG, tcfg_z3)
    state = T.shard_train_state(mesh_a, state, sh_a)
    state, _ = step_a(state, k_step1, batch1)

    path = str(tmp_path / "ck" / "state.orbax")
    ckpt.save_pytree_orbax(path, {"params": state.params,
                                  "ema": state.ema.shadow,
                                  "opt_state": state.opt_state})
    meta = {"step": int(state.step),
            "ema_num_updates": int(state.ema.num_updates)}

    # -- oracle: the uninterrupted run continues on topology A ----------------
    state, m2 = step_a(state, k_step2, batch2)
    _, m3 = step_a(state, k_step3, batch3)
    want2, want3 = float(m2["loss"]), float(m3["loss"])

    def _resume(tree, state_t):
        return dataclasses.replace(
            state_t, params=tree["params"], opt_state=tree["opt_state"],
            ema=EmaState(shadow=tree["ema"],
                         num_updates=jnp.asarray(meta["ema_num_updates"],
                                                 jnp.int32)),
            step=jnp.asarray(meta["step"], jnp.int32))

    # -- topology B: DP4 x TP2, default (ZeRO-2) shardings --------------------
    mesh_b = mesh_lib.make_mesh(n_data=4, n_model=2)
    state_b = T.init_train_state(RCFG, TCFG, jax.random.PRNGKey(9))
    step_b, sh_b = T.make_sharded_train_step(mesh_b, RCFG, TCFG)
    state_b = T.shard_train_state(mesh_b, state_b, sh_b)
    tree_b = ckpt.load_pytree_orbax(path, {"params": state_b.params,
                                           "ema": state_b.ema.shadow,
                                           "opt_state": state_b.opt_state})
    state_b = _resume(tree_b, state_b)
    state_b, mb2 = step_b(state_b, k_step2, batch2)
    _, mb3 = step_b(state_b, k_step3, batch3)
    assert abs(float(mb2["loss"]) - want2) < 1e-5
    assert abs(float(mb3["loss"]) - want3) < 1e-5

    # -- topology C: plain single-device --------------------------------------
    state_c = T.init_train_state(RCFG, TCFG, jax.random.PRNGKey(11))
    tree_c = ckpt.load_pytree_orbax(path, {"params": state_c.params,
                                           "ema": state_c.ema.shadow,
                                           "opt_state": state_c.opt_state})
    state_c = _resume(tree_c, state_c)
    step_c = jax.jit(lambda s, k, b: T.train_step(RCFG, TCFG, s, k, b))
    state_c, mc2 = step_c(state_c, k_step2, batch2)
    _, mc3 = step_c(state_c, k_step3, batch3)
    assert abs(float(mc2["loss"]) - want2) < 1e-5
    assert abs(float(mc3["loss"]) - want3) < 1e-5
