"""RDT finetuning: sharded data-parallel (+ optional tensor-parallel) training.

TPU-native replacement for the reference's accelerate+DeepSpeed loop
(``/root/reference/VLA/train/train.py:75-510``):

- one jitted ``train_step`` containing grad-accumulation (``lax.scan`` over
  microbatches ≙ ``accelerator.accumulate``, ``train.py:406``), global-norm
  clipping (``:443``), AdamW, and the warmup-scheduled EMA (``:448``);
- gradients all-reduce implicitly through pjit sharded autodiff over the
  ``data`` mesh axis (≙ DeepSpeed ZeRO-2 NCCL all-reduce, ``finetune.sh``);
- optimizer moments sharded over the data axis (ZeRO-2 analogue) and
  parameters optionally tensor-parallel over the ``model`` axis.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from vla_touch_tpu.config import TrainConfig
from vla_touch_tpu.models.rdt import runner as R
from vla_touch_tpu.parallel import mesh as mesh_lib
from vla_touch_tpu.utils import ema as ema_lib


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: dict
    opt_state: tuple
    ema: ema_lib.EmaState
    step: jax.Array  # int32


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.lr_scheduler == "constant":
        lr = optax.schedules.join_schedules(
            [optax.schedules.linear_schedule(0.0, cfg.learning_rate,
                                             cfg.lr_warmup_steps),
             optax.schedules.constant_schedule(cfg.learning_rate)],
            [cfg.lr_warmup_steps],
        )
    elif cfg.lr_scheduler == "constant_with_warmup":
        # alias of "constant" above (both warm up; diffusers names differ)
        lr = optax.schedules.join_schedules(
            [optax.schedules.linear_schedule(0.0, cfg.learning_rate,
                                             cfg.lr_warmup_steps),
             optax.schedules.constant_schedule(cfg.learning_rate)],
            [cfg.lr_warmup_steps],
        )
    elif cfg.lr_scheduler == "linear":
        lr = optax.schedules.join_schedules(
            [optax.schedules.linear_schedule(0.0, cfg.learning_rate,
                                             cfg.lr_warmup_steps),
             optax.schedules.linear_schedule(
                 cfg.learning_rate, 0.0,
                 max(cfg.max_train_steps - cfg.lr_warmup_steps, 1))],
            [cfg.lr_warmup_steps],
        )
    elif cfg.lr_scheduler == "cosine":
        lr = optax.schedules.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.lr_warmup_steps, cfg.max_train_steps)
    else:
        raise ValueError(cfg.lr_scheduler)
    if cfg.use_8bit_adam:
        from vla_touch_tpu.ops.adam8bit import adamw8bit

        inner = adamw8bit(lr, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                          eps=cfg.adam_epsilon,
                          weight_decay=cfg.weight_decay)
    else:
        inner = optax.adamw(lr, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                            eps=cfg.adam_epsilon,
                            weight_decay=cfg.weight_decay)
    return optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), inner)


def init_train_state(rcfg: R.RDTRunnerConfig, tcfg: TrainConfig, key,
                     params: Optional[dict] = None) -> TrainState:
    if params is None:
        params = R.init_rdt(rcfg, key)
    if tcfg.param_dtype != "float32":
        if not tcfg.use_8bit_adam:
            raise ValueError(
                "param_dtype='bfloat16' stores NO f32 master copy; plain "
                "optax.adamw would then keep bf16 moments. Use "
                "use_8bit_adam=True (int8 moments, f32 update math).")
        params = jax.tree.map(
            lambda p: p.astype(jnp.dtype(tcfg.param_dtype)), params)
    opt = make_optimizer(tcfg)
    return TrainState(
        params=params,
        opt_state=opt.init(params),
        ema=ema_lib.init(params, dtype=jnp.dtype(tcfg.ema_dtype)),
        step=jnp.zeros((), jnp.int32),
    )


def train_step(rcfg: R.RDTRunnerConfig, tcfg: TrainConfig,
               state: TrainState, key, batch):
    """One optimizer step over ``grad_accum`` microbatches.

    ``batch`` leaves are shaped (grad_accum, micro_batch, ...); use
    ``grad_accum=1`` leading dim for no accumulation.
    """
    opt = make_optimizer(tcfg)

    def micro_loss(params, mb, k):
        return R.rdt_compute_loss(rcfg, params, k, mb)

    grad_fn = jax.value_and_grad(micro_loss)
    n_micro = jax.tree.leaves(batch)[0].shape[0]
    key, k_ema, k_apply = jax.random.split(key, 3)
    keys = jax.random.split(key, n_micro)

    # Accumulator dtype: f32 by default; bf16 halves accumulator HBM so the
    # 1B model's accum>=4 operating point (finetune.sh bs4xaccum4) fits one
    # 16 GB chip.  Micro-grads are cast as they are produced (the casts fuse
    # into the backward kernels, so the full f32 grad tree never coexists
    # with the accumulator); the mean is taken back in f32 for the optimizer.
    acc_dtype = jnp.dtype(tcfg.accum_dtype)

    def accum(carry, xs):
        g_acc, loss_acc = carry
        mb, k = xs
        loss, g = grad_fn(state.params, mb, k)
        g_acc = jax.tree.map(lambda a, gi: a + gi.astype(acc_dtype), g_acc, g)
        return (g_acc, loss_acc + loss), None

    g0 = jax.tree.map(lambda p: jnp.zeros(p.shape, acc_dtype), state.params)
    (g_sum, loss_sum), _ = jax.lax.scan(accum, (g0, 0.0), (batch, keys))
    grads = jax.tree.map(lambda g: g.astype(jnp.float32) / n_micro, g_sum)
    loss = loss_sum / n_micro

    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    if tcfg.param_dtype == "bfloat16":
        # No f32 master: per-step updates (~1e-4 x lr of param scale) are
        # far below one bf16 ulp, so a nearest-rounded apply would stall.
        # Stochastic rounding keeps E[p_t] on the f32 trajectory (the
        # standard pure-bf16-training recipe; see utils/ema.py).
        p_leaves, treedef = jax.tree.flatten(state.params)
        u_leaves = jax.tree.leaves(updates)
        a_keys = jax.random.split(k_apply, len(p_leaves))
        params = jax.tree.unflatten(treedef, [
            ema_lib.stochastic_round_bf16(
                k, p.astype(jnp.float32) + u.astype(jnp.float32))
            for p, u, k in zip(p_leaves, u_leaves, a_keys)])
    else:
        params = optax.apply_updates(state.params, updates)
    decay = ema_lib.rdt_ema_decay(state.step, inv_gamma=tcfg.ema_inv_gamma,
                                  power=tcfg.ema_power,
                                  max_value=tcfg.ema_decay)
    new_ema = ema_lib.update(state.ema, params, decay,
                             key=(k_ema if tcfg.ema_dtype == "bfloat16"
                                  else None))
    new_state = TrainState(params=params, opt_state=opt_state, ema=new_ema,
                           step=state.step + 1)
    metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
    return new_state, metrics


def make_sharded_train_step(mesh, rcfg: R.RDTRunnerConfig, tcfg: TrainConfig):
    """Jit ``train_step`` over the mesh: params TP-or-replicated, optimizer
    moments ZeRO-sharded over data, batch sharded over data."""
    params_shape = jax.eval_shape(
        lambda k: R.init_rdt(rcfg, k), jax.random.PRNGKey(0))
    # ZeRO-3 (tcfg.zero3): parameters AND the EMA shadow live sharded over
    # the data axis; GSPMD all-gathers weights per layer in fwd/bwd and
    # reduce-scatters grads.  Default: TP-or-replicated params (ZeRO-2,
    # moments-only sharding — the reference's DeepSpeed ceiling).
    if tcfg.zero3:
        param_sh = mesh_lib.fsdp_param_shardings(mesh, params_shape)
    else:
        param_sh = mesh_lib.rdt_param_shardings(mesh, params_shape)

    opt = make_optimizer(tcfg)
    opt_shape = jax.eval_shape(opt.init, params_shape)
    opt_sh = mesh_lib.zero_sharding(mesh, opt_shape)
    ema_sh = ema_lib.EmaState(
        # zero3: the shadow shards exactly like the params it mirrors.
        shadow=(param_sh if tcfg.zero3
                else mesh_lib.zero_sharding(mesh, params_shape)),
        num_updates=mesh_lib.replicated(mesh),
    )
    state_sh = TrainState(params=param_sh, opt_state=opt_sh, ema=ema_sh,
                          step=mesh_lib.replicated(mesh))

    # Batch: (accum, micro_batch, ...) with micro_batch sharded over data.
    batch_spec = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, mesh_lib.DATA_AXIS))

    step_fn = jax.jit(
        partial(train_step, rcfg, tcfg),
        in_shardings=(state_sh, mesh_lib.replicated(mesh), batch_spec),
        out_shardings=(state_sh, mesh_lib.replicated(mesh)),
        donate_argnums=(0,),
    )
    return step_fn, state_sh


def shard_train_state(mesh, state: TrainState, state_sh: TrainState) -> TrainState:
    """Place a host-initialized state onto the mesh with the step's shardings."""
    return jax.tree.map(jax.device_put, state, state_sh)
