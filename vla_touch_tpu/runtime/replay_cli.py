"""Deployment replay CLI.

The offline equivalent of the reference's ``inference.sh`` →
``model_inference`` entry (``frank_inference_eef.py:340-577``): run the full
VLA + refinement control loop against a recorded episode instead of ROS,
reporting tracking MSE and per-stage latencies.

    python -m vla_touch_tpu.runtime.replay_cli --episode ep.h5 \
        [--rdt_checkpoint model.safetensors] [--refiner bridge|lstm|none] \
        [--bridge_ckpt dir] [--lstm_ckpt dir] [--instruction "wipe the table"]
"""

from __future__ import annotations

import argparse
import json
import logging

import jax
import jax.numpy as jnp
import numpy as np

from vla_touch_tpu.runtime.control_loop import (
    ChunkScheduler,
    ControlLoopConfig,
    EpisodeReplay,
)
from vla_touch_tpu.utils import profiling as prof

logger = logging.getLogger("replay")


def build_scheduler(args, replay) -> ChunkScheduler:
    import h5py

    from vla_touch_tpu.runtime import policy as P

    cfg = P.PolicyConfig()
    if args.rdt_checkpoint:
        from vla_touch_tpu.utils.torch_port import load_rdt_checkpoint

        rdt_params = load_rdt_checkpoint(args.rdt_checkpoint,
                                         depth=cfg.rdt.model.depth)
        model = P.RoboticDiffusionTransformerModel.create(
            cfg, rdt_params=jax.tree.map(
                lambda x: jnp.asarray(x, jnp.bfloat16), rdt_params))
    else:
        logger.warning("no --rdt_checkpoint: using randomly initialized RDT")
        model = P.create_model(cfg, seed=0)

    with h5py.File(replay.path, "r") as f:
        text = np.asarray(f["instruct_embeddings"])[0]

    def plan_fn(window):
        with prof.stage("vla_plan"):
            chunk = model.step(window.current.state, window.image_sequence(),
                               text)
        return chunk[0]

    plan_warm_fn = None
    if getattr(args, "warm_skip", 0) > 0:
        def plan_warm_fn(window, prior):
            with prof.stage("vla_plan_warm"):
                chunk = model.step(window.current.state,
                                   window.image_sequence(), text,
                                   prior_actions=prior,
                                   skip_steps=args.warm_skip)
            return chunk[0]

    bridge_fn = None
    lstm_fn = None
    def _prep_cam(img, size=384):
        # Controllers train on 384-square pad-resized frames
        # (camera*_resized); deployment must match that distribution.
        from vla_touch_tpu.utils.image import pad_and_resize_for_siglip

        return jnp.asarray(
            pad_and_resize_for_siglip(np.asarray(img), size).astype(
                np.float32)[None] / 255.0)

    def _load_encoder(ckpt_dir, image_model):
        from vla_touch_tpu.models.encoders import dinov2_runtime as dino

        params = dino.load_params(ckpt_dir, image_model)
        if params is None:
            logger.warning("checkpoint has no persisted image encoder; "
                           "using random init")
            params = dino.init_params(image_model, jax.random.PRNGKey(7))
        return params

    if args.refiner == "bridge":
        from vla_touch_tpu.models.controllers import bridge as BR
        from vla_touch_tpu.models.encoders import dinov2_runtime as dino

        st = BR.load_bridge_controller(args.bridge_ckpt)
        img_cfg = dino.config_for(st.cfg.image_model)
        img_params = _load_encoder(args.bridge_ckpt, st.cfg.image_model)

        def bridge_fn(obs, chunk_window):
            with prof.stage("bridge_refine"):
                kw = {}
                if st.cfg.use_visual:
                    f1 = dino.encode_images(img_cfg, img_params,
                                            _prep_cam(obs.images[0]))
                    f2 = dino.encode_images(img_cfg, img_params,
                                            _prep_cam(obs.images[1]))
                    kw = dict(cam1_feat=f1, cam2_feat=f2)
                if st.cfg.use_force:
                    kw["forces"] = jnp.asarray(obs.force[None], jnp.float32)
                out = BR.bridge_predict(
                    st.cfg, st.params, st.ema.shadow, st.stats,
                    jax.random.PRNGKey(0),
                    jnp.asarray(obs.state[None], jnp.float32),
                    jnp.asarray(chunk_window[None], jnp.float32), **kw)
            return np.asarray(out)[0]

    elif args.refiner == "lstm":
        from vla_touch_tpu.models.controllers import lstm as LC
        from vla_touch_tpu.models.encoders import dinov2_runtime as dino
        from vla_touch_tpu.utils.normalization import normalize_actions

        st = LC.load_lstm_controller(args.lstm_ckpt)
        img_cfg = dino.config_for(st.cfg.image_model)
        img_params = _load_encoder(args.lstm_ckpt, st.cfg.image_model)
        module = LC.LSTMControllerModule(st.cfg)
        obs_cond_holder = {}

        def lstm_fn(carry, obs, action, first):
            with prof.stage("lstm_step"):
                if first or carry is None:
                    carry = module.bind({"params": st.params}).init_carry(1)
                    f1 = dino.encode_images(img_cfg, img_params,
                                            _prep_cam(obs.images[0]))
                    f2 = dino.encode_images(img_cfg, img_params,
                                            _prep_cam(obs.images[1]))
                    obs_cond_holder["v"] = LC.lstm_encode_obs(
                        st.cfg, st.params,
                        jnp.asarray(obs.state[None], jnp.float32), f1, f2)
                act_n = normalize_actions(
                    jnp.asarray(action[None], jnp.float32), st.stats, "vla")
                carry, refined = LC.lstm_step_predict(
                    st.cfg, st.params, st.stats, carry, obs_cond_holder["v"],
                    act_n, jnp.asarray(obs.force[None], jnp.float32))
            return carry, np.asarray(refined)[0]

    loop_cfg = ControlLoopConfig(
        chunk_size=cfg.rdt.model.horizon, replan_interval=args.replan_interval,
        refiner=args.refiner, refine_horizon=args.refine_horizon,
        gripper_deadband=args.gripper_deadband)
    return ChunkScheduler(loop_cfg, plan_fn, bridge_refine_fn=bridge_fn,
                          lstm_step_fn=lstm_fn, plan_warm_fn=plan_warm_fn)


def main(argv=None):
    p = argparse.ArgumentParser(description="Replay the control loop over a "
                                            "recorded episode")
    p.add_argument("--episode", required=True)
    p.add_argument("--rdt_checkpoint", default=None)
    p.add_argument("--refiner", choices=["none", "bridge", "lstm"],
                   default="none")
    p.add_argument("--bridge_ckpt", default=None)
    p.add_argument("--lstm_ckpt", default=None)
    p.add_argument("--replan_interval", type=int, default=16)
    p.add_argument("--warm_skip", type=int, default=0,
                   help="warm-start replans: skip this many solver steps, "
                        "seeding from the previous (shifted) chunk")
    p.add_argument("--refine_horizon", type=int, default=16)
    p.add_argument("--gripper_deadband", type=float, default=2.0)
    p.add_argument("--steps", type=int, default=None)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    replay = EpisodeReplay(args.episode)
    sched = build_scheduler(args, replay)
    result = replay.run(sched, steps=args.steps)
    report = {
        "steps": result["steps"],
        "tracking_mse": result["tracking_mse"],
        "stages": prof.stage_stats(reset=True),
    }
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
