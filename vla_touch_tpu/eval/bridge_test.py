"""Offline BRIDGeR evaluation harness.

Equivalent of ``/root/reference/VLA/residual_controller/bridge_test.py``
(`bridger_test` in the README): load a controller checkpoint and a
``ControllerDataModule`` val split, run the full predict stack on randomly
sampled windows, and report

    action MSE (refined vs expert), VLA MSE (raw vs expert), and
    % improvement = (1 − MSE_refined / MSE_VLA) · 100     (:195-202)

which is the conformance metric of BASELINE.md.
"""

from __future__ import annotations

import json
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vla_touch_tpu.data.controller_dataset import ControllerDataModule
from vla_touch_tpu.models.controllers import bridge as B
from vla_touch_tpu.models.encoders import dinov2_runtime as dino

logger = logging.getLogger("bridge_test")


def test_diffusion_controller(ckpt_path: str, data_dir: str,
                              num_samples: int = 50, seed: int = 0,
                              image_encoder_params: Optional[dict] = None,
                              state: Optional[B.BridgeControllerState] = None,
                              data_module: Optional[ControllerDataModule] = None,
                              diffuse_steps: Optional[int] = None,
                              visualize_dir: Optional[str] = None) -> dict:
    st = state if state is not None else B.load_bridge_controller(ckpt_path)
    ccfg = st.cfg
    dm = data_module or ControllerDataModule(
        data_dir, context_frames=ccfg.context_frames, horizon=ccfg.horizon,
        use_images=ccfg.use_visual, seed=42)
    ds = dm.val_dataset if (dm.val_dataset and len(dm.val_dataset)) else dm.train_dataset

    rng = np.random.default_rng(seed)
    idxs = rng.integers(0, len(ds), size=min(num_samples, len(ds)))
    samples = [ds[int(i)] for i in idxs]
    batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}

    ctx = ccfg.context_frames
    kw = {}
    if ccfg.use_visual:
        img_cfg = dino.config_for(ccfg.image_model)
        img_params = image_encoder_params
        if img_params is None and ckpt_path:
            img_params = dino.load_params(ckpt_path, ccfg.image_model)
        if img_params is None:
            logger.warning("no persisted image encoder in checkpoint; using "
                           "a random init — visual metrics are meaningless")
            img_params = dino.init_params(ccfg.image_model,
                                          jax.random.PRNGKey(7))
        kw["cam1_feat"] = dino.encode_images(
            img_cfg, img_params, jnp.asarray(batch["images_cam1"][:, -1]))
        kw["cam2_feat"] = dino.encode_images(
            img_cfg, img_params, jnp.asarray(batch["images_cam2"][:, -1]))
    if ccfg.use_force:
        kw["forces"] = jnp.asarray(batch["forces"][:, ctx - 1])

    refined = B.bridge_predict(
        ccfg, st.params, st.ema.shadow, st.stats, jax.random.PRNGKey(seed),
        jnp.asarray(batch["states"][:, ctx - 1]),
        jnp.asarray(batch["vla_actions"]),
        diffuse_steps=diffuse_steps, **kw)

    expert = batch["expert_actions"]
    vla = batch["vla_actions"]
    refined = np.asarray(refined)

    if visualize_dir:
        from vla_touch_tpu.eval.visualize import plot_samples

        plot_samples(expert, vla, refined, visualize_dir)

    action_mse = float(np.mean((refined - expert) ** 2))
    vla_mse = float(np.mean((vla - expert) ** 2))
    improvement = (1.0 - action_mse / vla_mse) * 100.0 if vla_mse > 0 else 0.0
    result = {
        "action_mse": action_mse,
        "vla_mse": vla_mse,
        "improvement_pct": improvement,
        "num_samples": len(samples),
    }
    logger.info("bridge_test: %s", json.dumps(result))
    print(f"Refined action MSE vs expert: {action_mse:.6f}")
    print(f"VLA action MSE vs expert:     {vla_mse:.6f}")
    print(f"Improvement: {improvement:.2f}%")
    return result


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="Evaluate a BRIDGeR checkpoint")
    p.add_argument("--ckpt_path", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--num_samples", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--diffuse_steps", type=int, default=None)
    p.add_argument("--visualize_dir", default=None,
                   help="write 4-panel trajectory plots here")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    test_diffusion_controller(args.ckpt_path, args.data_dir,
                              args.num_samples, args.seed,
                              diffuse_steps=args.diffuse_steps,
                              visualize_dir=args.visualize_dir)


if __name__ == "__main__":
    main()
