"""Serving twin of the ViT towers vs the flax module (tiny configs).

The twin's math must match the flax ``ViTEncoder`` bit-for-class: bf16
tree ≈ bf16 flax forward, int8 tree within the quantization error class
the RDT tiers carry (the end-to-end gate lives in bench.py on the refined
chunk; here we bound the per-tower error)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vla_touch_tpu.models.encoders import vit as V
from vla_touch_tpu.models.encoders import vit_serve as VS


def _tiny_cfg(**kw):
    base = dict(hidden_size=64, num_layers=3, num_heads=4, mlp_dim=128,
                image_size=56, patch_size=14, use_cls_token=False,
                use_layerscale=False, gelu_tanh=True)
    base.update(kw)
    return V.ViTConfig(**base)


def _init(cfg, seed=0, batch=2):
    enc = V.SiglipVisionEncoder(cfg) if not cfg.use_cls_token else None
    S = cfg.image_size
    x = np.random.default_rng(seed).normal(
        size=(batch, S, S, 3)).astype(np.float32)
    if enc is None:
        enc = V.SiglipVisionEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(seed), jnp.asarray(x))["params"]
    return enc, params, x


@pytest.mark.parametrize("cfg", [
    _tiny_cfg(),                                        # SigLIP class
    _tiny_cfg(use_cls_token=True, use_layerscale=True,  # DinoV2 class
              gelu_tanh=False),
    _tiny_cfg(use_pre_norm=True, quick_gelu=True),      # CLIP class
])
def test_serve_bf16_matches_flax(cfg):
    enc, params, x = _init(cfg)
    want = enc.apply({"params": params}, jnp.asarray(x))
    if cfg.use_cls_token:
        want = V.ViTEncoder(cfg).apply({"params": params["vit"]},
                                       jnp.asarray(x))
    sp = VS.quantize_vit_params(params, weights="bf16")
    assert VS.is_vit_serve_tree(sp) and not VS.is_vit_serve_tree(params)
    got = VS.vit_encode_serve(cfg, sp, jnp.asarray(x))
    assert got.shape == want.shape
    # bf16 forward vs f32 flax forward: bf16 rounding class
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want)).max()
    assert err < 0.1, err
    c = np.corrcoef(np.asarray(got, np.float32).ravel(),
                    np.asarray(want).ravel())[0, 1]
    assert c > 0.9999, c


def test_serve_int8_close_to_flax():
    cfg = _tiny_cfg()
    enc, params, x = _init(cfg)
    want = np.asarray(enc.apply({"params": params}, jnp.asarray(x)))
    qp = VS.quantize_vit_params(params, weights="int8")
    assert VS.is_vit_serve_tree(qp)
    got = np.asarray(VS.vit_encode_serve(cfg, qp, jnp.asarray(x)),
                     np.float32)
    c = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert c > 0.995, c


def test_policy_routes_quant_vision_tree():
    """policy_step with a quantized vision tree must produce the same
    chunk class as the flax tree (tiny config end-to-end)."""
    from vla_touch_tpu.config import NoiseSchedulerConfig, rdt_tiny
    from vla_touch_tpu.models.rdt import runner as R
    from vla_touch_tpu.runtime import policy as P

    rcfg = R.RDTRunnerConfig(model=rdt_tiny(), noise=NoiseSchedulerConfig())
    m = rcfg.model
    vcfg = V.ViTConfig(hidden_size=m.img_token_dim, num_layers=1,
                       num_heads=4, mlp_dim=64, image_size=28,
                       patch_size=14, use_cls_token=False,
                       use_layerscale=False, gelu_tanh=True)
    pcfg = P.PolicyConfig(rdt=rcfg, vision=vcfg, image_size=28)
    rng = np.random.default_rng(0)
    rp = jax.jit(lambda k: R.init_rdt(rcfg, k))(jax.random.PRNGKey(0))
    S = pcfg.image_size
    vp = V.SiglipVisionEncoder(vcfg).init(
        jax.random.PRNGKey(1), jnp.zeros((1, S, S, 3)))["params"]
    frames = jnp.asarray(rng.integers(0, 256, (1, 6, S, S, 3)), jnp.uint8)
    fmask = jnp.ones((1, 6), bool)
    proprio = jnp.asarray(rng.normal(size=(1, 10)), jnp.float32)
    lang = jnp.asarray(rng.normal(size=(1, 8, m.lang_token_dim)), jnp.float32)
    lmask = jnp.ones((1, 8), bool)
    key = jax.random.PRNGKey(2)

    base = np.asarray(P.policy_step(pcfg, rp, vp, key, proprio, frames,
                                    fmask, lang, lmask))
    qvp = VS.quantize_vit_params(vp, weights="bf16")
    got = np.asarray(P.policy_step(pcfg, rp, qvp, key, proprio, frames,
                                   fmask, lang, lmask))
    assert base.shape == got.shape
    err = np.abs(base - got).max() / max(np.abs(base).max(), 1e-6)
    assert err < 0.05, err
    # background-token splice works through the serve tree too
    bg = P.encode_background_tokens(pcfg, qvp)
    got2 = np.asarray(P.policy_step(pcfg, rp, qvp, key, proprio, frames,
                                    fmask, lang, lmask, absent=(2, 5),
                                    bg_tokens=bg))
    assert got2.shape == base.shape
