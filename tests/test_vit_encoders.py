"""Vision encoder parity vs randomly-initialized HF torch models (the same
modeling code the reference loads pretrained weights into)."""

import numpy as np
import pytest
import torch

from vla_touch_tpu.models.encoders import vit as V
from vla_touch_tpu.utils import torch_port as tp

transformers = pytest.importorskip("transformers")

torch.manual_seed(0)


def test_dinov2_parity_small_config(rng):
    from transformers import Dinov2Config, Dinov2Model

    cfg_hf = Dinov2Config(hidden_size=64, num_hidden_layers=3,
                          num_attention_heads=4, mlp_ratio=4,
                          image_size=56, patch_size=14)
    ref = Dinov2Model(cfg_hf).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = V.ViTConfig(hidden_size=64, num_layers=3, num_heads=4, mlp_dim=256,
                      image_size=56, patch_size=14)
    params = tp.dinov2_from_hf(sd, num_layers=3)

    x = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        out = ref(pixel_values=torch.from_numpy(x).permute(0, 3, 1, 2))
    want_pool = out.pooler_output.numpy()
    want_tokens = out.last_hidden_state.numpy()

    import jax.numpy as jnp

    got_tokens = V.ViTEncoder(cfg).apply({"params": params["vit"]},
                                         jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_tokens), want_tokens,
                               atol=1e-4, rtol=1e-4)
    got_pool = V.DinoV2Encoder(cfg).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_pool), want_pool,
                               atol=1e-4, rtol=1e-4)


def test_dinov2_pos_interpolation_close_to_hf(rng):
    """Feeding a different resolution triggers pos-embed interpolation; HF
    uses torch bicubic — ours is jax bicubic; require close agreement."""
    from transformers import Dinov2Config, Dinov2Model

    cfg_hf = Dinov2Config(hidden_size=64, num_hidden_layers=2,
                          num_attention_heads=4, mlp_ratio=4,
                          image_size=70, patch_size=14)
    ref = Dinov2Model(cfg_hf).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = V.ViTConfig(hidden_size=64, num_layers=2, num_heads=4, mlp_dim=256,
                      image_size=70, patch_size=14)
    params = tp.dinov2_from_hf(sd, num_layers=2)

    x = rng.normal(size=(1, 42, 42, 3)).astype(np.float32)  # 3x3 grid vs 5x5
    with torch.no_grad():
        want = ref(pixel_values=torch.from_numpy(x).permute(0, 3, 1, 2))
    import jax.numpy as jnp

    got = V.DinoV2Encoder(cfg).apply({"params": params}, jnp.asarray(x))
    err = np.abs(np.asarray(got) - want.pooler_output.numpy()).max()
    scale = np.abs(want.pooler_output.numpy()).max()
    assert err / scale < 0.05, (err, scale)


def test_siglip_parity_small_config(rng):
    from transformers import SiglipVisionConfig, SiglipVisionModel

    cfg_hf = SiglipVisionConfig(hidden_size=64, num_hidden_layers=3,
                                num_attention_heads=4, intermediate_size=128,
                                image_size=56, patch_size=14)
    ref = SiglipVisionModel(cfg_hf).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = V.ViTConfig(hidden_size=64, num_layers=3, num_heads=4, mlp_dim=128,
                      image_size=56, patch_size=14, use_cls_token=False,
                      use_layerscale=False, gelu_tanh=True)
    params = tp.siglip_from_hf(sd, num_layers=3)

    x = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        out = ref(pixel_values=torch.from_numpy(x).permute(0, 3, 1, 2))
    want = out.last_hidden_state.numpy()

    import jax.numpy as jnp

    got = V.SiglipVisionEncoder(cfg).apply({"params": params}, jnp.asarray(x))
    assert got.shape == want.shape == (2, 16, 64)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_full_size_configs_shapes():
    assert V.DINOV2_SMALL.hidden_size == 384
    assert V.SIGLIP_SO400M.hidden_size == 1152
    # 384/14 = 27.43 -> SigLIP so400m-patch14-384 actually uses 27x27 = 729.
    assert (V.SIGLIP_SO400M.image_size // V.SIGLIP_SO400M.patch_size) ** 2 == 729
