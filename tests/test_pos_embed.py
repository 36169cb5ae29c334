"""Positional-embedding parity vs an independent torch/numpy transcription of
the documented reference formulas (blocks.py:42-61, 209-306)."""

import math
from collections import OrderedDict

import numpy as np
import torch

from vla_touch_tpu.ops import pos_embed as PE


def _ref_1d(embed_dim, pos):
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    pos = np.asarray(pos, dtype=np.float64).reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def test_1d_sincos():
    got = PE.get_1d_sincos_pos_embed_from_grid(64, np.arange(100))
    np.testing.assert_allclose(got, _ref_1d(64, np.arange(100)), atol=1e-12)


def test_multimodal_x_pos_embed_shape_and_modality_split():
    # The RDT input sequence: [timestep, ctrl_freq, state, action x horizon]
    emb = PE.get_multimodal_cond_pos_embed(
        embed_dim=1152,
        mm_cond_lens=OrderedDict(
            [("timestep", 1), ("ctrl_freq", 1), ("state", 1), ("action", 32)]
        ),
    )
    assert emb.shape == (35, 1152)
    # First half channels encode modality: identical within the action block.
    assert np.allclose(emb[3, :576], emb[10, :576])
    # ...and different across modalities.
    assert not np.allclose(emb[0, :576], emb[1, :576])
    # Second half encodes position: actions at different steps differ.
    assert not np.allclose(emb[3, 576:], emb[4, 576:])


def test_image_grid_embed():
    emb = PE.get_multimodal_cond_pos_embed(
        embed_dim=64,
        mm_cond_lens=OrderedDict([("image", (2, 1, 3, 3))]),
        embed_modality=False,
    )
    assert emb.shape == (2 * 1 * 3 * 3, 64)
    # Negative size = no positional embedding for that axis.
    emb2 = PE.get_multimodal_cond_pos_embed(
        embed_dim=64,
        mm_cond_lens=OrderedDict([("image", (-2, 1, 3, 3))]),
        embed_modality=False,
    )
    assert emb2.shape == (2 * 9, 64)
    np.testing.assert_allclose(emb2[:9], emb2[9:], atol=1e-12)


def _torch_glide_timestep(t, dim, max_period=10000):
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period)
        * torch.arange(start=0, end=half, dtype=torch.float32) / half
    )
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def test_glide_timestep_embedding_matches_torch():
    t = torch.tensor([0.0, 1.0, 5.0, 999.0])
    ref = _torch_glide_timestep(t, 256).numpy()
    got = np.asarray(PE.timestep_embedding(t.numpy(), 256))
    # XLA and torch use different float32 sin/cos implementations; at t=999
    # the argument reduction differs by a few ULP, hence the loose atol.
    np.testing.assert_allclose(got, ref, atol=3e-3)
    np.testing.assert_allclose(got[:3], ref[:3], atol=1e-5)


def _torch_sinusoidal(x, dim):
    half_dim = dim // 2
    emb = math.log(10000) / (half_dim - 1)
    emb = torch.exp(torch.arange(half_dim) * -emb)
    emb = x[:, None] * emb[None, :]
    return torch.cat((emb.sin(), emb.cos()), dim=-1)


def test_unet_sinusoidal_matches_torch():
    x = torch.tensor([0.1, 0.5, 0.77, 1.0])
    ref = _torch_sinusoidal(x, 256).numpy()
    got = np.asarray(PE.sinusoidal_pos_emb(x.numpy(), 256))
    np.testing.assert_allclose(got, ref, atol=1e-5)
