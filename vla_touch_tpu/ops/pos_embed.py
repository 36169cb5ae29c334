"""Sin/cos positional-embedding generators.

Numpy-level (init-time) equivalents of the reference's embedding constructors
(``/root/reference/VLA/models/rdt/blocks.py:209-306``) plus the jittable
GLIDE-style scalar timestep embedding (``blocks.py:42-61``).  Two different
conventions coexist in the reference and are preserved here:

- grid embeds (MAE style): ``concat([sin, cos])``
- timestep embeds (GLIDE style): ``concat([cos, sin])``
"""

from __future__ import annotations

import math
from collections import OrderedDict

import jax.numpy as jnp
import numpy as np


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos) -> np.ndarray:
    """MAE-style 1-D sincos table: (M,) positions -> (M, embed_dim)."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    pos = np.asarray(pos, dtype=np.float64).reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_nd_sincos_pos_embed_from_grid(embed_dim: int, grid_sizes) -> np.ndarray:
    """N-D sincos table over a grid; dims with size <= 1 carry no embedding.

    Returns shape ``grid_sizes + (embed_dim,)``.
    """
    grid_sizes = tuple(grid_sizes)
    num_valid = len([s for s in grid_sizes if s > 1])
    emb = np.zeros(grid_sizes + (embed_dim,))
    dim_per_grid = embed_dim // max(num_valid, 1)
    if dim_per_grid % 2 != 0:
        dim_per_grid -= 1
    valid_idx = 0
    for axis, size in enumerate(grid_sizes):
        if size <= 1:
            continue
        table = get_1d_sincos_pos_embed_from_grid(dim_per_grid, np.arange(size))
        shape = [1] * len(grid_sizes) + [dim_per_grid]
        shape[axis] = -1
        emb[..., valid_idx * dim_per_grid:(valid_idx + 1) * dim_per_grid] += (
            table.reshape(shape)
        )
        valid_idx += 1
    return emb


def get_multimodal_cond_pos_embed(embed_dim: int, mm_cond_lens: OrderedDict,
                                  embed_modality: bool = True) -> np.ndarray:
    """Concatenated per-modality positional embeddings.

    Each (modality, length) entry contributes ``|length|`` rows.  When
    ``embed_modality``, the first half of the channel dim encodes which
    modality a token belongs to, the second half its position within the
    modality; otherwise the full width is positional.  ``image`` modalities
    may pass a tuple of grid sizes (negative size = no embedding for that
    grid axis).  Mirrors ``blocks.py:261-306``.
    """
    num_modalities = len(mm_cond_lens)
    modality_pos_embed = np.zeros((num_modalities, embed_dim))
    if embed_modality:
        modality_pos_embed[:, : embed_dim // 2] = get_1d_sincos_pos_embed_from_grid(
            embed_dim // 2, np.arange(num_modalities)
        )
        pos_dim = embed_dim // 2
    else:
        pos_dim = embed_dim

    rows = []
    for idx, (modality, cond_len) in enumerate(mm_cond_lens.items()):
        if modality == "image" and isinstance(cond_len, (tuple, list)):
            all_sizes = tuple(abs(x) for x in cond_len)
            embed_sizes = tuple(x if x > 0 else 1 for x in cond_len)
            grid_embed = get_nd_sincos_pos_embed_from_grid(pos_dim, embed_sizes)
            block = np.zeros(all_sizes + (embed_dim,))
            block[..., -pos_dim:] += grid_embed
            block = block.reshape(-1, embed_dim)
        else:
            n = cond_len if cond_len > 0 else 1
            table = get_1d_sincos_pos_embed_from_grid(pos_dim, np.arange(n))
            block = np.zeros((abs(cond_len), embed_dim))
            block[:, -pos_dim:] += table
        block = block + modality_pos_embed[idx]
        rows.append(block)
    return np.concatenate(rows, axis=0)


def timestep_embedding(t, dim: int, max_period: float = 10000.0,
                       dtype=jnp.float32):
    """GLIDE-style scalar embedding (jittable): (N,) -> (N, dim).

    ``concat([cos, sin])`` order, matching ``blocks.py:42-61``.  ``t`` may be
    fractional (e.g. SDE time in [0, 1] scaled by the caller).
    """
    t = jnp.asarray(t, dtype=jnp.float32)
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb.astype(dtype)


def sinusoidal_pos_emb(t, dim: int, dtype=jnp.float32):
    """Diffusion-policy UNet timestep embedding (jittable): (N,) -> (N, dim).

    ``concat([sin, cos])`` with a ``half_dim - 1`` denominator, matching the
    controller UNet's ``SinusoidalPosEmb``
    (``conditional_unet_1D.py:7-19``) — note this differs from
    :func:`timestep_embedding` in both ordering and frequency spacing.
    """
    t = jnp.asarray(t, dtype=jnp.float32)
    half = dim // 2
    emb_scale = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb_scale)
    args = t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1).astype(dtype)
