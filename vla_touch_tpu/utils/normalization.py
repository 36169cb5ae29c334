"""Padded min-max action normalization.

JAX equivalent of the reference's controller normalization
(``/root/reference/VLA/residual_controller/controller_dataset.py:303-384``):
the per-dimension [min, max] range observed in the training data is expanded
by ``padding_factor`` (default 1.4) around its center, then mapped to [-1, 1].
This keeps reasonable out-of-distribution actions inside the normalized cube.

Stats are a dict with keys ``{action,vla}_{mins,maxs}`` (plus optional
``*_range``), one vector per action dimension.
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np

DEFAULT_PADDING_FACTOR = 1.4
_EPS = 1e-6


def _padded_bounds(mins, maxs, padding_factor: float):
    mins = jnp.asarray(mins, dtype=jnp.float32)
    maxs = jnp.asarray(maxs, dtype=jnp.float32)
    center = (mins + maxs) / 2.0
    padded_range = (maxs - mins) * padding_factor
    padded_mins = center - padded_range / 2.0
    safe_range = jnp.where(padded_range < _EPS, 1.0, padded_range)
    return padded_mins, safe_range


def _select_stats(stats: Mapping, action_type: str):
    if action_type == "expert":
        return stats["action_mins"], stats["action_maxs"]
    if action_type == "vla":
        return stats["vla_mins"], stats["vla_maxs"]
    raise ValueError(f"Unknown action_type: {action_type}. Use 'expert' or 'vla'.")


def normalize_actions(actions, stats: Mapping, action_type: str = "expert",
                      padding_factor: float = DEFAULT_PADDING_FACTOR):
    """Map actions into [-1, 1] using the padded per-dim range."""
    mins, maxs = _select_stats(stats, action_type)
    padded_mins, safe_range = _padded_bounds(mins, maxs, padding_factor)
    return 2.0 * (actions - padded_mins) / safe_range - 1.0


def denormalize_actions(normalized, stats: Mapping, action_type: str = "expert",
                        padding_factor: float = DEFAULT_PADDING_FACTOR):
    """Inverse of :func:`normalize_actions`."""
    mins, maxs = _select_stats(stats, action_type)
    padded_mins, safe_range = _padded_bounds(mins, maxs, padding_factor)
    return (normalized + 1.0) / 2.0 * safe_range + padded_mins


def compute_minmax_stats(expert_actions: np.ndarray, vla_actions: np.ndarray) -> dict:
    """Global per-dimension min/max stats over the whole dataset.

    Mirrors ``ControllerDataset`` stat computation
    (``controller_dataset.py:172-236``): flatten everything but the last axis.
    Returned values are plain float32 numpy arrays so they serialize cleanly
    into checkpoints.
    """
    ea = np.asarray(expert_actions, dtype=np.float32).reshape(-1, expert_actions.shape[-1])
    va = np.asarray(vla_actions, dtype=np.float32).reshape(-1, vla_actions.shape[-1])
    return {
        "action_mins": ea.min(axis=0),
        "action_maxs": ea.max(axis=0),
        "action_range": ea.max(axis=0) - ea.min(axis=0),
        "vla_mins": va.min(axis=0),
        "vla_maxs": va.max(axis=0),
        "vla_range": va.max(axis=0) - va.min(axis=0),
    }
