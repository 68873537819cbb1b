"""Latent-space utilities: slerp interpolation + parameter counting.

slerp/get_slerp_interp exist in the reference (utils.py:181-207) but are
unused by its CLIs (SURVEY §2.13); they are kept here as style-space
exploration helpers (interpolating style codes between two samples).
get_parameter_number mirrors train.py:49-53.
"""

from __future__ import annotations

import numpy as np


def slerp(val: float, low: np.ndarray, high: np.ndarray) -> np.ndarray:
    """Spherical interpolation between two latent vectors (utils.py:181-189)."""
    low = np.asarray(low, np.float64)
    high = np.asarray(high, np.float64)
    omega = np.arccos(np.clip(
        np.dot(low / np.linalg.norm(low), high / np.linalg.norm(high)), -1.0, 1.0))
    so = np.sin(omega)
    if so == 0.0:  # parallel vectors: fall back to lerp
        return ((1.0 - val) * low + val * high).astype(np.float32)
    return (np.sin((1.0 - val) * omega) / so * low
            + np.sin(val * omega) / so * high).astype(np.float32)


def get_slerp_interp(nb_latents: int, nb_interp: int, z_dim: int,
                     seed: int = 0) -> np.ndarray:
    """(nb_latents*nb_interp, z_dim) slerp chains between random endpoints
    (utils.py:192-207; returns (N, z_dim) — style codes here are 2-D)."""
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(nb_latents):
        low = rng.randn(z_dim)
        high = rng.randn(z_dim)
        for v in np.linspace(0, 1, num=nb_interp):
            out.append(slerp(float(v), low, high))
    return np.stack(out).astype(np.float32)


def get_parameter_number(params) -> dict:
    """Total parameter count of a pytree (train.py:49-53 analog)."""
    import jax

    total = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    return {"Total": total, "Trainable": total}
