"""Activation menu matching Conv2dBlock/LinearBlock (networks.py:344-357,397-410)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SUPPORTED = ("relu", "lrelu", "prelu", "selu", "tanh", "none")


def apply_activation(x: jnp.ndarray, activ: str, prelu_alpha=None) -> jnp.ndarray:
    """relu / lrelu(0.2) / prelu (learnable alpha) / selu / tanh / none."""
    if activ == "relu":
        return jax.nn.relu(x)
    if activ == "lrelu":
        return jax.nn.leaky_relu(x, negative_slope=0.2)
    if activ == "prelu":
        alpha = jnp.asarray(0.25 if prelu_alpha is None else prelu_alpha, x.dtype)
        return jnp.where(x >= 0, x, alpha * x)
    if activ == "selu":
        return jax.nn.selu(x)
    if activ == "tanh":
        return jnp.tanh(x)
    if activ == "none":
        return x
    raise ValueError(f"Unsupported activation: {activ!r} (supported: {_SUPPORTED})")
