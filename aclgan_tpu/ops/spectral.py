"""Spectral normalization (one power-iteration step per forward).

Functional rebuild of the reference's SpectralNorm wrapper
(networks.py:542-600): the weight is divided by its leading singular value
estimated by power iteration on non-trainable u/v vectors. Here u/v live in a
'spectral' variable collection; they are updated in-place when the collection
is mutable (training) and frozen otherwise. Selectable via `norm: sn` in the
discriminator config (unused by the shipped male2female config, dis.norm=none).
"""

from __future__ import annotations

from typing import Callable, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


def _l2normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return v / (jnp.linalg.norm(v) + eps)  # networks.py:538-539


def _spectral_normalize(module: nn.Module, w2d: jnp.ndarray) -> jnp.ndarray:
    """Return w2d / sigma with one power-iteration step. w2d: (rows, cols)."""
    rows, cols = w2d.shape
    u_var = module.variable(
        "spectral", "u", lambda: _l2normalize(jax.random.normal(module.make_rng("params"), (rows,)))
    )
    v_var = module.variable(
        "spectral", "v", lambda: _l2normalize(jax.random.normal(module.make_rng("params"), (cols,)))
    )
    u, v = u_var.value, v_var.value
    if module.is_mutable_collection("spectral") and not module.is_initializing():
        # Power iteration runs on the *values* only — the reference updates
        # u.data/v.data on requires_grad=False params (networks.py:562-564),
        # so its gradient flows through w alone in sigma = u·(w·v). Without
        # the stop_gradient, grads would leak through the iteration chain.
        w2d_ng = lax.stop_gradient(w2d)
        v = _l2normalize(w2d_ng.T @ u)
        u = _l2normalize(w2d_ng @ v)
        u_var.value = u
        v_var.value = v
    sigma = u @ (w2d @ v)
    return w2d / sigma


class SpectralConv(nn.Module):
    """Conv with spectrally-normalized kernel; nn.Conv-compatible surface."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: str = "VALID"
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (kh, kw, in_ch, self.features), self.param_dtype)
        # rows = out features (torch views weight as (out, -1), networks.py:560)
        w2d = kernel.reshape(-1, self.features).T
        w2d = _spectral_normalize(self, w2d)
        kernel = w2d.T.reshape(kh, kw, in_ch, self.features)
        y = lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=self.strides,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        return y


class SpectralDense(nn.Module):
    """Dense with spectrally-normalized kernel; nn.Dense-compatible surface."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_f = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (in_f, self.features), self.param_dtype)
        w2d = _spectral_normalize(self, kernel.T)  # (out, in)
        y = jnp.dot(x.astype(self.dtype), w2d.T.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        return y
