"""Pooling / resize ops, NHWC.

- avg_pool_3x3_s2: AvgPool2d(3, stride=2, padding=1, count_include_pad=False)
  used between discriminator scales (networks.py:33). The count_include_pad
  semantics are reproduced with a window-count divisor.
- upsample_nearest_2x: nn.Upsample(scale_factor=2) in the decoder
  (networks.py:256).
- global_avg_pool: nn.AdaptiveAvgPool2d(1) in the style encoder
  (networks.py:222).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def avg_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/s2/p1 average pool, padding excluded from the divisor. x: (N,H,W,C)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    window = (1, 3, 3, 1)
    strides = (1, 2, 2, 1)
    padding = ((0, 0), (1, 1), (1, 1), (0, 0))
    summed = lax.reduce_window(x32, 0.0, lax.add, window, strides, padding)
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), jnp.float32)
    counts = lax.reduce_window(ones, 0.0, lax.add, window, strides, padding)
    return (summed / counts).astype(dtype)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample. x: (N,H,W,C).

    Implemented with broadcast+reshape (cheap on TPU; avoids gather).
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over H, W keeping dims: (N,H,W,C) -> (N,1,1,C)."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
