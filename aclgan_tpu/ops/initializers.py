"""Weight initializers matching utils.py:274-294 of the reference.

The reference applies one init scheme to all Conv*/Linear* weights of a
network (biases zeroed): gaussian N(0, 0.02) for the discriminators,
`init:` (kaiming for the shipped config) for the generators.

Flax kernels are (kh, kw, in, out) for conv and (in, out) for dense; torch's
fan_in = in * kh * kw equals the product of all non-output dims, so the
distributions below are identical to the torch ones.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _fans(shape):
    # flax layout: last dim = out features, everything else multiplies into fan_in
    fan_out = shape[-1]
    fan_in = 1
    for d in shape[:-1]:
        fan_in *= d
    if len(shape) > 2:  # conv: receptive field multiplies both fans for xavier
        rf = 1
        for d in shape[:-2]:
            rf *= d
        fan_in = shape[-2] * rf
        fan_out = shape[-1] * rf
    return fan_in, fan_out


def make_initializer(init_type: str):
    """gaussian / kaiming / xavier / orthogonal / default (utils.py:279-290)."""

    if init_type == "gaussian":

        def init(key, shape, dtype=jnp.float32):
            return 0.02 * jax.random.normal(key, shape, dtype)

        return init

    if init_type == "kaiming":
        # kaiming_normal_(a=0, mode='fan_in'): std = sqrt(2 / fan_in)

        def init(key, shape, dtype=jnp.float32):
            fan_in, _ = _fans(shape)
            std = math.sqrt(2.0 / fan_in)
            return std * jax.random.normal(key, shape, dtype)

        return init

    if init_type == "xavier":
        # xavier_normal_(gain=sqrt(2)): std = gain * sqrt(2 / (fan_in + fan_out))

        def init(key, shape, dtype=jnp.float32):
            fan_in, fan_out = _fans(shape)
            std = math.sqrt(2.0) * math.sqrt(2.0 / (fan_in + fan_out))
            return std * jax.random.normal(key, shape, dtype)

        return init

    if init_type == "orthogonal":
        base = jax.nn.initializers.orthogonal(scale=math.sqrt(2.0), column_axis=-1)

        def init(key, shape, dtype=jnp.float32):
            return base(key, shape, dtype)

        return init

    if init_type == "default":
        # torch's default Conv/Linear init: kaiming_uniform(a=sqrt(5)) =>
        # U(-1/sqrt(fan_in), 1/sqrt(fan_in)) on weights

        def init(key, shape, dtype=jnp.float32):
            fan_in, _ = _fans(shape)
            bound = 1.0 / math.sqrt(fan_in)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        return init

    raise ValueError(f"Unsupported initialization: {init_type!r}")
