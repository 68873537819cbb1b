"""Pallas fused instance-norm kernel vs the jnp reference path.

Runs in TPU interpret mode on CPU (pltpu.force_tpu_interpret_mode) — the
same kernel code that compiles on hardware, checked for forward and VJP
parity against the plain-jnp composition it replaces.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from aclgan_tpu.ops.activations import apply_activation
from aclgan_tpu.ops.norms import adaptive_instance_norm, instance_norm
from aclgan_tpu.ops.pallas.instance_norm import _fused_in


def _ref(x, scale, shift, activ):
    if scale is not None:
        y = adaptive_instance_norm(x, scale, shift)
    else:
        y = instance_norm(x)
    return apply_activation(y, activ)


@pytest.mark.parametrize("activ", ["none", "relu", "lrelu", "tanh"])
@pytest.mark.parametrize("affine", [False, True])
def test_forward_parity(activ, affine):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 16, 128).astype(np.float32))
    scale = jnp.asarray(rng.randn(2, 128).astype(np.float32)) if affine else None
    shift = jnp.asarray(rng.randn(2, 128).astype(np.float32)) if affine else None
    with pltpu.force_tpu_interpret_mode():
        got = _fused_in(x, scale, shift, 1e-5, activ)
    want = _ref(x, scale, shift, activ)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("activ", ["none", "relu", "lrelu"])
def test_vjp_parity_adain(activ):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 16, 128).astype(np.float32))
    scale = jnp.asarray(rng.randn(2, 128).astype(np.float32))
    shift = jnp.asarray(rng.randn(2, 128).astype(np.float32))
    dy = jnp.asarray(rng.randn(2, 8, 16, 128).astype(np.float32))

    def loss_pallas(x, s, b):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(_fused_in(x, s, b, 1e-5, activ) * dy)

    def loss_ref(x, s, b):
        return jnp.sum(_ref(x, s, b, activ) * dy)

    with pltpu.force_tpu_interpret_mode():
        gx, gs, gb = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, scale, shift)
    rx, rs, rb = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, shift)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(rs), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-4, atol=1e-4)


def test_vjp_parity_plain_in():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 16, 128).astype(np.float32))
    dy = jnp.asarray(rng.randn(1, 8, 16, 128).astype(np.float32))

    def loss_pallas(x):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(_fused_in(x, None, None, 1e-5, "relu") * dy)

    with pltpu.force_tpu_interpret_mode():
        gx = jax.grad(loss_pallas)(x)
    rx = jax.grad(lambda x: jnp.sum(_ref(x, None, None, "relu") * dy))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-4, atol=1e-4)


def test_bf16_forward():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 16, 128).astype(np.float32), jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        got = _fused_in(x, None, None, 1e-5, "relu")
    assert got.dtype == jnp.bfloat16
    want = _ref(x, None, None, "relu")
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), rtol=0.05, atol=0.05)
