"""Custom-VJP pad: value and gradient parity vs jnp.pad autodiff."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aclgan_tpu.ops.pad import pad2d

_MODES = {"reflect": "reflect", "replicate": "edge", "zero": "constant"}


@pytest.mark.parametrize("mode", ["reflect", "replicate", "zero"])
@pytest.mark.parametrize("p", [1, 2, 3])
def test_pad_value_parity(mode, p):
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 9, 3).astype(np.float32))
    got = pad2d(x, p, mode)
    want = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode=_MODES[mode])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("mode", ["reflect", "replicate", "zero"])
@pytest.mark.parametrize("p", [1, 2, 3])
def test_pad_grad_parity(mode, p):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 9, 3).astype(np.float32))
    dy = jnp.asarray(rng.randn(2, 8 + 2 * p, 9 + 2 * p, 3).astype(np.float32))

    g_new = jax.grad(lambda x: jnp.sum(pad2d(x, p, mode) * dy))(x)
    g_ref = jax.grad(lambda x: jnp.sum(
        jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode=_MODES[mode]) * dy))(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)
