"""Lane-packed final conv: exactness of forward and custom-VJP gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from aclgan_tpu.ops.final_conv import packed_conv_small_cout
from aclgan_tpu.ops.pad import pad2d


def _direct(x, w, pad_type):
    xp = pad2d(x, 3, pad_type)
    return lax.conv_general_dilated(
        xp, w.astype(xp.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("pad_type", ["reflect", "replicate", "zero"])
@pytest.mark.parametrize("p", [4, 8])
@pytest.mark.parametrize("shape", [(2, 16, 16, 6, 4), (1, 8, 24, 3, 2)])
def test_packed_forward_exact(pad_type, p, shape):
    b, h, w, cin, cout = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    k = jnp.asarray(rng.randn(7, 7, cin, cout).astype(np.float32) * 0.1)
    got = packed_conv_small_cout(x, k, pad_type, p)
    want = _direct(x, k, pad_type)
    assert got.shape == want.shape == (b, h, w, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pad_type", ["reflect", "replicate", "zero"])
def test_packed_gradients_match_direct(pad_type):
    rng = np.random.RandomState(1)
    b, h, w, cin, cout, p = 2, 8, 16, 5, 4, 8
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    k = jnp.asarray(rng.randn(7, 7, cin, cout).astype(np.float32) * 0.1)
    cot = jnp.asarray(rng.randn(b, h, w, cout).astype(np.float32))

    def loss_packed(x, k):
        return jnp.sum(packed_conv_small_cout(x, k, pad_type, p) * cot)

    def loss_direct(x, k):
        return jnp.sum(_direct(x, k, pad_type) * cot)

    gx_p, gk_p = jax.grad(loss_packed, argnums=(0, 1))(x, k)
    gx_d, gk_d = jax.grad(loss_direct, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_d),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_d),
                               rtol=1e-4, atol=1e-4)
