"""Fast upsample+conv parity: collapsed-tap path vs naive vs torch oracle."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from aclgan_tpu.ops.upsample_conv import upsample2x_conv5x5, upsample2x_conv5x5_naive


def _rand(shape, seed):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


@pytest.mark.parametrize("pad_type", ["reflect", "replicate", "zero"])
@pytest.mark.parametrize("hw", [(8, 8), (7, 9), (16, 12)])
def test_fast_matches_naive(pad_type, hw):
    h, w = hw
    x = jnp.asarray(_rand((2, h, w, 6), 0))
    kernel = jnp.asarray(_rand((5, 5, 6, 4), 1) * 0.2)
    bias = jnp.asarray(_rand((4,), 2))
    fast = np.asarray(upsample2x_conv5x5(x, kernel, bias, pad_type))
    naive = np.asarray(upsample2x_conv5x5_naive(x, kernel, bias, pad_type))
    assert fast.shape == (2, 2 * h, 2 * w, 4)
    np.testing.assert_allclose(fast, naive, rtol=1e-4, atol=1e-5)


def test_naive_matches_torch():
    """The naive path itself matches torch Upsample+ReflectionPad+Conv
    (networks.py:255-257 composition)."""
    x = _rand((1, 6, 5, 3), 3)
    kernel = _rand((5, 5, 3, 2), 4) * 0.2
    bias = _rand((2,), 5)
    got = np.asarray(upsample2x_conv5x5_naive(
        jnp.asarray(x), jnp.asarray(kernel), jnp.asarray(bias), "reflect"))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    conv = torch.nn.Conv2d(3, 2, 5, 1, bias=True)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(kernel.transpose(3, 2, 0, 1).copy()))
        conv.bias.copy_(torch.from_numpy(bias))
    up = torch.nn.Upsample(scale_factor=2)(xt)
    up = torch.nn.ReflectionPad2d(2)(up)
    want = conv(up).permute(0, 2, 3, 1).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fast_gradients_match_naive():
    x = jnp.asarray(_rand((1, 8, 8, 4), 6))
    kernel = jnp.asarray(_rand((5, 5, 4, 3), 7) * 0.2)
    bias = jnp.asarray(_rand((3,), 8))
    dy = jnp.asarray(_rand((1, 16, 16, 3), 9))

    def loss(fn, x, k, b):
        return jnp.sum(fn(x, k, b, "reflect") * dy)

    g_fast = jax.grad(lambda *a: loss(upsample2x_conv5x5, *a), argnums=(0, 1, 2))(
        x, kernel, bias)
    g_naive = jax.grad(lambda *a: loss(upsample2x_conv5x5_naive, *a), argnums=(0, 1, 2))(
        x, kernel, bias)
    for gf, gn in zip(g_fast, g_naive):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gn),
                                   rtol=1e-4, atol=1e-4)


def test_generator_fast_vs_slow_decoder():
    """Full generator outputs identical with fast_upsample on/off (same params)."""
    from aclgan_tpu.models.generator import AdaINGenerator
    from tests.helpers import tiny_config

    cfg = tiny_config().gen
    x = jnp.asarray(_rand((2, 16, 16, 3), 10))
    gen_fast = AdaINGenerator(cfg, fast_upsample=True)
    gen_slow = AdaINGenerator(cfg, fast_upsample=False)
    params = gen_fast.init(jax.random.PRNGKey(0), x)["params"]
    out_fast = gen_fast.apply({"params": params}, x)
    out_slow = gen_slow.apply({"params": params}, x)  # identical param tree
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_slow),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("pad_type", ["reflect", "replicate", "zero"])
@pytest.mark.parametrize("hw", [(8, 8), (7, 9), (16, 12)])
def test_dilated_matches_naive(pad_type, hw):
    """The lhs-dilated (transposed-conv) formulation is exact too."""
    from aclgan_tpu.ops.upsample_conv import upsample2x_conv5x5_dilated

    h, w = hw
    x = jnp.asarray(_rand((2, h, w, 6), 0))
    kernel = jnp.asarray(_rand((5, 5, 6, 4), 1) * 0.2)
    bias = jnp.asarray(_rand((4,), 2))
    fast = np.asarray(upsample2x_conv5x5_dilated(x, kernel, bias, pad_type))
    naive = np.asarray(upsample2x_conv5x5_naive(x, kernel, bias, pad_type))
    assert fast.shape == (2, 2 * h, 2 * w, 4)
    np.testing.assert_allclose(fast, naive, rtol=1e-4, atol=1e-5)
