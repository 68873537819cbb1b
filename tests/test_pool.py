"""Pooling/upsample parity vs torch (discriminator pyramid + decoder upsample)."""

import numpy as np
import torch

import jax.numpy as jnp

from aclgan_tpu.ops.pool import avg_pool_3x3_s2, global_avg_pool, upsample_nearest_2x


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_avg_pool_matches_torch_count_exclude_pad():
    """AvgPool2d(3, stride=2, padding=1, count_include_pad=False) — networks.py:33."""
    for hw in [(8, 8), (7, 9), (16, 16)]:
        x = _rand((2, *hw, 3))
        got = np.asarray(avg_pool_3x3_s2(jnp.asarray(x)))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        pool = torch.nn.AvgPool2d(3, stride=2, padding=1, count_include_pad=False)
        want = pool(xt).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upsample_nearest_matches_torch():
    x = _rand((2, 5, 6, 4))
    got = np.asarray(upsample_nearest_2x(jnp.asarray(x)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = torch.nn.Upsample(scale_factor=2)(xt).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_global_avg_pool():
    x = _rand((3, 4, 5, 2))
    got = np.asarray(global_avg_pool(jnp.asarray(x)))
    assert got.shape == (3, 1, 1, 2)
    np.testing.assert_allclose(got[:, 0, 0, :], x.mean(axis=(1, 2)), rtol=1e-5, atol=1e-6)
