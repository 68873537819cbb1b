"""Explicit shard_map halo conv / sharded IN vs the unsharded ops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aclgan_tpu.parallel.halo import halo_conv, sharded_instance_norm
from aclgan_tpu.ops.norms import instance_norm


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()[:4]), ("spatial",))


def _ref_conv(x, kernel, bias, stride, padding, pad_type):
    mode = {"reflect": "reflect", "replicate": "edge", "zero": "constant"}[pad_type]
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)), mode=mode)
    y = lax.conv_general_dilated(xp, kernel, (stride, stride), "VALID",
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


@pytest.mark.parametrize("k,stride,padding", [(3, 1, 1), (5, 1, 2), (4, 2, 1), (7, 1, 3)])
@pytest.mark.parametrize("pad_type", ["reflect", "zero", "replicate"])
def test_halo_conv_matches_unsharded(mesh, k, stride, padding, pad_type):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 16, 8).astype(np.float32))
    kernel = jnp.asarray(rng.randn(k, k, 8, 4).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.randn(4).astype(np.float32))

    want = np.asarray(_ref_conv(x, kernel, bias, stride, padding, pad_type))
    x_sh = jax.device_put(x, NamedSharding(mesh, P(None, "spatial")))
    got = np.asarray(halo_conv(x_sh, kernel, bias, mesh, stride, padding, pad_type))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharded_instance_norm_matches(mesh):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 32, 8, 8).astype(np.float32))
    want = np.asarray(instance_norm(x))
    x_sh = jax.device_put(x, NamedSharding(mesh, P(None, "spatial")))
    got = np.asarray(sharded_instance_norm(x_sh, mesh))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_halo_conv_rejects_unsupported_geometry(mesh):
    """Geometries outside the shard-exact window (1 <= kh-2p <= stride) used
    to return silently wrong-shaped output; they must raise."""
    import numpy as np

    import jax.numpy as jnp

    from aclgan_tpu.parallel.halo import halo_conv

    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 4), jnp.float32)
    k = jnp.zeros((4, 4, 4, 4), jnp.float32)
    b = jnp.zeros((4,), jnp.float32)
    with pytest.raises(ValueError, match="kh - 2\\*padding"):
        halo_conv(x, k, b, mesh, stride=1, padding=1)  # 4x4/s1/p1: kh-2p=2>1
