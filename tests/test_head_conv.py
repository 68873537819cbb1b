"""Polyphase head convs: exactness of forwards, gradients, and the ConvBlock
integration (params/naming unchanged vs the nn.Conv path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from aclgan_tpu.ops.head_conv import (
    dis_head_conv4s2,
    gen_head_conv7,
    head7_polyphase,
    use_poly_dis4,
    use_poly_head7,
)
from aclgan_tpu.ops.pad import pad2d

_DN = ("NHWC", "HWIO", "NHWC")


def _direct7(x, w, pad_type):
    return lax.conv_general_dilated(
        pad2d(x, 3, pad_type), w, (1, 1), "VALID", dimension_numbers=_DN)


def _direct4s2(x, w, pad_type):
    return lax.conv_general_dilated(
        pad2d(x, 1, pad_type), w, (2, 2), "VALID", dimension_numbers=_DN)


@pytest.mark.parametrize("pad_type", ["reflect", "replicate", "zero"])
@pytest.mark.parametrize("shape", [(2, 16, 16, 3, 16), (1, 8, 12, 6, 16)])
def test_head7_forwards_exact(pad_type, shape):
    b, h, w, cin, cout = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    k = jnp.asarray(rng.randn(7, 7, cin, cout).astype(np.float32) * 0.1)
    want = _direct7(x, k, pad_type)
    for fn in (gen_head_conv7, head7_polyphase):
        got = fn(x, k, pad_type)
        assert got.shape == want.shape == (b, h, w, cout)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pad_type", ["reflect", "zero"])
@pytest.mark.parametrize("fn", [gen_head_conv7, head7_polyphase],
                         ids=["mixed", "poly"])
def test_head7_gradients_match_direct(pad_type, fn):
    rng = np.random.RandomState(1)
    b, h, w, cin, cout = 2, 10, 16, 3, 16
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    k = jnp.asarray(rng.randn(7, 7, cin, cout).astype(np.float32) * 0.1)
    cot = jnp.asarray(rng.randn(b, h, w, cout).astype(np.float32))

    gx_p, gk_p = jax.grad(lambda x, k: jnp.sum(fn(x, k, pad_type) * cot),
                          argnums=(0, 1))(x, k)
    gx_d, gk_d = jax.grad(lambda x, k: jnp.sum(_direct7(x, k, pad_type) * cot),
                          argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_d),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_d),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("pad_type", ["reflect", "replicate", "zero"])
@pytest.mark.parametrize("shape", [(2, 16, 16, 3, 16), (1, 8, 12, 3, 32)])
def test_dis4s2_forward_exact(pad_type, shape):
    b, h, w, cin, cout = shape
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    k = jnp.asarray(rng.randn(4, 4, cin, cout).astype(np.float32) * 0.1)
    got = dis_head_conv4s2(x, k, pad_type)
    want = _direct4s2(x, k, pad_type)
    assert got.shape == want.shape == (b, h // 2, w // 2, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dis4s2_gradients_match_direct():
    rng = np.random.RandomState(3)
    b, h, w, cin, cout = 2, 12, 16, 3, 16
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    k = jnp.asarray(rng.randn(4, 4, cin, cout).astype(np.float32) * 0.1)
    cot = jnp.asarray(rng.randn(b, h // 2, w // 2, cout).astype(np.float32))

    gx_p, gk_p = jax.grad(
        lambda x, k: jnp.sum(dis_head_conv4s2(x, k, "reflect") * cot),
        argnums=(0, 1))(x, k)
    gx_d, gk_d = jax.grad(
        lambda x, k: jnp.sum(_direct4s2(x, k, "reflect") * cot),
        argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_d),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_d),
                               rtol=1e-4, atol=1e-4)


def test_gates(monkeypatch):
    # defaults: both heads natural (fused-step arbitration, BENCH_NOTES)
    monkeypatch.delenv("ACLGAN_HEAD7", raising=False)
    monkeypatch.delenv("ACLGAN_DIS_HEAD", raising=False)
    assert use_poly_head7((2, 16, 16, 3), 64, "in") == ""
    assert not use_poly_dis4((2, 16, 16, 3), 64, "none")
    # gen head opt-in: small Cin / even dims / non-sn only
    monkeypatch.setenv("ACLGAN_HEAD7", "mixed")
    assert use_poly_head7((2, 16, 16, 3), 64, "in") == "mixed"
    assert use_poly_head7((2, 16, 16, 3), 64, "sn") == ""
    assert use_poly_head7((2, 15, 16, 3), 64, "in") == ""    # odd H
    assert use_poly_head7((2, 16, 16, 64), 64, "in") == ""   # deep Cin
    assert use_poly_head7((2, 16, 16, 3), 8, "in") == ""     # tiny Cout
    # dis head opt-in: Cin==3 only (Cin=6 measured slower), even dims
    monkeypatch.setenv("ACLGAN_DIS_HEAD", "poly")
    assert use_poly_dis4((2, 16, 16, 3), 64, "none")
    assert not use_poly_dis4((2, 16, 16, 6), 64, "none")
    assert not use_poly_dis4((2, 16, 16, 3), 64, "sn")
    assert not use_poly_dis4((2, 16, 15, 3), 64, "none")


@pytest.mark.parametrize("mode", ["direct", "mixed", "poly"])
def test_convblock_head7_modes_agree(monkeypatch, mode):
    """ConvBlock with the head shape: every mode produces the same outputs
    and the same parameter tree (checkpoint compatibility)."""
    from aclgan_tpu.ops.blocks import ConvBlock

    monkeypatch.setenv("ACLGAN_HEAD7", mode)
    blk = ConvBlock(16, 7, 1, 3, norm="in", activ="relu", pad_type="reflect")
    x = jnp.asarray(np.random.RandomState(4).randn(2, 16, 16, 3), jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x)
    flat = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert flat["params"]["Conv_0"]["kernel"] == (7, 7, 3, 16)
    y = blk.apply(params, x)
    monkeypatch.setenv("ACLGAN_HEAD7", "direct")
    y_direct = blk.apply(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_direct),
                               rtol=1e-4, atol=1e-5)


def test_convblock_dis4_agrees(monkeypatch):
    from aclgan_tpu.ops.blocks import ConvBlock

    monkeypatch.setenv("ACLGAN_DIS_HEAD", "poly")
    blk = ConvBlock(16, 4, 2, 1, norm="none", activ="lrelu",
                    pad_type="reflect", init_type="gaussian")
    x = jnp.asarray(np.random.RandomState(5).randn(2, 16, 16, 3), jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_map(
        lambda a: a.shape, params)["params"]["Conv_0"]["kernel"] == (4, 4, 3, 16)
    y = blk.apply(params, x)
    monkeypatch.delenv("ACLGAN_DIS_HEAD")
    y_direct = blk.apply(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_direct),
                               rtol=1e-4, atol=1e-5)
