"""VGG16 perceptual path: shapes, preprocess parity, torch weight import."""

import numpy as np
import torch

import jax.numpy as jnp

from aclgan_tpu.models.vgg import (
    compute_vgg_loss,
    import_torch_vgg16,
    load_vgg16,
    vgg_preprocess,
)


def test_vgg_preprocess_matches_reference_formula():
    """RGB->BGR, [-1,1]->[0,255], Caffe mean subtraction (utils.py:250-260)."""
    x = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (1, 4, 4, 3)).astype(np.float32))
    out = np.asarray(vgg_preprocess(x))
    xb = np.asarray(x)
    want_b = (xb[..., 2] + 1) * 127.5 - 103.939
    want_g = (xb[..., 1] + 1) * 127.5 - 116.779
    want_r = (xb[..., 0] + 1) * 127.5 - 123.680
    np.testing.assert_allclose(out[..., 0], want_b, rtol=1e-5)
    np.testing.assert_allclose(out[..., 1], want_g, rtol=1e-5)
    np.testing.assert_allclose(out[..., 2], want_r, rtol=1e-5)


def test_vgg_feature_shape():
    """relu5_3 at 1/8 resolution with 512 channels (3 pools before conv5_3,
    networks.py:444-471)."""
    apply_fn, params = load_vgg16(None)
    x = vgg_preprocess(jnp.zeros((1, 64, 64, 3)))
    feats = apply_fn(params, x)
    assert feats.shape == (1, 8, 8, 512)


def test_vgg_torch_import_matches_forward():
    """A tiny torch conv stack imported into flax reproduces the features."""
    apply_fn, params = load_vgg16(None)
    # build a torch state dict from our random params and re-import
    sd = {}
    for name, p in params.items():
        sd[f"{name}.weight"] = torch.from_numpy(
            np.asarray(p["kernel"]).transpose(3, 2, 0, 1).copy())
        sd[f"{name}.bias"] = torch.from_numpy(np.asarray(p["bias"]).copy())
    re = import_torch_vgg16(sd, params)
    x = vgg_preprocess(jnp.asarray(
        np.random.RandomState(1).uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)))
    np.testing.assert_allclose(np.asarray(apply_fn(params, x)),
                               np.asarray(apply_fn(re, x)), rtol=1e-6)


def test_compute_vgg_loss_zero_for_identical():
    apply_fn, params = load_vgg16(None)
    x = jnp.asarray(np.random.RandomState(2).uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    loss = compute_vgg_loss(apply_fn, params, x, x)
    assert float(loss) == 0.0
    y = jnp.asarray(np.random.RandomState(3).uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    assert float(compute_vgg_loss(apply_fn, params, x, y)) > 0.0
