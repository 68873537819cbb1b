"""VGG16 feature extractor for the domain-invariant perceptual loss.

Rebuild of the reference's hand-rolled Vgg16 (networks.py:423-472, returning
relu5_3 features) + `vgg_preprocess` (utils.py:250-260: RGB->BGR, [-1,1] ->
[0,255], Caffe mean subtraction) + `compute_vgg_loss` (trainer.py:172-177:
MSE of InstanceNorm'd features).

Notes on reference behavior preserved deliberately:
- the shipped config disables it (`vgg_w: 0`, male2female.yaml:33) and
  `gen_update` never actually invokes compute_vgg_loss even when loaded —
  the method exists as trainer API only (trainer.py:90-170 has no vgg term).
  We expose the same capability surface: model + loss function + weight
  import, usable by custom configs/training code.
- the reference's Torch7 `vgg16.t7` download/convert path is broken as
  shipped (load_lua commented out, utils.py:7,230); here weights load from
  any torch state_dict with conv1_1..conv5_3 keys.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from aclgan_tpu.ops.norms import instance_norm

_LAYERS = [
    ("conv1_1", 64), ("conv1_2", 64), "pool",
    ("conv2_1", 128), ("conv2_2", 128), "pool",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), "pool",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512),
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512),
]  # networks.py:444-471: no pool after conv4_3; relu5_3 returned


class Vgg16(nn.Module):
    """Conv stack up to relu5_3 (networks.py:444-471). Input: Caffe-preprocessed
    BGR in [0,255] minus means, NHWC."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for layer in _LAYERS:
            if layer == "pool":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            name, feat = layer
            x = nn.Conv(feat, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                        dtype=self.dtype, param_dtype=jnp.float32, name=name)(x)
            x = jax.nn.relu(x)
        return x


def vgg_preprocess(batch: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] RGB NHWC -> Caffe BGR [0,255] minus ImageNet means (utils.py:250-260)."""
    r, g, b = batch[..., 0:1], batch[..., 1:2], batch[..., 2:3]
    bgr = jnp.concatenate([b, g, r], axis=-1)
    bgr = (bgr + 1.0) * 255.0 * 0.5
    mean = jnp.asarray([103.939, 116.779, 123.680], bgr.dtype)
    return bgr - mean


def compute_vgg_loss(vgg_apply, vgg_params, img: jnp.ndarray,
                     target: jnp.ndarray) -> jnp.ndarray:
    """MSE between InstanceNorm'd relu5_3 features (trainer.py:172-177)."""
    img_fea = vgg_apply(vgg_params, vgg_preprocess(img))
    target_fea = vgg_apply(vgg_params, vgg_preprocess(target))
    diff = instance_norm(img_fea) - instance_norm(target_fea)
    return jnp.mean(jnp.square(diff.astype(jnp.float32)))


def import_torch_vgg16(state_dict: Dict[str, Any], template_params) -> Any:
    """Map a torch Vgg16 state_dict (conv1_1.weight, ...) onto flax params."""

    def to_np(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    params = jax.tree_util.tree_map(lambda x: x, template_params)
    for layer in _LAYERS:
        if layer == "pool":
            continue
        name, _ = layer
        w = to_np(state_dict[f"{name}.weight"]).transpose(2, 3, 1, 0)
        b = to_np(state_dict[f"{name}.bias"])
        assert tuple(w.shape) == tuple(params[name]["kernel"].shape)
        params[name]["kernel"] = jnp.asarray(w)
        params[name]["bias"] = jnp.asarray(b)
    return params


def load_vgg16(weights_path: str | None = None, dtype=jnp.float32):
    """(apply_fn, params). With no weights file: deterministic random init
    (the reference's downloader is broken anyway; utils.py:223-237)."""
    model = Vgg16(dtype=dtype)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)))["params"]
    if weights_path:
        import torch

        sd = torch.load(weights_path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        params = import_torch_vgg16(sd, params)

    def apply_fn(p, x):
        return model.apply({"params": p}, x)

    return apply_fn, params
