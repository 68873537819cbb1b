"""InceptionV3 in flax for IS / conditional-IS / FID evaluation.

The reference computes IS/CIS with a *fine-tuned* torch inception_v3 loaded
from a user-supplied checkpoint (load_inception, utils.py:239-248 — broken as
shipped: `inception_v3` is never imported) over 299x299 bilinear-upsampled
outputs (test_batch.py:61). This is the TPU-native equivalent: the standard
InceptionV3 topology (BasicConv2d = conv + BN(eps=1e-3) + relu; blocks
A/B/C/D/E; aux head omitted) with a torch-state-dict weight importer so the
same fine-tuned checkpoints — or torchvision's pretrained weights for FID —
run on TPU. `transform_input=True` preprocessing matches utils.py:241.

Without a weights file the scorer runs with random init (deterministic seed):
numerically meaningless for quality but keeps the metric pipeline exercisable
— the reference ships no weights either.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicConv2d(nn.Module):
    features: int
    kernel: tuple
    stride: int = 1
    padding: Any = 0

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        x = nn.Conv(self.features, self.kernel, (self.stride, self.stride),
                    padding=pad, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.9, name="bn")(x)
        return jax.nn.relu(x)


def _max_pool(x, k=3, s=2):
    return nn.max_pool(x, (k, k), strides=(s, s))


def _avg_pool(x, k=3, s=1, p=1):
    return nn.avg_pool(x, (k, k), strides=(s, s), padding=((p, p), (p, p)))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = _avg_pool(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = _avg_pool(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = _avg_pool(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Standard InceptionV3 (aux head omitted). Input NHWC in [0, 1]."""

    num_classes: int = 1000
    transform_input: bool = True

    @nn.compact
    def __call__(self, x, return_features: bool = False):
        if self.transform_input:
            # torchvision transform_input: x_ch = x*(std_ch/0.5) + (mean_ch-0.5)/0.5
            ch0 = x[..., 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            ch1 = x[..., 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            ch2 = x[..., 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
            x = jnp.concatenate([ch0, ch1, ch2], axis=-1)
        else:
            x = x * 2.0 - 1.0
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        feats = jnp.mean(x, axis=(1, 2))  # pool3: (N, 2048)
        if return_features:
            return feats
        return nn.Dense(self.num_classes, name="fc")(feats)


def _import_torch_inception(state_dict, variables):
    """Map a torch inception_v3 state_dict onto our variables pytree."""

    def to_np(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    batch_stats = jax.tree_util.tree_map(lambda x: x, variables["batch_stats"])

    def walk(tree, path):
        for k, v in tree.items():
            p = path + [k]
            if isinstance(v, dict):
                yield from walk(v, p)
            else:
                yield p, v

    def torch_key(path):
        # ['Mixed_5b','branch1x1','conv','kernel'] -> 'Mixed_5b.branch1x1.conv.weight'
        mapping = {"kernel": "weight", "scale": "weight", "bias": "bias",
                   "mean": "running_mean", "var": "running_var"}
        mods, leaf = path[:-1], path[-1]
        return ".".join(mods) + "." + mapping[leaf]

    def assign(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = value

    for path, leaf in list(walk(params, [])):
        tk = torch_key(path)
        if tk not in state_dict:
            raise KeyError(f"torch key {tk} missing")
        w = to_np(state_dict[tk])
        if path[-1] == "kernel" and w.ndim == 4:
            w = np.transpose(w, (2, 3, 1, 0))
        elif path[-1] == "kernel" and w.ndim == 2:
            w = w.T
        if tuple(w.shape) != tuple(leaf.shape):
            raise ValueError(f"{tk}: {w.shape} vs {leaf.shape}")
        assign(params, path, jnp.asarray(w))
    for path, leaf in list(walk(batch_stats, [])):
        tk = torch_key(path)
        assign(batch_stats, path, jnp.asarray(to_np(state_dict[tk])))
    return {"params": params, "batch_stats": batch_stats}


class InceptionScorer:
    """Batched softmax predictions / pool3 features at 299x299 on device."""

    def __init__(self, weights_path: Optional[str] = None, num_classes: int = 1000):
        if weights_path and weights_path.endswith(".msgpack"):
            # flax-native fine-tuned classifier (tools/train_inception.py) —
            # the in-env analog of the reference's fine-tuned torch inception
            # (utils.py:239-248)
            import flax.serialization

            with open(weights_path, "rb") as f:
                variables = flax.serialization.msgpack_restore(f.read())
            num_classes = variables["params"]["fc"]["kernel"].shape[1]
            self.model = InceptionV3(num_classes=num_classes)
            self.variables = jax.tree_util.tree_map(jnp.asarray, variables)
            self.pretrained = True
        elif weights_path and weights_path not in (".", ""):
            import torch

            sd = torch.load(weights_path, map_location="cpu")
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            if "fc.weight" in sd:
                num_classes = sd["fc.weight"].shape[0]
            self.model = InceptionV3(num_classes=num_classes)
            variables = self.model.init(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 299, 299, 3)))
            self.variables = _import_torch_inception(sd, variables)
            self.pretrained = True
        else:
            self.model = InceptionV3(num_classes=num_classes)
            self.variables = self.model.init(jax.random.PRNGKey(0),
                                             jnp.zeros((1, 299, 299, 3)))
            self.pretrained = False

        @jax.jit
        def _predict(variables, x01):
            x = jax.image.resize(x01, (x01.shape[0], 299, 299, 3), "bilinear")
            logits = self.model.apply(variables, x)
            return jax.nn.softmax(logits, axis=-1)

        @jax.jit
        def _features(variables, x01):
            x = jax.image.resize(x01, (x01.shape[0], 299, 299, 3), "bilinear")
            return self.model.apply(variables, x, return_features=True)

        self._predict = _predict
        self._features = _features

    def predict(self, images01: np.ndarray) -> np.ndarray:
        """images01: NHWC float in [0,1] -> (N, num_classes) softmax."""
        return np.asarray(self._predict(self.variables, jnp.asarray(images01)))

    def features(self, images01: np.ndarray) -> np.ndarray:
        """pool3 features (N, 2048) for FID."""
        return np.asarray(self._features(self.variables, jnp.asarray(images01)))
