"""Normalization ops with reference-exact semantics, NHWC, TPU-first.

Reference semantics being matched (file:line cites into /root/reference):

- instance_norm      — torch nn.InstanceNorm2d(affine=False, eps=1e-5)
                       (networks.py:333): per-(sample, channel) stats over H,W,
                       *biased* variance, no affine.
- adaptive_instance_norm — AdaptiveInstanceNorm2d (networks.py:477-503): the
                       reference reshapes to (1, B*C, H, W) and calls
                       F.batch_norm(training=True) with externally-assigned
                       per-(sample,channel) weight/bias. That is exactly
                       instance norm followed by `scale * xhat + shift`; here
                       it is a direct functional op — the (scale, shift) come
                       in as arguments instead of being mutated onto a module
                       (networks.py:154-163).
- sample_layer_norm  — the custom LayerNorm (networks.py:509-536): per-sample
                       stats over ALL of (C,H,W), **Bessel-corrected** std,
                       divides by `(std + eps)` (nonstandard eps placement!),
                       then per-channel affine.
- TorchBatchNorm     — torch nn.BatchNorm2d/1d with default args
                       (networks.py:330-331, 393-394): TORCH momentum
                       convention (new = (1-m)*old + m*batch, m=0.1 — the
                       opposite of flax's), biased batch variance for
                       normalization but *Bessel-corrected* variance in the
                       running-var update, ones/zeros affine init.

All stats are computed in float32 regardless of input dtype (bf16-safe) and
the result is cast back to the input dtype.
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

# Normalize-pass formulation knobs (A/B gates): read once at import.
# ACLGAN_NORM_STATS=bf16 computes IN/AdaIN stats in the input dtype (skips
# the f32 upcast inside the fused loops; ~1-ulp drift accepted only when
# explicitly enabled). ACLGAN_NORM_DIV=div restores the divide-by-sqrt form;
# the default multiplies by a per-(n,c) rsqrt. MEASURED NEGATIVE in both
# bench modes (BENCH_NOTES r5 "normalize-pass formulation knobs": spread
# 0.15% inference / 0.46% train, inside noise) — XLA emits the same fused
# normalize either way; the knobs stay only as A/B instruments.
_STATS_BF16 = os.environ.get("ACLGAN_NORM_STATS", "f32") == "bf16"
_USE_DIV = os.environ.get("ACLGAN_NORM_DIV", "rsqrt") == "div"


def _moments(x32: jnp.ndarray, axes) -> tuple[jnp.ndarray, jnp.ndarray]:
    """mean, biased var in ONE traversal (E[x^2]-E[x]^2 — XLA fuses the two
    reductions over the same producer into a single pass, unlike the
    two-pass centered form which re-reads the activation)."""
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    mean_sq = jnp.mean(jnp.square(x32), axis=axes, keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    return mean, var


def _in_stats(x: jnp.ndarray, eps: float):
    """(mean, inv-std or None, sqrt-arg) for the instance-norm family."""
    xs = x if _STATS_BF16 else x.astype(jnp.float32)
    mean, var = _moments(xs, (1, 2))
    if _USE_DIV:
        return xs, mean, None, var
    return xs, mean, lax.rsqrt(var + eps), None


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-(N, C) normalization over spatial dims. x: (N, H, W, C)."""
    xs, mean, inv, var = _in_stats(x, eps)
    if inv is None:
        out = (xs - mean) / jnp.sqrt(var + eps)
    else:
        out = (xs - mean) * inv
    return out.astype(x.dtype)


def adaptive_instance_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    shift: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Instance norm + per-(sample, channel) affine from the style MLP.

    x: (N, H, W, C); scale/shift: (N, C). Matches AdaptiveInstanceNorm2d
    (networks.py:490-503) where weight=scale ("std") and bias=shift ("mean").
    """
    xs, mean, inv, var = _in_stats(x, eps)
    s = scale.astype(xs.dtype)[:, None, None, :]
    b = shift.astype(xs.dtype)[:, None, None, :]
    if inv is None:
        xhat = (xs - mean) / jnp.sqrt(var + eps)
    else:
        # fold the affine scale into the per-(n,c) inv-std so the fused
        # per-element loop is one subtract + one multiply + one add
        xhat = (xs - mean) * inv
    return (xhat * s + b).astype(x.dtype)


class TorchBatchNorm(nn.Module):
    """Batch norm with exact torch nn.BatchNorm2d/1d(default-args) semantics.

    Works on (N, H, W, C) and (N, F): stats over every non-channel axis.
    flax's own nn.BatchNorm differs from torch in two observable ways — its
    momentum convention is reversed AND its running-var update uses the
    biased batch variance where torch uses the Bessel-corrected one
    (aten/native/Normalization: `save_var * n / (n - 1)`), so a torch-
    imported discriminator's running stats would drift under continued
    training. This module pins both. Normalization in train mode uses the
    *biased* batch variance (torch does too); eval mode uses the running
    stats. Running stats live in the `batch_stats` collection as
    {'mean','var'}; updates happen only when the collection is mutable.
    """

    features: int
    momentum: float = 0.1     # torch convention: new = (1-m)*old + m*batch
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        f = self.features
        scale = self.param("scale", nn.initializers.ones, (f,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((f,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((f,), jnp.float32))
        x32 = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        if train:
            mean, var = _moments(x32, axes)
            mean = jnp.squeeze(mean)
            var = jnp.squeeze(var)
            if not self.is_initializing():
                n = x32.size // f  # elements per channel
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                # torch stores the Bessel-corrected batch var in running_var
                ra_var.value = ((1.0 - m) * ra_var.value
                                + m * var * (n / max(n - 1, 1)))
        else:
            mean, var = ra_mean.value, ra_var.value
        out = (x32 - mean) / jnp.sqrt(var + self.eps)
        out = out * scale + bias
        return out.astype(self.dtype)


def sample_layer_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """The reference's custom LayerNorm (networks.py:520-536).

    Per-sample mean/std over all non-batch dims with Bessel-corrected std and
    `(std + eps)` in the divisor (NOT `sqrt(var + eps)`), then per-channel
    affine. x: (N, H, W, C); gamma/beta: (C,).
    """
    x32 = x.astype(jnp.float32)
    n = x32[0].size  # elements per sample
    mean, var_b = _moments(x32, (1, 2, 3))
    # Bessel correction to match torch.std default (networks.py:526,529)
    var = var_b * (n / max(n - 1, 1))
    out = (x32 - mean) / (jnp.sqrt(var) + eps)
    out = out * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return out.astype(x.dtype)
