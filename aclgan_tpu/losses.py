"""Loss heads as pure functions on per-scale logit lists.

Reference couples these to the discriminator module (networks.py:60-106) and
the trainer (trainer.py:85-88, 145-165); here they are standalone, f32 math,
jit-friendly (no data-dependent control flow).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

Logits = List[jnp.ndarray]


def _f32(xs: Logits) -> Logits:
    return [x.astype(jnp.float32) for x in xs]


def _bce_with_logits(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    """mean BCE(sigmoid(logits), target) — numerically-stable form of
    F.binary_cross_entropy(F.sigmoid(x), t) (networks.py:71-72)."""
    # log(1+e^-|x|) + max(x,0) - t*x
    return jnp.mean(jnp.logaddexp(0.0, logits) - target * logits)


def dis_loss(fake_outs: Logits, real_outs: Logits, gan_type: str) -> jnp.ndarray:
    """D-step loss: push D(fake)->0, D(real)->1, summed over scales
    (calc_dis_loss, networks.py:60-75)."""
    loss = 0.0
    for out0, out1 in zip(_f32(fake_outs), _f32(real_outs)):
        if gan_type == "lsgan":
            loss += jnp.mean(jnp.square(out0)) + jnp.mean(jnp.square(out1 - 1.0))
        elif gan_type == "nsgan":
            loss += _bce_with_logits(out0, 0.0) + _bce_with_logits(out1, 1.0)
        else:
            raise ValueError(f"Unsupported GAN type: {gan_type!r}")
    return loss


def gen_loss(fake_outs: Logits, gan_type: str) -> jnp.ndarray:
    """G-step loss: push D(fake)->1, summed over scales
    (calc_gen_loss, networks.py:77-89)."""
    loss = 0.0
    for out0 in _f32(fake_outs):
        if gan_type == "lsgan":
            loss += jnp.mean(jnp.square(out0 - 1.0))
        elif gan_type == "nsgan":
            loss += _bce_with_logits(out0, 1.0)
        else:
            raise ValueError(f"Unsupported GAN type: {gan_type!r}")
    return loss


def gen_d2_loss(pair1_outs: Logits, pair2_outs: Logits, gan_type: str) -> jnp.ndarray:
    """Generator-side consistency loss: push D2(pair1)->1, D2(pair2)->0 —
    the mirror of dis_loss(pair1, pair2) (calc_gen_d2_loss, networks.py:91-106)."""
    loss = 0.0
    for out0, out1 in zip(_f32(pair1_outs), _f32(pair2_outs)):
        if gan_type == "lsgan":
            loss += jnp.mean(jnp.square(out0 - 1.0)) + jnp.mean(jnp.square(out1))
        elif gan_type == "nsgan":
            loss += _bce_with_logits(out0, 1.0) + _bce_with_logits(out1, 0.0)
        else:
            raise ValueError(f"Unsupported GAN type: {gan_type!r}")
    return loss


def l1_loss(x: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """mean |x - target| (recon_criterion, trainer.py:61-62)."""
    return jnp.mean(jnp.abs(x.astype(jnp.float32) - target.astype(jnp.float32)))


def focus_translation(x_fg: jnp.ndarray, x_bg: jnp.ndarray, x_focus: jnp.ndarray) -> jnp.ndarray:
    """Train-time mask blend: mask=(focus+1)/2; fg*mask + bg*(1-mask)
    (trainer.py:85-88). x_focus: (N,H,W,1) broadcast over channels."""
    x_map = (x_focus.astype(jnp.float32) + 1.0) * 0.5
    return (x_fg.astype(jnp.float32) * x_map
            + x_bg.astype(jnp.float32) * (1.0 - x_map)).astype(x_fg.dtype)


def focus_translation_eval(x_fg: jnp.ndarray, x_bg: jnp.ndarray, x_focus: jnp.ndarray) -> jnp.ndarray:
    """Test-time variant: blends in [0,1] space then rescales to [-1,1]
    (test.py:73-76 / test_batch.py:74-77 — a deliberate train/test difference
    in the reference, preserved here)."""
    x_map = (x_focus.astype(jnp.float32) + 1.0) * 0.5
    fg01 = (x_fg.astype(jnp.float32) + 1.0) * 0.5
    bg01 = (x_bg.astype(jnp.float32) + 1.0) * 0.5
    out = fg01 * x_map + bg01 * (1.0 - x_map)
    return (out * 2.0 - 1.0).astype(x_fg.dtype)


def focus_size_loss(mask01: jnp.ndarray, upper: float, lower: float, delta: float) -> jnp.ndarray:
    """relu(sum(m - upper))^2*delta + relu(sum(lower - m))^2*delta over the whole
    batch tensor (trainer.py:149-157; note the sums run over ALL elements, so
    upper/lower act per-element through the summed slack)."""
    m = mask01.astype(jnp.float32)
    over = jax.nn.relu(jnp.sum(m - upper))
    under = jax.nn.relu(jnp.sum(lower - m))
    return (over * over + under * under) * delta


def focus_digit_loss(mask01: jnp.ndarray, epsilon: float) -> jnp.ndarray:
    """Binarization pressure: sum(1/(|m-0.5|+eps)) (trainer.py:151,154,158)."""
    m = mask01.astype(jnp.float32)
    return jnp.sum(1.0 / (jnp.abs(m - 0.5) + epsilon))
