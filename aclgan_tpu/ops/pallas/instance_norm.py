"""Pallas TPU kernel: fused instance-norm (+AdaIN affine) (+activation).

Motivation (SURVEY §2.11): the generator's hot path is the resblock stack at
content resolution (64x64x256 for 256² inputs) where every conv is followed
by IN or AdaIN and an activation. These norms are HBM-bandwidth-bound; XLA
computes stats and normalization as separate passes over the activation
(~2 reads + 1 write). When a whole (H*W, C) sample slab fits in VMEM the
fused kernel does 1 read + 1 write: load slab, reduce mean/var in-register,
normalize + affine + activation, store.

Grid: one program per batch sample; block = the full (1, H, W, C) slab.
Stats in f32 regardless of input dtype (bf16-safe). Falls back to the jnp
path (aclgan_tpu.ops.norms) when the slab exceeds the VMEM budget or the
platform is not TPU.

Backward is a custom VJP with the same memory pattern: one kernel computing
dx (and per-(n,c) dscale/dshift for AdaIN) from (x, dy) in a single fused
pass, using the standard IN gradient
    dx = rsig * s * (dy - mean(dy) - xhat * mean(dy * xhat)).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aclgan_tpu.ops.activations import apply_activation

# The kernel's VMEM working set is ~3 f32 copies of the slab (input upcast,
# intermediates, output) against the ~16MB scoped-vmem limit, so cap the
# per-sample element count at ~1.2M (covers the hot 64x64x256 resblock
# layers; larger layers fall back to the XLA path).
_MAX_SLAB_ELEMENTS = 1_200_000


def _slab_fits(x: jnp.ndarray) -> bool:
    n, h, w, c = x.shape
    return h * w * c <= _MAX_SLAB_ELEMENTS


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _act(y, activ):
    # activations used by the generator path (prelu excluded: has a param)
    if activ == "relu":
        return jnp.maximum(y, 0.0)
    if activ == "lrelu":
        return jnp.where(y >= 0, y, 0.2 * y)
    if activ == "tanh":
        return jnp.tanh(y)
    if activ == "none":
        return y
    raise ValueError(activ)


# ---------------------------------------------------------------- forward
def _fwd_kernel(x_ref, s_ref, b_ref, o_ref, *, eps, activ, affine):
    x = x_ref[0].astype(jnp.float32)          # (H, W, C)
    mean = jnp.mean(x, axis=(0, 1), keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=(0, 1), keepdims=True)
    rsig = jax.lax.rsqrt(var + eps)
    y = xc * rsig
    if affine:
        y = y * s_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    o_ref[0] = _act(y, activ).astype(o_ref.dtype)


def _fwd_pallas(x, scale, shift, eps, activ):
    n, h, w, c = x.shape
    affine = scale is not None
    slab = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    # per-sample vectors as (N, 1, C) so the block's trailing dims equal the
    # array's (TPU lowering constraint on sub-(8,128) blocks)
    vec = pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    if not affine:  # feed dummies so the kernel arity is static
        scale = jnp.ones((n, c), jnp.float32)
        shift = jnp.zeros((n, c), jnp.float32)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, activ=activ, affine=affine),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n,),
        in_specs=[slab, vec, vec],
        out_specs=slab,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x, scale.reshape(n, 1, c), shift.reshape(n, 1, c))


# ---------------------------------------------------------------- backward
def _bwd_kernel(x_ref, s_ref, y_ref, dy_ref, dx_ref, ds_ref, db_ref,
                *, eps, activ, affine):
    """Fused activation-gate + IN/AdaIN backward, one pass per sample.

    The activation gate is derived from the saved OUTPUT y (no recompute of
    the pre-activation): relu/lrelu preserve sign (y>=0 <=> pre>=0) and
    tanh' = 1 - y^2.
    """
    x = x_ref[0].astype(jnp.float32)
    y = y_ref[0].astype(jnp.float32)
    dyp = dy_ref[0].astype(jnp.float32)
    if activ == "relu":
        dyp = jnp.where(y > 0, dyp, 0.0)
    elif activ == "lrelu":
        dyp = jnp.where(y >= 0, dyp, 0.2 * dyp)
    elif activ == "tanh":
        dyp = dyp * (1.0 - y * y)

    mean = jnp.mean(x, axis=(0, 1), keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=(0, 1), keepdims=True)
    rsig = jax.lax.rsqrt(var + eps)
    xhat = xc * rsig
    s = s_ref[0].astype(jnp.float32) if affine else 1.0

    m_dy = jnp.mean(dyp, axis=(0, 1), keepdims=True)
    m_dyx = jnp.mean(dyp * xhat, axis=(0, 1), keepdims=True)
    dx = rsig * s * (dyp - m_dy - xhat * m_dyx)
    dx_ref[0] = dx.astype(dx_ref.dtype)
    ds_ref[0, 0] = jnp.sum(dyp * xhat, axis=(0, 1)).astype(ds_ref.dtype)
    db_ref[0, 0] = jnp.sum(dyp, axis=(0, 1)).astype(db_ref.dtype)


def _bwd_pallas(x, scale, y, dy, eps, activ):
    """dx, dscale, dshift for y = act(xhat*scale + shift)."""
    n, h, w, c = x.shape
    affine = scale is not None
    slab = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    if not affine:
        scale = jnp.ones((n, c), jnp.float32)
    dx, ds, db = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, activ=activ, affine=affine),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ),
        grid=(n,),
        in_specs=[slab, vec, slab, slab],
        out_specs=(slab, vec, vec),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x, scale.reshape(n, 1, c), y, dy)
    return dx, ds.reshape(n, c), db.reshape(n, c)


# ---------------------------------------------------------------- custom vjp
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_in(x, scale, shift, eps, activ):
    return _fwd_pallas(x, scale, shift, eps, activ)


def _fused_in_fwd(x, scale, shift, eps, activ):
    y = _fwd_pallas(x, scale, shift, eps, activ)
    return y, (x, scale, shift, y)


def _fused_in_bwd(eps, activ, res, dy):
    x, scale, shift, y = res
    dx, ds, db = _bwd_pallas(x, scale, y, dy.astype(x.dtype), eps, activ)
    if scale is not None:
        return dx.astype(x.dtype), ds.astype(scale.dtype), db.astype(shift.dtype)
    return dx.astype(x.dtype), None, None


_fused_in.defvjp(_fused_in_fwd, _fused_in_bwd)


# ---------------------------------------------------------------- public API
def fused_instance_norm(
    x: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    shift: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
    activ: str = "none",
    use_pallas: bool = True,
) -> jnp.ndarray:
    """IN (scale/shift None) or AdaIN (+fused activation).

    x: (N,H,W,C); scale/shift: (N,C). Semantics identical to
    aclgan_tpu.ops.norms.{instance_norm, adaptive_instance_norm} +
    apply_activation; asserted by tests/test_pallas.py.
    """
    if use_pallas and _on_tpu() and _slab_fits(x) and activ in (
            "relu", "lrelu", "tanh", "none"):
        return _fused_in(x, scale, shift, eps, activ)
    # jnp fallback
    from aclgan_tpu.ops.norms import adaptive_instance_norm, instance_norm

    if scale is not None:
        y = adaptive_instance_norm(x, scale, shift, eps)
    else:
        y = instance_norm(x, eps)
    return apply_activation(y, activ)
