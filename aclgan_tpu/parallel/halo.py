"""Explicit halo-exchange convolution + sharded instance norm (shard_map).

parallel/spatial.py scales >256² images by letting XLA's GSPMD partitioner
insert the conv halo exchanges from sharding annotations. This module is the
*explicit* formulation of the same strategy — `shard_map` over a 'spatial'
mesh axis with hand-written collectives:

- halo_conv: each shard holds H/n rows; the rows a conv window needs across
  the boundary (top: `padding`, bottom: `k-1-padding`) travel to neighbors
  via `lax.ppermute` over ICI; the global top/bottom shards substitute their
  reflect/replicate/zero padding instead (computed locally, selected with a
  static-shape `jnp.where` on the axis index).
- sharded_instance_norm: per-(N,C) stats over a SHARDED spatial axis via
  `lax.psum` of local sums.

Used for control/fusion experiments and as the documented fallback should the
automatic partitioner regress; equivalence against the unsharded ops is
asserted in tests/test_halo.py on the virtual 8-device CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from aclgan_tpu.ops.pad import PAD_MODES as _PAD_MODES


def _edge_pad_rows(x_local: jnp.ndarray, n_rows: int, top: bool, pad_type: str):
    """The rows (N, n_rows, W, C) that jnp.pad would produce at the global
    image edge, computed from this shard's own rows."""
    if n_rows == 0:
        return x_local[:, :0]
    if pad_type == "zero":
        shape = (x_local.shape[0], n_rows) + x_local.shape[2:]
        return jnp.zeros(shape, x_local.dtype)
    if pad_type == "reflect":
        # reflect excludes the edge row: rows [n_rows..1] / [-2..-n_rows-1]
        return (x_local[:, 1:n_rows + 1][:, ::-1] if top
                else x_local[:, -n_rows - 1:-1][:, ::-1])
    if pad_type == "replicate":
        row = x_local[:, :1] if top else x_local[:, -1:]
        return jnp.repeat(row, n_rows, axis=1)
    raise ValueError(pad_type)


def halo_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    mesh: Mesh,
    stride: int = 1,
    padding: int = 0,
    pad_type: str = "reflect",
    axis: str = "spatial",
) -> jnp.ndarray:
    """Conv over an H-sharded NHWC activation with explicit halo exchange.

    Equivalent to `conv(pad(x_global))` with VALID conv of `kernel`
    (kh,kw,Cin,Cout) at `stride`, `padding` rows/cols of `pad_type`. Each
    shard's H must be divisible by stride and >= the halo sizes.
    """
    kh = kernel.shape[0]
    top_need = padding
    bot_need = kh - 1 - padding
    n_shards = mesh.shape[axis]
    # Shard-exactness preconditions (each shard emits H_local/stride rows, so
    # the global count H/stride must equal conv(pad(x_global))'s
    # floor((H + 2p - kh)/stride) + 1, and every shard's first window must
    # land on the global stride grid). Violations used to return silently
    # wrong-shaped output; every conv family in the model satisfies these
    # (3x3/p1/s1, 4x4/p1/s2, 5x5/p2/s1, 7x7/p3/s1, 1x1/p0/s1).
    if not 1 <= kh - 2 * padding <= stride:
        raise ValueError(
            f"halo_conv requires 1 <= kh - 2*padding <= stride "
            f"(got kh={kh}, padding={padding}, stride={stride})")
    h_local, rem = divmod(x.shape[1], n_shards)
    if rem or h_local % stride or max(top_need, bot_need) > h_local:
        raise ValueError(
            f"halo_conv: H={x.shape[1]} must split into {n_shards} shards of "
            f"stride-divisible height >= the halo ({top_need},{bot_need})")

    def body(x_local, kernel, bias):
        idx = lax.axis_index(axis)
        # neighbor halos via collective permute (ICI neighbor exchange)
        if top_need > 0:
            send_down = x_local[:, -top_need:]
            from_prev = lax.ppermute(
                send_down, axis,
                [(i, (i + 1) % n_shards) for i in range(n_shards)])
            top = jnp.where(idx == 0,
                            _edge_pad_rows(x_local, top_need, True, pad_type),
                            from_prev)
        else:
            top = x_local[:, :0]
        if bot_need > 0:
            send_up = x_local[:, :bot_need]
            from_next = lax.ppermute(
                send_up, axis,
                [(i, (i - 1) % n_shards) for i in range(n_shards)])
            bot = jnp.where(idx == n_shards - 1,
                            _edge_pad_rows(x_local, bot_need, False, pad_type),
                            from_next)
        else:
            bot = x_local[:, :0]

        xe = jnp.concatenate([top, x_local, bot], axis=1)
        if padding:  # width axis is unsharded: plain pad
            xe = jnp.pad(xe, ((0, 0), (0, 0), (padding, padding), (0, 0)),
                         mode=_PAD_MODES[pad_type])
        y = lax.conv_general_dilated(
            xe, kernel.astype(xe.dtype), (stride, stride), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(y.dtype)

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis), P(), P()),
        out_specs=P(None, axis),
    )(x, kernel, bias)


def sharded_instance_norm(
    x: jnp.ndarray,
    mesh: Mesh,
    eps: float = 1e-5,
    axis: str = "spatial",
) -> jnp.ndarray:
    """Instance norm over an H-sharded activation: global per-(N,C) stats via
    psum of local sums (the collective the reference's cuDNN op never needed
    — SURVEY §2.12)."""

    def body(x_local):
        x32 = x_local.astype(jnp.float32)
        local_n = x32.shape[1] * x32.shape[2]
        total_n = local_n * mesh.shape[axis]
        s = lax.psum(jnp.sum(x32, axis=(1, 2)), axis)          # (N, C)
        ss = lax.psum(jnp.sum(x32 * x32, axis=(1, 2)), axis)
        mean = s / total_n
        # clamp: E[x^2]-E[x]^2 can go slightly negative under fp cancellation
        # (large mean, tiny spread), and rsqrt(negative+eps) would emit NaN —
        # same guard as ops/norms._moments
        var = jnp.maximum(ss / total_n - mean * mean, 0.0)
        out = (x32 - mean[:, None, None, :]) * lax.rsqrt(var + eps)[:, None, None, :]
        return out.astype(x_local.dtype)

    return shard_map(
        body, mesh=mesh,
        in_specs=P(None, axis),
        out_specs=P(None, axis),
    )(x)
