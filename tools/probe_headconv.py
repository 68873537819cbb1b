"""Standalone chip measurement of the polyphase head-conv formulations.

Measures the SHIPPED transforms (imported from aclgan_tpu.ops.head_conv —
no duplicated packing code, so the probe always measures exactly what
production runs) at the real model shapes:

  gen head   7x7 s1 p3, 3->64   natural vs polyphase (s2d -> packed 4x4 ->
                                d2s) and the mixed custom_vjp, fwd and
                                vjp-apply with a random cotangent
  dis head   4x4 s2 p1, 3->64   natural vs polyphase (pure kernel reshuffle)

Timing discipline (CLAUDE.md "measurement caveat"): each timed iteration
chains its input through a byte-changing in-graph sign-flip INSIDE the same
executable (a separate host-issued chain op stalls the axon backend;
byte-identical replays can be served from a value cache; and a 1+1e-6
factor is a no-op in bfloat16), and the barrier is a host materialization,
not block_until_ready. The vjp-apply is timed with a
fixed random cotangent (a sum() loss's trivial cotangent lets XLA elide the
depth-to-space entirely, inflating the polyphase backward).

Run on the chip:  python tools/probe_headconv.py
In-situ arbitration (the decision record) is the full fused-step bench —
BENCH_NOTES "Round 3: polyphase heads".
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from aclgan_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()  # repo-local persistent cache; survives /tmp wipes

from aclgan_tpu.ops.head_conv import (  # noqa: E402
    dis_head_conv4s2,
    gen_head_conv7,
    head7_polyphase,
)
from aclgan_tpu.ops.pad import pad2d  # noqa: E402

_DN = ("NHWC", "HWIO", "NHWC")
# Per-iteration in-graph input chain: NEGATION, not a 1+eps factor — in
# bfloat16 the constant (1+1e-6) rounds to exactly 1.0 (7 mantissa bits), so
# a multiplicative chain would be a byte-identical no-op. Sign-flip changes
# every byte while preserving magnitudes.


def log(*a):
    print(*a, flush=True)


def _sync(x):
    float(jnp.sum(x[..., :1].astype(jnp.float32)))


def _time_fwd(fn, x, w, iters=20, warmup=12):
    """Time fn(x, w) with the input chain folded into the SAME executable."""

    @jax.jit
    def step(x, w):
        return fn(x, w), -x

    out = None
    for _ in range(warmup):
        out, x = step(x, w)
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out, x = step(x, w)
    _sync(out)
    return (time.time() - t0) / iters


def _time_vjp(fn, x, w, cot, iters=20, warmup=12):
    """Time the full fwd+vjp-apply against a REAL (random) cotangent, input
    chained in-graph."""

    @jax.jit
    def step(x, w, cot):
        y, vjp = jax.vjp(lambda a, b: fn(a, b), x, w)
        dx, dw = vjp(cot)
        return dx, dw, -x, -cot

    dx = None
    for _ in range(warmup):
        dx, dw, x, cot = step(x, w, cot)
    _sync(dx)
    t0 = time.time()
    for _ in range(iters):
        dx, dw, x, cot = step(x, w, cot)
    _sync(dx)
    return (time.time() - t0) / iters


def probe_gen_head(batch, h=256, cin=3, cout=64):
    kx = jax.random.PRNGKey(0)
    x = jax.random.normal(kx, (batch, h, h, cin), jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(kx, 1), (7, 7, cin, cout),
                          jnp.bfloat16) * 0.1
    cot = jax.random.normal(jax.random.fold_in(kx, 2), (batch, h, h, cout),
                            jnp.bfloat16)
    flops = 2.0 * batch * h * h * cout * cin * 49

    def nat(x, wt):
        return lax.conv_general_dilated(
            pad2d(x, 3, "reflect"), wt, (1, 1), "VALID",
            dimension_numbers=_DN)

    variants = [("nat  ", nat),
                ("poly ", lambda x, wt: head7_polyphase(x, wt, "reflect")),
                ("mixed", lambda x, wt: gen_head_conv7(x, wt, "reflect"))]
    y0 = None
    for name, fn in variants:
        y = fn(x, w)
        if y0 is None:
            y0 = y
        err = float(jnp.max(jnp.abs(y.astype(jnp.float32)
                                    - y0.astype(jnp.float32))))
        tf = _time_fwd(fn, x, w)
        tb = _time_vjp(fn, x, w, cot)
        log(f"gen head 7x7 b{batch} {name}: fwd {tf*1e3:6.2f} ms "
            f"({flops/tf/1e12:5.1f} TF/s) | fwd+vjp {tb*1e3:6.2f} ms "
            f"| fwd max-err {err:.3e}")


def probe_dis_head(batch, h=256, cin=3, cout=64):
    kx = jax.random.PRNGKey(2)
    x = jax.random.normal(kx, (batch, h, h, cin), jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(kx, 1), (4, 4, cin, cout),
                          jnp.bfloat16) * 0.1
    cot = jax.random.normal(jax.random.fold_in(kx, 2),
                            (batch, h // 2, h // 2, cout), jnp.bfloat16)
    flops = 2.0 * batch * (h // 2) * (h // 2) * cout * cin * 16

    def nat(x, wt):
        return lax.conv_general_dilated(
            pad2d(x, 1, "reflect"), wt, (2, 2), "VALID",
            dimension_numbers=_DN)

    variants = [("nat ", nat),
                ("poly", lambda x, wt: dis_head_conv4s2(x, wt, "reflect"))]
    y0 = None
    for name, fn in variants:
        y = fn(x, w)
        if y0 is None:
            y0 = y
        err = float(jnp.max(jnp.abs(y.astype(jnp.float32)
                                    - y0.astype(jnp.float32))))
        tf = _time_fwd(fn, x, w)
        tb = _time_vjp(fn, x, w, cot)
        log(f"dis head 4x4s2 b{batch} cin{cin} h{h} {name}: fwd "
            f"{tf*1e3:6.2f} ms ({flops/tf/1e12:5.1f} TF/s) | fwd+vjp "
            f"{tb*1e3:6.2f} ms | fwd max-err {err:.3e}")


def main():
    log(f"probe_headconv: device={jax.devices()[0]}")
    probe_gen_head(128)   # inference bulk batch
    probe_gen_head(16)    # train batch
    probe_dis_head(16)
    probe_dis_head(16, h=128)   # second dis scale


if __name__ == "__main__":
    main()
