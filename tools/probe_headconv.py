"""Polyphase (space-to-depth) formulations for the channel-starved heads.

The two first-layer convs consume Cin=3 images, so the natural GEMM uses a
reduction depth of k*k*3 with Cin padded 3->8 by XLA; measured 22 TF/s on
the gen 7x7 head (probe_quant.py) vs ~115-170 TF/s on the Cin>=64 convs.
Factor-2 space-to-depth repacks 2x2 pixels into channels (Cin 3->12):

  gen head   7x7 s1 p3, 3->64:  conv(4,4,12,256) s1 on StD(xp) + depth-to-
             space on the output phases — 1.31x the MACs at 4x lane depth
  dis head   4x4 s2 p1, 3->64:  conv(2,2,12,64) s1 on StD(xp) — a PURE
             kernel reshape, zero MAC overhead, output already at H/2

This probe measures fwd and fwd+bwd (autodiff through the packed-kernel
construction) for both formulations at the real model shapes.

Run on the chip:  python tools/probe_headconv.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/aclgan_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DN = ("NHWC", "HWIO", "NHWC")


def log(*a):
    print(*a, flush=True)


def _sync(x):
    float(jnp.sum(x[..., :1].astype(jnp.float32)))


def _time(fn, *args, iters=20, warmup=12):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out[0] if isinstance(out, (tuple, list)) else out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(out[0] if isinstance(out, (tuple, list)) else out)
    return (time.time() - t0) / iters


def space_to_depth(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(y, cout):
    b, h, w, _ = y.shape
    y = y.reshape(b, h, w, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * h, 2 * w, cout)


def pack_w_head7(w):
    """(7,7,cin,cout) -> (4,4,4*cin,4*cout) polyphase kernel.

    W2[t, s, (a*2+b2)*cin+ci, (p*2+q)*cout+c] = w[2t+a-p, 2s+b2-q, ci, c]
    for 0 <= 2t+a-p < 7 (else 0).
    """
    cin, cout = w.shape[2], w.shape[3]
    w2 = jnp.zeros((4, 4, 4 * cin, 4 * cout), w.dtype)
    for p in range(2):
        for q in range(2):
            for a in range(2):
                for b2 in range(2):
                    for t in range(4):
                        dy = 2 * t + a - p
                        if not 0 <= dy < 7:
                            continue
                        for s in range(4):
                            dx = 2 * s + b2 - q
                            if not 0 <= dx < 7:
                                continue
                            w2 = w2.at[
                                t, s,
                                (a * 2 + b2) * cin:(a * 2 + b2 + 1) * cin,
                                (p * 2 + q) * cout:(p * 2 + q + 1) * cout,
                            ].set(w[dy, dx])
    return w2


def pack_w_dis4(w):
    """(4,4,cin,cout) -> (2,2,4*cin,cout); pure reshuffle (stride-2 case)."""
    cin, cout = w.shape[2], w.shape[3]
    w2 = jnp.zeros((2, 2, 4 * cin, cout), w.dtype)
    for a in range(2):
        for b2 in range(2):
            for t in range(2):
                for s in range(2):
                    w2 = w2.at[
                        t, s, (a * 2 + b2) * cin:(a * 2 + b2 + 1) * cin, :
                    ].set(w[2 * t + a, 2 * s + b2])
    return w2


def probe_gen_head(batch, h=256, cin=3, cout=64):
    kx = jax.random.PRNGKey(0)
    xp = jax.random.normal(kx, (batch, h + 6, h + 6, cin), jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(kx, 1), (7, 7, cin, cout),
                          jnp.bfloat16) * 0.1
    flops = 2.0 * batch * h * h * cout * cin * 49

    @jax.jit
    def nat(x, wt):
        return lax.conv_general_dilated(
            x, wt, (1, 1), "VALID",
            dimension_numbers=lax.conv_dimension_numbers(x.shape, wt.shape, DN))

    # spatial check: xs over the padded input (h+6 even) has (h+6)/2 rows;
    # 4x4 VALID -> (h+6)/2 - 3 = h/2 rows, each holding 2 output phases.
    @jax.jit
    def poly2(x, wt):
        xs = space_to_depth(x)
        w2 = pack_w_head7(wt)
        y = lax.conv_general_dilated(
            xs, w2, (1, 1), "VALID",
            dimension_numbers=lax.conv_dimension_numbers(xs.shape, w2.shape, DN))
        return depth_to_space(y, cout)

    y0 = nat(xp, w)
    y1 = poly2(xp, w)
    err = float(jnp.max(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32))))
    t_nat = _time(nat, xp, w)
    t_poly = _time(poly2, xp, w)

    def loss_nat(x, wt):
        return jnp.sum(nat(x, wt).astype(jnp.float32))

    def loss_poly(x, wt):
        return jnp.sum(poly2(x, wt).astype(jnp.float32))

    g_nat = jax.jit(jax.grad(loss_nat, argnums=(0, 1)))
    g_poly = jax.jit(jax.grad(loss_poly, argnums=(0, 1)))
    tg_nat = _time(lambda *a: g_nat(*a)[0], xp, w)
    tg_poly = _time(lambda *a: g_poly(*a)[0], xp, w)
    gx0, gw0 = g_nat(xp, w)
    gx1, gw1 = g_poly(xp, w)
    gerr = max(
        float(jnp.max(jnp.abs(gx0.astype(jnp.float32) - gx1.astype(jnp.float32)))),
        float(jnp.max(jnp.abs(gw0.astype(jnp.float32) - gw1.astype(jnp.float32)))))
    log(f"gen head 7x7 b{batch}: nat {t_nat*1e3:6.2f} ms ({flops/t_nat/1e12:5.1f} TF/s)"
        f" | poly {t_poly*1e3:6.2f} ms ({t_nat/t_poly:4.2f}x) | max-err {err:.3e}\n"
        f"    bwd: nat {tg_nat*1e3:6.2f} ms | poly {tg_poly*1e3:6.2f} ms "
        f"({tg_nat/tg_poly:4.2f}x) | grad max-err {gerr:.3e}")


def probe_dis_head(batch, h=256, cin=3, cout=64):
    kx = jax.random.PRNGKey(2)
    xp = jax.random.normal(kx, (batch, h + 2, h + 2, cin), jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(kx, 1), (4, 4, cin, cout),
                          jnp.bfloat16) * 0.1
    flops = 2.0 * batch * (h // 2) * (h // 2) * cout * cin * 16

    @jax.jit
    def nat(x, wt):
        return lax.conv_general_dilated(
            x, wt, (2, 2), "VALID",
            dimension_numbers=lax.conv_dimension_numbers(x.shape, wt.shape, DN))

    @jax.jit
    def poly(x, wt):
        xs = space_to_depth(x)  # (h+2)/2 rows
        w2 = pack_w_dis4(wt)
        return lax.conv_general_dilated(
            xs, w2, (1, 1), "VALID",
            dimension_numbers=lax.conv_dimension_numbers(xs.shape, w2.shape, DN))

    y0 = nat(xp, w)
    y1 = poly(xp, w)
    err = float(jnp.max(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32))))
    t_nat = _time(nat, xp, w)
    t_poly = _time(poly, xp, w)

    def loss_nat(x, wt):
        return jnp.sum(nat(x, wt).astype(jnp.float32))

    def loss_poly(x, wt):
        return jnp.sum(poly(x, wt).astype(jnp.float32))

    g_nat = jax.jit(jax.grad(loss_nat, argnums=(0, 1)))
    g_poly = jax.jit(jax.grad(loss_poly, argnums=(0, 1)))
    tg_nat = _time(lambda *a: g_nat(*a)[0], xp, w)
    tg_poly = _time(lambda *a: g_poly(*a)[0], xp, w)
    log(f"dis head 4x4s2 b{batch} cin{cin}: nat {t_nat*1e3:6.2f} ms "
        f"({flops/t_nat/1e12:5.1f} TF/s) | poly {t_poly*1e3:6.2f} ms "
        f"({t_nat/t_poly:4.2f}x) | max-err {err:.3e}\n"
        f"    bwd: nat {tg_nat*1e3:6.2f} ms | poly {tg_poly*1e3:6.2f} ms "
        f"({tg_nat/tg_poly:4.2f}x)")


def main():
    log(f"probe_headconv: device={jax.devices()[0]}")
    probe_gen_head(128)   # inference bulk batch
    probe_gen_head(16)    # train batch
    probe_dis_head(16)
    probe_dis_head(16, cin=6)   # dis_B focus pair (input_dim_b=6)
    probe_dis_head(16, h=128)   # second dis scale


if __name__ == "__main__":
    main()
