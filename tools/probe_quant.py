"""Does int8 reach MXU 2x rate through XLA conv on this chip?

The bf16 inference roofline is ~1,140 img/s (BENCH_NOTES "inference
roofline"): convs already at 86% of bf16 peak, fusions at 87% HBM bw. The
only lever left toward the 2,000 img/s BASELINE target is int8 — v5e's MXU
runs s8xs8->s32 at 2x the bf16 rate, and int8 activations halve HBM bytes.

This probe measures, at the A->B path's hot conv shapes (batch 128):
  1. bf16 conv               (the current path)
  2. s8xs8->s32 conv         (weights+activations pre-quantized)
  3. s8 conv + dequant+IN+lrelu epilogue + requant to s8 (the full fused
     block pattern a quantized path would run)

Run on the chip:  python tools/probe_quant.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from aclgan_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()  # repo-local persistent cache; survives /tmp wipes

DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                ("NHWC", "HWIO", "NHWC"))


def log(*a):
    print(*a, flush=True)


def _sync(x):
    float(jnp.sum(x[..., :1].astype(jnp.float32)))


def _time(fn, x, *rest, iters=20, warmup=8):
    """Time fn(x, *rest) with the input chained through an in-graph sign-flip
    in the SAME executable (CLAUDE.md measurement caveat: byte-identical
    replays can be served from a value cache, a separate host-issued chain op
    stalls the backend, and a 1+1e-6 factor is a bf16 no-op; negation changes
    every byte at identical magnitudes — and is int8-safe)."""

    @jax.jit
    def step(x, *rest):
        out = fn(x, *rest)
        return out, -x

    out = None
    for _ in range(warmup):
        out, x = step(x, *rest)
    _sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.time()
    for _ in range(iters):
        out, x = step(x, *rest)
    _sync(out[0] if isinstance(out, tuple) else out)
    return (time.time() - t0) / iters


# hot shapes of the batched A->B translate (batch 128, 256^2 input):
# (H, W, Cin, Cout, k, stride) — resblock 3x3s @64^2 dominate (8 of them
# across content-enc + decoder), then the two upsample 5x5s and the s2
# downsamples.
SHAPES = [
    ("resblock 3x3 256ch @64^2", 64, 64, 256, 256, 3, 1),
    ("downsample 4x4 s2 64->128 @256^2", 256, 256, 64, 128, 4, 2),
    ("downsample 4x4 s2 128->256 @128^2", 128, 128, 128, 256, 4, 2),
    ("upsample-collapsed 3x3 256->128 @128^2", 128, 128, 256, 128, 3, 1),
    ("head 7x7 3->64 @256^2", 256, 256, 3, 64, 7, 1),
]


def probe_shape(name, h, w, cin, cout, k, stride, batch):
    pad = [(k // 2, k // 2)] * 2
    kx = jax.random.PRNGKey(0)
    x_f = jax.random.normal(kx, (batch, h, w, cin), jnp.bfloat16)
    w_f = jax.random.normal(jax.random.fold_in(kx, 1),
                            (k, k, cin, cout), jnp.bfloat16) * 0.05
    x_i = jnp.clip(jnp.round(x_f.astype(jnp.float32) * 20), -127, 127
                   ).astype(jnp.int8)
    w_i = jnp.clip(jnp.round(w_f.astype(jnp.float32) * 500), -127, 127
                   ).astype(jnp.int8)

    @jax.jit
    def conv_bf16(x, wt):
        return lax.conv_general_dilated(x, wt, (stride, stride), pad,
                                        dimension_numbers=DN)

    @jax.jit
    def conv_int8(x, wt):
        return lax.conv_general_dilated(x, wt, (stride, stride), pad,
                                        dimension_numbers=DN,
                                        preferred_element_type=jnp.int32)

    @jax.jit
    def conv_int8_block(x, wt, wscale, b):
        """Full quantized-block pattern: s8 conv -> dequant -> bias -> IN
        -> lrelu -> requant to s8 (what each ConvBlock would run)."""
        y = lax.conv_general_dilated(x, wt, (stride, stride), pad,
                                     dimension_numbers=DN,
                                     preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * wscale + b
        mu = jnp.mean(y, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(y - mu), axis=(1, 2), keepdims=True)
        y = (y - mu) * lax.rsqrt(var + 1e-5)
        y = jnp.where(y >= 0, y, 0.2 * y)
        amax = jnp.maximum(jnp.max(jnp.abs(y)), 1e-6)
        return jnp.clip(jnp.round(y * (127.0 / amax)), -127, 127
                        ).astype(jnp.int8), amax

    ho, wo = h // stride, w // stride
    flops = 2.0 * batch * ho * wo * cout * cin * k * k
    t_bf = _time(conv_bf16, x_f, w_f)
    t_i8 = _time(conv_int8, x_i, w_i)
    wscale = jnp.full((cout,), 1e-4, jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32)
    t_blk = _time(conv_int8_block, x_i, w_i, wscale, bias)
    log(f"{name}: bf16 {t_bf * 1e3:7.2f} ms ({flops / t_bf / 1e12:6.1f} TF/s) | "
        f"s8 {t_i8 * 1e3:7.2f} ms ({flops / t_i8 / 1e12:6.1f} TOP/s, "
        f"{t_bf / t_i8:4.2f}x) | s8+epilogue {t_blk * 1e3:7.2f} ms")


def main():
    batch = int(os.environ.get("PROBE_BATCH", "128"))
    log(f"probe_quant: device={jax.devices()[0]} batch={batch}")
    for spec in SHAPES:
        probe_shape(*spec, batch)


if __name__ == "__main__":
    main()
