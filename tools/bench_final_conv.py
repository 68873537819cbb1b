"""Dev tool: final 7x7 Cout=4 conv reformulations on the real chip.

The decoder head (networks.py:260: 7x7 s1 conv 64->4 + tanh) uses 4 of 128
MXU lanes in the natural formulation (~6 TF/s measured). Candidate: pack P=32
output columns into lanes via an expanded sparse kernel — conv 7x(P+6),
stride (1,P), Cout=P*4=128 — then a pure reshape. (P+6)/7 = 5.4x the MACs at
32x the lane utilization => ~6x net if XLA tiles it well.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from aclgan_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()  # repo-local persistent cache; survives /tmp wipes

B = int(os.environ.get("B", "48"))
N = int(os.environ.get("N", "30"))
P = int(os.environ.get("P", "32"))
DT = jnp.bfloat16
H = W = 256
CIN, COUT = 64, 4


def direct(xp, w):
    return lax.conv_general_dilated(
        xp, w.astype(xp.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def build_w2(w, p):
    kh, kw, cin, cout = w.shape
    w2 = jnp.zeros((kh, p + kw - 1, cin, p * cout), w.dtype)
    for j in range(p):
        w2 = w2.at[:, j:j + kw, :, j * cout:(j + 1) * cout].set(w)
    return w2


def packed(xp, w):
    b, hp, wp, cin = xp.shape
    kh, kw, _, cout = w.shape
    w2 = build_w2(w, P)
    y = lax.conv_general_dilated(
        xp, w2.astype(xp.dtype), (1, P), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (b, H, W/P, P*cout)
    return y.reshape(b, hp - kh + 1, W, cout)


def timeit(name, fn, x, *args):
    def chained(x_in, *a):
        out = fn(x_in, *a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        factor = 1.0 + jnp.tanh(jnp.sum(leaf.astype(jnp.float32))) * 1e-6
        return out, x_in * factor.astype(x_in.dtype)

    chained = jax.jit(chained)
    out, x = chained(x, *args)
    float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(N):
        out, x = chained(x, *args)
    float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))
    dt = (time.time() - t0) / N
    print(f"{name:36s} {dt * 1000:8.2f} ms", flush=True)
    return out


def main():
    xp = jax.random.uniform(jax.random.PRNGKey(0), (B, H + 6, W + 6, CIN),
                            minval=-1, maxval=1).astype(DT)
    w = (jax.random.normal(jax.random.PRNGKey(1), (7, 7, CIN, COUT))
         * 0.05).astype(jnp.float32)
    print(f"batch {B}, {H}x{W}, {CIN}->{COUT}, P={P}, {DT.__name__}")

    import numpy as np

    a = np.asarray(jax.jit(direct)(xp, w), np.float32)
    bq = np.asarray(jax.jit(packed)(xp, w), np.float32)
    print("max |direct - packed| =", np.abs(a - bq).max())

    timeit("direct fwd", direct, xp, w)
    timeit("packed fwd", packed, xp, w)

    for name, fn in [("direct", direct), ("packed", packed)]:
        def fwd_bwd(xi, wk, fn=fn):
            def loss(args):
                return jnp.sum(jnp.square(fn(*args).astype(jnp.float32)))
            return jax.grad(loss)((xi, wk))

        timeit(f"{name} fwd+bwd", fwd_bwd, xp, w)


if __name__ == "__main__":
    main()


def component_grads():
    xp = jax.random.uniform(jax.random.PRNGKey(0), (B, H + 6, W + 6, CIN),
                            minval=-1, maxval=1).astype(DT)
    w = (jax.random.normal(jax.random.PRNGKey(1), (7, 7, CIN, COUT))
         * 0.05).astype(jnp.float32)
    for name, fn in [("direct", direct), ("packed", packed)]:
        def dx_only(xi, wk, fn=fn):
            def loss(xi2):
                return jnp.sum(jnp.square(fn(xi2, wk).astype(jnp.float32)))
            return jax.grad(loss)(xi)

        def dw_only(xi, wk, fn=fn):
            def loss(wk2):
                return jnp.sum(jnp.square(fn(xi, wk2).astype(jnp.float32)))
            return jax.grad(loss)(wk)

        timeit(f"{name} fwd+dx", dx_only, xp, w)
        timeit(f"{name} fwd+dw", dw_only, xp, w)
