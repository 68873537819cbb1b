"""Dev tool: compare upsample+conv formulations at the decoder's shapes.

Times fwd and fwd+bwd of naive / phase(collapsed-tap + depth-to-space) /
lhs-dilated at both decoder layers on the real chip. Uses the chained-input
harness (BENCH_NOTES "measurement caveat")."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from aclgan_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()  # repo-local persistent cache; survives /tmp wipes

from aclgan_tpu.ops.upsample_conv import (
    upsample2x_conv5x5,
    upsample2x_conv5x5_dilated,
    upsample2x_conv5x5_naive,
)

B = int(os.environ.get("B", "16"))
N = int(os.environ.get("N", "30"))
DT = jnp.bfloat16


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
    print(f"{name:44s} {dt * 1000:8.2f} ms", flush=True)
    return dt


def main():
    for h, cin, cout in [(64, 256, 128), (128, 128, 64)]:
        x = jax.random.uniform(jax.random.PRNGKey(0), (B, h, h, cin),
                               minval=-1, maxval=1).astype(DT)
        k = (jax.random.normal(jax.random.PRNGKey(1), (5, 5, cin, cout))
             * 0.05).astype(jnp.float32)
        b = jnp.zeros((cout,), jnp.float32)
        print(f"--- {h}x{h} {cin}->{cout} batch {B} {DT.__name__}")
        for name, fn in [("phase", upsample2x_conv5x5),
                         ("dilated", upsample2x_conv5x5_dilated),
                         ("naive", upsample2x_conv5x5_naive)]:
            timeit(f"{name} fwd", lambda xi, kk: fn(xi, kk, b, "reflect"), x, k)

            def fwd_bwd(xi, kk, fn=fn):
                def loss(args):
                    xi2, kk2 = args
                    return jnp.sum(jnp.square(
                        fn(xi2, kk2, b, "reflect").astype(jnp.float32)))
                gx, gk = jax.grad(loss)((xi, kk))
                return gx, gk

            timeit(f"{name} fwd+bwd", fwd_bwd, x, k)


if __name__ == "__main__":
    main()
