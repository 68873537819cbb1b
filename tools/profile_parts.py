"""Dev tool: per-component timing of the training step on the real chip.

Times each sub-graph (encodes, decodes, discriminators, D-step, G-step,
fused step) and reports achieved TFLOP/s against an analytic FLOP count, to
show where the iteration time goes. Run on TPU: `python tools/profile_parts.py`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from aclgan_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()  # repo-local persistent cache; survives /tmp wipes

from aclgan_tpu.config import Config
from aclgan_tpu.trainer import ACLGAN

B = int(os.environ.get("B", "16"))
N_ITER = int(os.environ.get("N", "20"))


def timeit(name, fn, x, *args):
    """Times fn(x, *args) with a serializing data dependency: each iteration
    feeds a 0-scaled summary of the previous output back into x, so the
    runtime cannot overlap or elide repeated identical executions. The full
    output is returned from the jitted body (nothing DCE-able); extra args
    are runtime jit args, not baked constants."""

    def chained(x_in, *a):
        out = fn(x_in, *a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        # Serialize + defeat value-level execution caching: the next input
        # must (a) depend on this output and (b) differ in its BYTES, or a
        # content-addressed runtime can replay the previous result. A
        # 1±1e-6 multiplicative drift is timing-neutral but changes every
        # element.
        factor = 1.0 + jnp.tanh(jnp.sum(leaf.astype(jnp.float32))) * 1e-6
        return out, x_in * factor.astype(x_in.dtype)

    chained = jax.jit(chained)
    out, x = chained(x, *args)
    # host materialization is the sync barrier: block_until_ready
    # under-synchronizes on the axon backend (see BENCH_NOTES.md)
    float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(N_ITER):
        out, x = chained(x, *args)
    float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))
    dt = (time.time() - t0) / N_ITER
    print(f"{name:34s} {dt * 1000:8.2f} ms", flush=True)
    return dt


def main():
    cfg = Config()
    cfg.batch_size = B
    cfg.data.synthetic = True
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0), image_hw=(256, 256))
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, 256, 256, 3), minval=-1, maxval=1)
    z = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.gen.style_dim))
    print(f"batch={B} dtype={cfg.tpu.compute_dtype}")

    xd = x.astype(model.dtype)
    c = jax.jit(model.gen_encode_content)(state.gen_params["AB"], xd)
    zd = z.astype(model.dtype)

    timeit("encode_content (fwd)",
           lambda xi, p: model.gen_encode_content(p, xi), xd, state.gen_params["AB"])
    timeit("encode_style (fwd)",
           lambda xi, p: model.gen_encode_style(p, xi), xd, state.gen_params["AB"])
    timeit("decode (fwd)",
           lambda ci, p: model.gen_decode(p, ci, zd), c, state.gen_params["AB"])
    timeit("dis_A fwd",
           lambda xi, p, s: model.dis_apply(p, s, xi)[0], xd,
           state.dis_params["A"], state.dis_spectral["A"])
    timeit("generator_forward(recon) fwd",
           lambda xi, gp: model.generator_forward(gp, xi, xi, z, z, z, True),
           x, state.gen_params)

    def g_grad(xa, gp, dp, ds):
        def loss(gp):
            total, _ = model._gen_loss_fn(gp, dp, ds, state.dis_stats,
                                          xa, xa, z, z, z)
            return total
        return jax.grad(loss)(gp)

    timeit("G param grads (fwd+bwd)", g_grad, x, state.gen_params,
           state.dis_params, state.dis_spectral)

    def d_grad(xa, gp, dp, ds):
        fwd = model.generator_forward(gp, xa, xa, z, z, z, False)
        fwd = jax.tree_util.tree_map(jax.lax.stop_gradient, fwd)

        def loss(dp):
            total, _ = model._dis_loss_fn(dp, ds, state.dis_stats, fwd, xa, xa)
            return total
        return jax.grad(loss)(dp)

    timeit("D param grads (gen fwd + D bwd)", d_grad, x, state.gen_params,
           state.dis_params, state.dis_spectral)
    timeit("D-only step",
           lambda xi, s: model.train_step(s, xi, xi, jax.random.PRNGKey(3),
                                          True, False)[0], x, state)
    timeit("D+G step",
           lambda xi, s: model.train_step(s, xi, xi, jax.random.PRNGKey(3),
                                          True, True)[0], x, state)


if __name__ == "__main__":
    main()
