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

jax.config.update("jax_compilation_cache_dir", "/tmp/aclgan_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from aclgan_tpu.config import Config
from aclgan_tpu.trainer import ACLGAN

B = int(os.environ.get("B", "16"))
N_ITER = int(os.environ.get("N", "20"))


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(N_ITER):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / N_ITER
    print(f"{name:34s} {dt * 1000:8.2f} ms")
    return dt


def main():
    cfg = Config()
    cfg.batch_size = B
    cfg.data.synthetic = True
    cfg.tpu.use_pallas = os.environ.get("PALLAS", "0") == "1"
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0), image_hw=(256, 256))
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, 256, 256, 3), minval=-1, maxval=1)
    z = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.gen.style_dim))
    print(f"batch={B} dtype={cfg.tpu.compute_dtype} pallas={cfg.tpu.use_pallas}")

    enc_c = jax.jit(model.gen_encode_content)
    enc_s = jax.jit(model.gen_encode_style)
    dec = jax.jit(model.gen_decode)
    dis = jax.jit(lambda p, s, x: model.dis_apply(p, s, x)[0])

    c = enc_c(state.gen_params["AB"], x.astype(model.dtype))
    timeit("encode_content (fwd)", enc_c, state.gen_params["AB"], x.astype(model.dtype))
    timeit("encode_style (fwd)", enc_s, state.gen_params["AB"], x.astype(model.dtype))
    timeit("decode (fwd)", dec, state.gen_params["AB"], c, z.astype(model.dtype))
    timeit("dis_A fwd", dis, state.dis_params["A"], state.dis_spectral["A"],
           x.astype(model.dtype))

    fwd = jax.jit(lambda gp, xa, xb: model.generator_forward(
        gp, xa, xb, z, z, z, True))
    timeit("generator_forward(recon) fwd", fwd, state.gen_params, x, x)

    def g_loss(gp, xa, xb):
        total, _ = model._gen_loss_fn(gp, state.dis_params, state.dis_spectral,
                                      xa, xb, z, z, z)
        return total

    g_grad = jax.jit(jax.grad(g_loss))
    timeit("G loss grad (fwd+bwd)", g_grad, state.gen_params, x, x)

    step_d = jax.jit(lambda s, xa, xb, k: model.train_step(s, xa, xb, k, True, False)[0].step)
    step_dg = jax.jit(lambda s, xa, xb, k: model.train_step(s, xa, xb, k, True, True)[0].step)
    timeit("D-only step", step_d, state, x, x, jax.random.PRNGKey(3))
    timeit("D+G step", step_dg, state, x, x, jax.random.PRNGKey(3))


if __name__ == "__main__":
    main()
