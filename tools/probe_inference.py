"""Probe batch-inference formulations on the chip (VERDICT r2 item 2).

Measures the A->B translation path (content encode -> AdaIN decode -> blend,
test_batch.py:137-142 "bar") under different dispatch formulations:

- single dependency chain (the r2 bench harness): each launch's input is the
  previous launch's output, so launches serialize behind the ~70 ms
  per-launch overhead of the axon tunnel.
- K interleaved chains: chain i's launch depends only on its own previous
  output, so the host can keep K batches in flight and the runtime can
  overlap launch overhead with compute.
- in-executable scan: K chained translations inside ONE program (fewer
  launches; risks the superstep pathology measured for training,
  BENCH_NOTES "dispatch-level formulations").
- batch sweep.

All harness rules from BENCH_NOTES "measurement caveat" apply: byte-changing
chained inputs (no value-cache replay), host materialization as the barrier,
steady-state window after warmup.

Usage: python tools/probe_inference.py [variant ...]
Variants: chain1 chain2 chain3 scan4 (xN batch suffix, e.g. chain2x256)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from aclgan_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()  # repo-local persistent cache; survives /tmp wipes


def log(*a):
    print(*a, flush=True)


def build(batch: int):
    from aclgan_tpu.config import Config
    from aclgan_tpu.trainer import ACLGAN

    cfg = Config()
    cfg.batch_size = batch
    cfg.data.synthetic = True
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0), image_hw=(256, 256))

    @jax.jit
    def infer(params, xs, zs):
        img, _ = model.translate(params, xs, zs, a2b=True)
        factor = 1.0 + jnp.tanh(jnp.sum(img.astype(jnp.float32))) * 1e-6
        return img, xs * factor.astype(xs.dtype)

    def make_scan(k):
        @jax.jit
        def infer_k(params, xs, zs):
            def body(x, _):
                img, _m = model.translate(params, x, zs, a2b=True)
                factor = 1.0 + jnp.tanh(jnp.sum(img.astype(jnp.float32))) * 1e-6
                return x * factor.astype(x.dtype), img
            x, imgs = jax.lax.scan(body, xs, None, length=k)
            return imgs[-1], x
        return infer_k

    cfgd = cfg.gen.style_dim
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    z = jax.random.normal(k2, (batch, cfgd))
    return model, state, infer, make_scan, k1, z


def measure(name: str, n_chains: int, batch: int, scan_k: int = 0,
            warmup: int = 12, iters: int = 48):
    model, state, infer, make_scan, k1, z = build(batch)
    xs = [jax.device_put(jax.random.uniform(
        jax.random.fold_in(k1, i), (batch, 256, 256, 3), minval=-1, maxval=1))
        for i in range(n_chains)]
    fn = make_scan(scan_k) if scan_k else infer
    outs = [None] * n_chains

    t0 = time.time()
    for i in range(warmup):
        c = i % n_chains
        outs[c], xs[c] = fn(state.gen_params, xs[c], z)
    for c in range(n_chains):
        float(jnp.sum(outs[c].astype(jnp.float32)))
    t_warm = time.time() - t0

    t0 = time.time()
    for i in range(iters):
        c = i % n_chains
        outs[c], xs[c] = fn(state.gen_params, xs[c], z)
    for c in range(n_chains):
        float(jnp.sum(outs[c].astype(jnp.float32)))
    dt = time.time() - t0
    imgs = iters * batch * (scan_k or 1)
    log(f"{name}: batch={batch} chains={n_chains} scan={scan_k or '-'} "
        f"warmup={t_warm:.1f}s  {imgs} imgs in {dt:.3f}s -> "
        f"{imgs / dt:.1f} img/s  ({dt / iters * 1e3:.1f} ms/launch)")
    return imgs / dt


def main():
    names = sys.argv[1:] or ["chain1", "chain2", "chain3", "chain1x256",
                             "chain2x256", "scan4"]
    dev = jax.devices()[0]
    log(f"probe_inference: device={dev}")
    for name in names:
        base, _, bs = name.partition("x")
        batch = int(bs) if bs else 128
        if base.startswith("chain"):
            measure(name, int(base[5:]), batch)
        elif base.startswith("scan"):
            measure(name, 1, batch, scan_k=int(base[4:]))
        else:
            log(f"unknown variant {name}")


if __name__ == "__main__":
    main()
