"""High-resolution memory probe on one chip (VERDICT r2 item 6b).

Documents what resolution a single v5e chip can actually train/serve and at
what throughput — the memory claim behind spatial sharding
(parallel/spatial.py: >256^2 images are the purpose scale). For each
(resolution, batch, remat) point: compile + run a few fused D+G train steps,
report ms/iter or OOM. Also probes inference-only at higher resolutions.

    python tools/probe_resolution.py            # default matrix
    python tools/probe_resolution.py train:512:4:decode infer:1024:8
    python tools/probe_resolution.py train:512:16:off:2   # grad_accum=2

A 5th train field sets tpu.grad_accum: train:RES:BATCH:REMAT:ACCUM probes
whether accumulation buys effective batches past the direct envelope
(memory = one micro-batch, tests/test_grad_accum.py pins the semantics).

Results land in BENCH_NOTES.md by hand.
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


def _is_oom(e: Exception) -> bool:
    s = str(e)
    return "RESOURCE_EXHAUSTED" in s or "Out of memory" in s or "exceeds" in s


def _is_compile_fail(e: Exception) -> bool:
    # the axon remote-compile helper dies (HTTP 500) on some very large
    # programs — report the point as compile-failed and keep probing
    return "remote_compile" in str(e) or "tpu_compile_helper" in str(e)


def probe_train(res: int, batch: int, remat, accum: int = 1):
    from aclgan_tpu.config import Config
    from aclgan_tpu.trainer import ACLGAN

    cfg = Config()
    cfg.batch_size = batch
    cfg.data.synthetic = True
    cfg.data.new_size = res
    cfg.data.crop_image_height = cfg.data.crop_image_width = res
    cfg.tpu.remat = remat
    cfg.tpu.grad_accum = accum
    label = (f"train {res}^2 batch {batch} remat={remat or 'off'}"
             + (f" accum={accum}" if accum > 1 else ""))
    try:
        model = ACLGAN(cfg)
        state = model.init_state(jax.random.PRNGKey(0), image_hw=(res, res))
        k = jax.random.PRNGKey(1)
        x_a = jax.device_put(jax.random.uniform(
            jax.random.fold_in(k, 0), (batch, res, res, 3), minval=-1, maxval=1))
        x_b = jax.device_put(jax.random.uniform(
            jax.random.fold_in(k, 1), (batch, res, res, 3), minval=-1, maxval=1))
        t0 = time.time()
        state, m = model.train_step(state, x_a, x_b, k, True, True)
        float(m["loss_gen_total"])
        compile_s = time.time() - t0
        t0 = time.time()
        n = 6
        for _ in range(n):
            state, m = model.train_step(state, x_a, x_b, k, True, True)
        float(m["loss_gen_total"])
        dt = (time.time() - t0) / n
        log(f"{label}: OK  {dt * 1e3:.0f} ms/iter ({batch / dt:.2f} img/s; "
            f"compile {compile_s:.0f}s)")
    except Exception as e:
        if _is_oom(e):
            log(f"{label}: OOM ({str(e).splitlines()[0][:120]})")
        elif _is_compile_fail(e):
            log(f"{label}: COMPILE-FAIL ({str(e).splitlines()[0][:120]})")
        else:
            raise


def probe_infer(res: int, batch: int):
    from aclgan_tpu.config import Config
    from aclgan_tpu.trainer import ACLGAN

    cfg = Config()
    cfg.batch_size = batch
    cfg.data.synthetic = True
    label = f"infer {res}^2 batch {batch}"
    try:
        model = ACLGAN(cfg)
        state = model.init_state(jax.random.PRNGKey(0), image_hw=(res, res))
        z = jax.random.normal(jax.random.PRNGKey(2), (batch, cfg.gen.style_dim))
        x = jax.device_put(jax.random.uniform(
            jax.random.PRNGKey(1), (batch, res, res, 3), minval=-1, maxval=1))

        @jax.jit
        def infer(params, xs, zs):
            img, _ = model.translate(params, xs, zs, a2b=True)
            f = 1.0 + jnp.tanh(jnp.sum(img.astype(jnp.float32))) * 1e-6
            return img, xs * f.astype(xs.dtype)

        out, x = infer(state.gen_params, x, z)
        float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.time()
        n = 8
        for _ in range(n):
            out, x = infer(state.gen_params, x, z)
        float(jnp.sum(out.astype(jnp.float32)))
        dt = (time.time() - t0) / n
        log(f"{label}: OK  {dt * 1e3:.0f} ms/batch ({batch / dt:.1f} img/s)")
    except Exception as e:
        if _is_oom(e):
            log(f"{label}: OOM ({str(e).splitlines()[0][:120]})")
        elif _is_compile_fail(e):
            log(f"{label}: COMPILE-FAIL ({str(e).splitlines()[0][:120]})")
        else:
            raise


DEFAULT = [
    "train:512:4:off", "train:512:8:off", "train:512:8:decode",
    "train:512:12:decode", "train:768:2:decode", "train:1024:1:decode",
    "infer:512:32", "infer:1024:8",
]


def main():
    specs = sys.argv[1:] or DEFAULT
    log(f"probe_resolution: device={jax.devices()[0]}")
    for spec in specs:
        parts = spec.split(":")
        kind, res, batch = parts[0], int(parts[1]), int(parts[2])
        if kind == "train":
            remat = parts[3] if len(parts) > 3 else "off"
            accum = int(parts[4]) if len(parts) > 4 else 1
            probe_train(res, batch, False if remat == "off" else remat, accum)
        else:
            probe_infer(res, batch)


if __name__ == "__main__":
    main()
