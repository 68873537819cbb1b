"""Benchmark: ACL-GAN training + batch-inference throughput on one chip.

Train: steady-state images/sec through the fused jitted train steps on the
full male2female architecture (gen dim 64, n_res 4; 3 discriminators at
3 scales), 256x256, bf16 compute, reference cadence D_update=1 / G_update=2
(configs/male2female.yaml:35-36) — alternating [D+G] and [D] executables,
fwd+bwd. Synthetic on-device batches isolate the compute path.

Inference: batched A->B translation (content encode -> AdaIN decode -> focus
blend; the test_batch.py:137-142 "bar" path) at the bulk batch size.

Prints TWO JSON lines — inference first, the train headline LAST:
  {"metric": "inference_throughput_256px", ...}
  {"metric": "train_throughput_256px", "value": N, "unit": "img/s/chip",
   "vs_baseline": N/2000, ...audit fields...}

The train line carries its own audit trail (VERDICT r2 item 1) so tunnel
drift vs regression is arbitrable from the artifact alone:
  ms_iter_p10/p50/p90  per-window ms/iter percentiles (see below)
  tf_s                 achieved TFLOP/s from XLA's cost analysis
  warmup_compile_s     wall time of warmup incl. compiles (<60s == warm
                       persistent cache; ~400s == cold cache)
  inference_img_s      the inference number repeated, so a parser that only
                       keeps the last line still records both

Measurement rules for this backend (BENCH_NOTES "measurement caveat"):
chained byte-changing inputs (no value-replay), host materialization as the
sync barrier (block_until_ready under-synchronizes through the axon tunnel),
steady-state window after >=12 warmup executions per program (the first ~10
run 10-20% slow), ALL per-iteration dataflow inside one executable.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: repeated bench runs skip the (minutes-long)
# XLA+Mosaic compile of the fused train step. Repo-local (not /tmp) so the
# primed cache survives machine restarts; ACLGAN_COMPILE_CACHE overrides.
from aclgan_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

if os.environ.get("BENCH_RBG") == "1":
    jax.config.update("jax_default_prng_impl", "rbg")

BASELINE_IMG_S = 2000.0  # BASELINE.md target


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(*arrays):
    """Reliable device sync: host materialization of a value that depends on
    the pending computation (block_until_ready under-synchronizes through
    the axon tunnel — measured >1s of compute still pending after it
    returned, BENCH_NOTES)."""
    for a in arrays:
        float(jnp.sum(a[..., :1].astype(jnp.float32)) if a.ndim else a)


def _cost_flops(jitted, *args) -> float:
    """FLOPs per execution from XLA's cost analysis (0.0 if unavailable)."""
    try:
        lowered = jitted.lower(*args)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def _acquire_device(timeout_s: float):
    """First jax.devices() with a watchdog.

    On this backend the PJRT client creation blocks indefinitely inside the
    chip-claim leg when the accelerator pool is unreachable or the chip lease
    is held by another (possibly dead) client — measured >19 min with 3s of
    CPU time. A hung bench is indistinguishable from a broken one in the
    driver record, so fail fast with an explicit infra diagnosis instead.
    """
    import threading
    result = {}

    def go():
        try:
            result["devs"] = jax.devices()
        except Exception as e:  # surfaces below
            result["err"] = e

    th = threading.Thread(target=go, daemon=True)
    th.start()
    th.join(timeout_s)
    if "err" in result:
        raise result["err"]
    if "devs" not in result:
        log(f"bench: FATAL — device acquisition did not complete within "
            f"{timeout_s:.0f}s (accelerator pool unreachable or chip lease "
            f"held elsewhere). This is an infrastructure failure, not a "
            f"code regression; rerun when the pool is reachable.")
        os._exit(3)
    return result["devs"][0]


def _percentile(sorted_vals, q):
    if not sorted_vals:
        return 0.0
    idx = min(len(sorted_vals) - 1, max(0, round(q * (len(sorted_vals) - 1))))
    return sorted_vals[idx]


def run_inference(model, state, cfg, batch, iters, warmup):
    """Batched A->B translation throughput. Each iteration's input depends on
    (and differs in bytes from) the previous output, so the runtime can
    neither overlap nor replay cached executions. Interleaved independent
    chains and in-executable scan measure IDENTICAL throughput
    (tools/probe_inference.py: 974.5 / 971.2 / 958.4 img/s) — the device is
    100% busy inside the program (trace: convs at 169 TF/s = 86% bf16 peak,
    elementwise fusions at 710 GB/s = ~87% HBM bw), so there is no launch
    overhead left to hide."""
    key = jax.random.PRNGKey(1)
    ka, kb = jax.random.split(key)
    x = jax.device_put(jax.random.uniform(
        ka, (batch, 256, 256, 3), minval=-1, maxval=1))
    z = jax.random.normal(kb, (batch, cfg.gen.style_dim))

    @jax.jit
    def infer(params, xs, zs):
        img, _ = model.translate(params, xs, zs, a2b=True)
        factor = 1.0 + jnp.tanh(jnp.sum(img.astype(jnp.float32))) * 1e-6
        return img, xs * factor.astype(xs.dtype)

    t0 = time.time()
    out = None
    for _ in range(warmup):
        out, x = infer(state.gen_params, x, z)
    _sync(out)
    warm_s = time.time() - t0

    t0 = time.time()
    for _ in range(iters):
        out, x = infer(state.gen_params, x, z)
    _sync(out)
    dt = time.time() - t0

    img_s = iters * batch / dt
    flops = _cost_flops(infer, state.gen_params, x, z)
    tf_s = flops * iters / dt / 1e12 if flops else 0.0
    log(f"bench[inference]: batch={batch} warmup+compile {warm_s:.1f}s, "
        f"{iters} iters in {dt:.3f}s -> {img_s:.1f} img/s "
        f"({dt / iters * 1e3:.1f} ms/batch, {tf_s:.1f} TF/s)")
    return {
        "metric": "inference_throughput_256px",
        "value": round(img_s, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 4),
        "batch": batch,
        "tf_s": round(tf_s, 1),
        "warmup_compile_s": round(warm_s, 1),
    }


def main():
    from functools import partial

    from aclgan_tpu.config import Config
    from aclgan_tpu.trainer import ACLGAN

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    # steady-state window: the first ~10 executions of each cadence variant
    # run ~10-20% slow while the backend's program caching settles (measured
    # 58.5 img/s with warmup=4/iters=20 vs 64.3 with warmup=12/iters=40 on
    # the same build); a 350k-iteration training run lives in steady state,
    # so that is what the headline measures.
    iters = int(os.environ.get("BENCH_ITERS", "60"))
    warmup = int(os.environ.get("BENCH_WARMUP", "12"))
    windows = max(1, int(os.environ.get("BENCH_WINDOWS", "5")))
    inf_batch = int(os.environ.get("BENCH_INF_BATCH", "128"))
    inf_iters = int(os.environ.get("BENCH_INF_ITERS", "40"))

    cfg = Config()  # defaults mirror configs/male2female.yaml
    cfg.batch_size = batch
    cfg.tpu.compute_dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    remat = os.environ.get("BENCH_REMAT", "0")
    cfg.tpu.remat = {"0": False, "1": True}.get(remat, remat)
    cfg.tpu.moment_dtype = os.environ.get("BENCH_MOMENT_DTYPE", "float32")
    cfg.data.synthetic = True

    dev = _acquire_device(float(os.environ.get("BENCH_DEVICE_TIMEOUT_S",
                                               "1200")))
    log(f"bench: device={dev}, batch={batch}, dtype={cfg.tpu.compute_dtype}")

    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0), image_hw=(256, 256))

    mode = os.environ.get("BENCH_MODE", "all")
    if mode == "inference":
        # same knobs as the default mode's inference leg (BENCH_INF_BATCH
        # defaults to the bulk 128), so the inference_throughput_256px metric
        # means the same thing whichever mode produced it
        print(json.dumps(run_inference(model, state, cfg, inf_batch,
                                       inf_iters, warmup)))
        return

    key = jax.random.PRNGKey(1)
    ka, kb = jax.random.split(key)
    x_a = jax.random.uniform(ka, (batch, 256, 256, 3), minval=-1, maxval=1)
    x_b = jax.random.uniform(kb, (batch, 256, 256, 3), minval=-1, maxval=1)
    x_a, x_b = jax.device_put((x_a, x_b))

    @partial(jax.jit, static_argnums=(4,))
    def one_iter(state, x_a, x_b, k, do_gen):
        # reference cadence: D every iter, G every 2nd (train.py:71-74).
        # ALL per-iteration dataflow — the byte-changing input chain AND the
        # per-iteration RNG (train_step folds state.step into the constant
        # base key in-graph) — lives INSIDE the step executable: any separate
        # per-iteration dispatch (even a tiny host-side jax.random.split)
        # costs ~540 ms/iter of cross-executable dependency stall on this
        # backend (measured 20.8 vs 66 img/s with only the key split
        # outside), while fused it is ~free and still defeats any
        # value-level replay (BENCH_NOTES "measurement caveat").
        new_state, metrics = model.train_step(state, x_a, x_b, k, True, do_gen)
        f = 1.0 + jnp.tanh(metrics["loss_dis_total"].astype(jnp.float32)) * 1e-6
        f = f.astype(x_a.dtype)
        return new_state, metrics, x_a * f, x_b * f

    # warmup / compile both cadence variants
    t0 = time.time()
    for i in range(warmup):
        state, metrics, x_a, x_b = one_iter(state, x_a, x_b, key, (i % 2) == 0)
    float(metrics["loss_dis_total"])  # drain pending warmup work
    warm_s = time.time() - t0
    log(f"bench: warmup+compile {warm_s:.1f}s, "
        f"loss_dis_total={float(metrics['loss_dis_total']):.4f}")

    # timed loop in W windows: one sync per window boundary gives per-window
    # ms/iter percentiles (the drift-vs-regression audit trail) at ~2-3%
    # boundary cost, amortized equally across windows
    per_window = max(2, iters // windows)
    window_ms = []
    t_all0 = time.time()
    done = 0
    for w in range(windows):
        t0 = time.time()
        for i in range(per_window):
            state, metrics, x_a, x_b = one_iter(state, x_a, x_b, key,
                                                (done + i) % 2 == 0)
        float(metrics["loss_dis_total"])
        float(x_a.ravel()[0])
        done += per_window
        window_ms.append((time.time() - t0) * 1000.0 / per_window)
    dt = time.time() - t_all0

    ws = sorted(window_ms)
    p10, p50, p90 = (_percentile(ws, q) for q in (0.1, 0.5, 0.9))
    # headline = median window (robust to one transient tunnel stall)
    img_s = batch / (p50 / 1000.0)

    # achieved FLOP rate from XLA's own cost model, averaged over the cadence
    fl_dg = _cost_flops(one_iter, state, x_a, x_b, key, True)
    fl_d = _cost_flops(one_iter, state, x_a, x_b, key, False)
    tf_s = ((fl_dg + fl_d) / 2.0) / (p50 / 1000.0) / 1e12 if fl_dg else 0.0

    log(f"bench: {done} iters in {dt:.3f}s -> {img_s:.1f} img/s "
        f"(window ms/iter p10/p50/p90 = {p10:.1f}/{p50:.1f}/{p90:.1f}, "
        f"{tf_s:.1f} TF/s)")

    inf = run_inference(model, state, cfg, inf_batch, inf_iters, warmup)
    print(json.dumps(inf))

    print(json.dumps({
        "metric": "train_throughput_256px",
        "value": round(img_s, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 4),
        "batch": batch,
        "iters": done,
        "ms_iter_p10": round(p10, 1),
        "ms_iter_p50": round(p50, 1),
        "ms_iter_p90": round(p90, 1),
        "tf_s": round(tf_s, 1),
        "warmup_compile_s": round(warm_s, 1),
        "inference_img_s": inf["value"],
        "inference_batch": inf["batch"],
    }))


if __name__ == "__main__":
    main()
