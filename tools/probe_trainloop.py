"""Host-side phase breakdown of the real train-CLI hot loop (VERDICT r3 item 3).

The device bench (bench.py, chained on-device inputs) and the real train CLI
differ ~18% (65 vs 53.7 img/s r3). The axon profiler start_trace is broken
(TPU backend InvalidArgument, r4), so this instruments the loop from the host
side instead: per iteration it times

  fetch    blocked in next() of the device_prefetch iterator
           (worker-decoded host batch wait + device_put marshaling)
  step     the (async) jitted train_step dispatch call
  book     metrics bookkeeping the CLI does per iteration

and per 100-iteration window reports phase sums + the wall total; whatever
wall time the phases don't account for is spent in the log-cadence sync
(float() on the metrics) — i.e. true device-bound time. Run variants:

    python tools/probe_trainloop.py --config configs/synthfaces_hard.yaml
    python tools/probe_trainloop.py --prefetch 4 --iters 300
    python tools/probe_trainloop.py --mode nolog     # never sync mid-run
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aclgan_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/synthfaces_hard.yaml")
    p.add_argument("--iters", type=int, default=400)
    p.add_argument("--prefetch", type=int, default=None,
                   help="override tpu.prefetch")
    p.add_argument("--log_iter", type=int, default=100)
    p.add_argument("--mode", choices=("cli", "nolog"), default="cli",
                   help="cli = sync every log_iter like the CLI; nolog = "
                        "sync only at window boundaries")
    args = p.parse_args()

    from aclgan_tpu.config import load_config
    from aclgan_tpu.data.loader import device_prefetch, get_all_data_loaders
    from aclgan_tpu.trainer import ACLGAN

    cfg = load_config(args.config)
    if args.prefetch is not None:
        cfg.tpu.prefetch = args.prefetch
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(cfg.seed))
    loader_a, loader_b, _, _ = get_all_data_loaders(cfg, seed=cfg.seed)
    key = jax.random.PRNGKey(cfg.seed + 1)

    print(f"probe: batch {cfg.batch_size}, prefetch {cfg.tpu.prefetch}, "
          f"mode {args.mode}, D/G cadence {cfg.D_update}/{cfg.G_update}")

    it_global = 0
    window = {"fetch": 0.0, "step": 0.0, "book": 0.0}
    metrics_seen = {}
    t_win = time.time()
    rows = []
    while it_global < args.iters:
        it_a = device_prefetch(loader_a, cfg.tpu.prefetch)
        it_b = device_prefetch(loader_b, cfg.tpu.prefetch)
        ia, ib = iter(it_a), iter(it_b)
        it_epoch = 0
        while it_global < args.iters:
            t0 = time.time()
            try:
                images_a = next(ia)
                images_b = next(ib)
            except StopIteration:
                break
            t1 = time.time()
            do_dis = (it_epoch % cfg.D_update) == 0
            do_gen = (it_epoch % cfg.G_update) == 0
            state, metrics = model.train_step(state, images_a, images_b,
                                              key, do_dis, do_gen)
            t2 = time.time()
            metrics_seen.update(metrics)
            t3 = time.time()
            window["fetch"] += t1 - t0
            window["step"] += t2 - t1
            window["book"] += t3 - t2
            it_epoch += 1
            it_global += 1
            if it_global % args.log_iter == 0:
                if args.mode == "cli" or it_global == args.iters:
                    tb0 = time.time()
                    vals = {k: float(v) for k, v in metrics_seen.items()}
                    sync_s = time.time() - tb0
                else:
                    sync_s = 0.0
                wall = time.time() - t_win
                n = args.log_iter
                row = dict(it=it_global, ms_iter=wall / n * 1e3,
                           fetch_ms=window["fetch"] / n * 1e3,
                           step_ms=window["step"] / n * 1e3,
                           book_ms=window["book"] / n * 1e3,
                           sync_ms=sync_s / n * 1e3,
                           img_s=cfg.batch_size * n / wall)
                rows.append(row)
                print("it %(it)4d: %(ms_iter)7.1f ms/iter (%(img_s)5.1f img/s)"
                      "  fetch %(fetch_ms)6.1f  dispatch %(step_ms)6.1f  "
                      "book %(book_ms)5.2f  logsync %(sync_ms)6.1f" % row,
                      flush=True)
                window = {k: 0.0 for k in window}
                t_win = time.time()

    steady = rows[1:] if len(rows) > 1 else rows
    best = min(r["ms_iter"] for r in steady)
    med = sorted(r["ms_iter"] for r in steady)[len(steady) // 2]
    print(f"steady windows: p50 {med:.1f} ms/iter "
          f"({cfg.batch_size / med * 1e3:.1f} img/s), best {best:.1f}")


if __name__ == "__main__":
    main()
