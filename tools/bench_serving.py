"""Serving-surface load benchmark (VERDICT r3 item 8).

Drives the stack users actually hit — AsyncTranslator request coalescing and
the stdlib HTTP front (serving_http.py) — under N concurrent closed-loop
clients on the real chip, and reports per-concurrency p50/p99 request
latency, throughput, and coalesced-batch occupancy. The r3 serving numbers
were raw-jit device throughput (serving.py batch loop); this measures the
queueing + batching + (optionally) HTTP layers above it.

    python tools/bench_serving.py                      # async mode, fresh-init weights
    python tools/bench_serving.py --mode http          # through HTTP (same process)
    python tools/bench_serving.py --checkpoint gen_00020000.msgpack \
        --config configs/synthfaces_hard.yaml --levels 1,8,32 --seconds 20

Caveats recorded with the numbers:
- single-process harness on a 1-core host: client threads, the coalescing
  worker, and HTTP handler threads share that core, so host-side overhead is
  measured at its worst; device batches still launch back to back.
- closed-loop clients: throughput at level C is bounded by C/latency.

No reference analog (its inference is the per-image loop of
/root/reference/test_batch.py:107-153); this benches the build's own flagship
serving surface at its own standard.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aclgan_tpu.utils.backend import bound_transfer_journal
from aclgan_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
bound_transfer_journal()  # serving ships fresh request bytes (backend.py)


class _Recording:
    """Transparent proxy that records the device batch size of every
    translator call (= coalesced-batch occupancy before padding)."""

    def __init__(self, inner):
        self._inner = inner
        self.batch_sizes = []

    def __call__(self, images, styles=None, **kw):
        self.batch_sizes.append(len(images))
        return self._inner(images, styles=styles, **kw)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def _fresh_checkpoint(cfg_path: str) -> str:
    """Write a fresh-init gen checkpoint (weights don't affect throughput)."""
    import flax.serialization
    import jax

    from aclgan_tpu.config import load_config
    from aclgan_tpu.trainer import ACLGAN

    cfg = load_config(cfg_path)
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    path = os.path.join(tempfile.gettempdir(), "aclgan_bench_serving_gen.msgpack")
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(state.gen_params)))
    return path


def _percentiles(xs):
    xs = sorted(xs)
    n = len(xs)
    return (xs[n // 2], xs[min(n - 1, int(n * 0.99))])


def _drive(submit_fn, concurrency: int, seconds: float, warmup: int):
    """Closed-loop: `concurrency` threads each loop submit->wait until the
    deadline. Returns (latencies_s, completed, elapsed_s)."""
    for _ in range(warmup):
        submit_fn()

    latencies = []
    lock = threading.Lock()
    stop_at = time.monotonic() + seconds
    errors = []

    def client():
        local = []
        while time.monotonic() < stop_at:
            t0 = time.monotonic()
            try:
                submit_fn()
            except Exception as e:  # noqa: BLE001 — record and stop this client
                errors.append(repr(e))
                break
            local.append(time.monotonic() - t0)
        with lock:
            latencies.extend(local)

    threads = [threading.Thread(target=client) for _ in range(concurrency)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.monotonic() - t0
    if errors:
        raise RuntimeError(f"{len(errors)} client errors, first: {errors[0]}")
    return latencies, len(latencies), elapsed


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/male2female.yaml")
    p.add_argument("--checkpoint", default=None,
                   help="gen .msgpack; default: fresh-init weights")
    p.add_argument("--mode", choices=("async", "http"), default="async")
    p.add_argument("--batch", type=int, default=16,
                   help="compiled device batch (pads every launch; also the "
                        "coalescing max_batch)")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--levels", default="1,4,16,48",
                   help="comma-separated client concurrency levels")
    p.add_argument("--seconds", type=float, default=20.0,
                   help="measurement window per level")
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    p.add_argument("--warmup", type=int, default=12,
                   help="pre-window requests (compile + program-cache settle)")
    args = p.parse_args()

    ckpt = args.checkpoint or _fresh_checkpoint(args.config)

    from aclgan_tpu.serving import AsyncTranslator, Translator

    rec = _Recording(Translator(args.config, ckpt, batch_size=args.batch,
                                size=args.size))
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (args.size, args.size, 3), dtype=np.uint8)
    # per-request style from numpy (not the device RNG): styles are request
    # payload, and drawing them on-device inside the timed loop would bench
    # the RNG dispatch, not the serving path. The default-style path (one
    # batched random_style per coalesced batch) is exercised by the warmup.
    styles = rng.randn(256, rec.cfg.gen.style_dim).astype(np.float32)
    counter = threading.Lock()
    nreq = [0]

    def next_style():
        with counter:
            nreq[0] += 1
            return styles[nreq[0] % len(styles)]

    results = []
    if args.mode == "async":
        srv = AsyncTranslator(rec, max_batch=args.batch,
                              max_wait_ms=args.max_wait_ms)
        srv.submit(img).result()  # default-style path once (compile + draw)

        def one_request():
            srv.submit(img, style=next_style()).result(timeout=300)

        close = lambda: srv.close(drain=False)
    else:
        import http.client

        from aclgan_tpu.serving_http import make_server

        httpd = make_server(rec, host="127.0.0.1", port=0,
                            max_wait_ms=args.max_wait_ms)
        port = httpd.server_address[1]
        th = threading.Thread(target=httpd.serve_forever, daemon=True)
        th.start()
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=92)
        body = buf.getvalue()
        tls = threading.local()

        def one_request():
            conn = getattr(tls, "conn", None)
            if conn is None:
                conn = tls.conn = http.client.HTTPConnection(
                    "127.0.0.1", port, timeout=300)
            style = ",".join(f"{v:.6f}" for v in next_style())
            conn.request("POST", "/translate", body,
                         {"Content-Type": "image/jpeg", "X-Style": style})
            resp = conn.getresponse()
            data = resp.read()
            if resp.status != 200:
                raise RuntimeError(f"HTTP {resp.status}: {data[:200]!r}")

        def close():
            httpd.shutdown()
            httpd.aclgan_async.close(drain=False)

    try:
        for level in [int(v) for v in args.levels.split(",")]:
            rec.batch_sizes.clear()
            lats, done, elapsed = _drive(one_request, level, args.seconds,
                                         args.warmup)
            p50, p99 = _percentiles(lats)
            occ = (statistics.mean(rec.batch_sizes)
                   if rec.batch_sizes else float("nan"))
            row = {
                "mode": args.mode, "concurrency": level,
                "throughput_img_s": round(done / elapsed, 1),
                "p50_ms": round(p50 * 1e3, 1), "p99_ms": round(p99 * 1e3, 1),
                "mean_coalesced_batch": round(occ, 2),
                "device_batches": len(rec.batch_sizes),
                "requests": done,
            }
            results.append(row)
            print(json.dumps(row), flush=True)
    finally:
        close()

    print("\nsummary (mode=%s, compiled batch %d, window %.0fs):"
          % (args.mode, args.batch, args.seconds))
    print(f"{'conc':>5} {'img/s':>8} {'p50 ms':>8} {'p99 ms':>8} {'occupancy':>10}")
    for r in results:
        print(f"{r['concurrency']:>5} {r['throughput_img_s']:>8} "
              f"{r['p50_ms']:>8} {r['p99_ms']:>8} "
              f"{r['mean_coalesced_batch']:>10}")


if __name__ == "__main__":
    main()
