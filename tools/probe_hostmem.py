"""Host-RSS probe for the per-iteration H2D transfer path.

Motivation (round 4): the 20k-iteration hard-task train run was OOM-killed at
~iter 19,500 with anon-rss 125 GB. Host RSS grew ~6.3 MB/iteration — exactly
the x_a+x_b uint8 batch pair (2 x 16x256x256x3) shipped fresh each step.
Hypothesis: the axon client journals every op INCLUDING transfer bytes so it
can replay the session after a TPU-backend connection drop, so a training
loop that ships fresh batch bytes every iteration grows host memory without
bound (the same mechanism CLAUDE.md's "value-cache elision" caveat observes
from the other side). `AXON_JOURNAL_COMPACT` filters the journal to
executable ops, trading transparent replay for bounded memory.

This probe isolates the transfer path from the framework: a loop of
device_put + trivial jitted consume, RSS sampled from /proc/self/status.

    python tools/probe_hostmem.py --iters 300 --mb 6 --mode fresh
    AXON_JOURNAL_COMPACT=1 python tools/probe_hostmem.py --iters 300 --mode fresh
    python tools/probe_hostmem.py --mode same      # byte-identical transfers
    python tools/probe_hostmem.py --mode chained   # no per-iter H2D at all

Modes:
- fresh:   new bytes every transfer (training's pattern; leak reproducer)
- same:    the identical ndarray every transfer (value-cache hit path)
- chained: input chained on-device, no per-iter H2D (bench.py's pattern)

Prints one JSON line per sample: {"iter": i, "rss_mb": r, "d_mb_per_iter": s}
and a final verdict line with the steady-state slope.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--mb", type=float, default=6.0,
                   help="payload MB per iteration (default = one train "
                        "batch pair)")
    p.add_argument("--mode", choices=("fresh", "same", "chained"),
                   default="fresh")
    p.add_argument("--sample_every", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    print(json.dumps({"platform": dev.platform,
                      "journal_compact": os.environ.get(
                          "AXON_JOURNAL_COMPACT", "<unset>"),
                      "mode": args.mode, "mb": args.mb}), flush=True)

    n = int(args.mb * 1024 * 1024)
    base = np.zeros(n, np.uint8)

    @jax.jit
    def consume(x):
        # cheap but non-elidable: depends on every byte
        return x.astype(jnp.uint32).sum()

    x_dev = jax.device_put(base, dev)
    samples = []
    t0 = time.time()
    for i in range(args.iters):
        if args.mode == "fresh":
            # byte-varying without a full np.random pass (1-core host):
            # stamp the iteration into the first 8 bytes AND a spread of
            # pages so any page-level dedup can't collapse it
            base[i % n] = (i + 1) & 0xFF
            base[:: max(n // 997, 1)] = (i * 31 + 7) & 0xFF
            out = consume(jax.device_put(base, dev))
        elif args.mode == "same":
            out = consume(jax.device_put(base, dev))
        else:  # chained: no per-iter H2D
            x_dev = x_dev + jnp.uint8(1)
            out = consume(x_dev)
        if (i + 1) % args.sample_every == 0:
            float(out)  # host materialization = sync barrier
            r = rss_mb()
            d = ((r - samples[-1][1]) / args.sample_every
                 if samples else float("nan"))
            samples.append((i + 1, r))
            print(json.dumps({"iter": i + 1, "rss_mb": round(r, 1),
                              "d_mb_per_iter": round(d, 3)}), flush=True)

    # steady-state slope over the back half
    back = samples[len(samples) // 2:]
    slope = ((back[-1][1] - back[0][1]) / (back[-1][0] - back[0][0])
             if len(back) > 1 else float("nan"))
    print(json.dumps({"verdict_mb_per_iter": round(slope, 3),
                      "payload_mb_per_iter":
                          args.mb if args.mode == "fresh" else 0.0,
                      "wall_s": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
