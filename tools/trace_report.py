"""Summarize a jax.profiler trace: device time by HLO category and source line.

Usage:
    python tools/trace_report.py /tmp/jaxtrace [--top N]

Reads the perfetto JSON (`*.trace.json.gz`) that `jax.profiler.trace` /
`--profile_dir` writes under `<dir>/plugins/profile/<ts>/`, and prints

  - device-time totals per `hlo_category` with achieved TFLOP/s (from the
    embedded `model_flops`) and GB/s (from `bytes_accessed`), and
  - the top source lines (the `source` attribution XLA records per op),

which is how the hot spots in BENCH_NOTES.md were found (e.g. the 2 GB/s
column dynamic-update-slice in the border paste, the 766 GB/s loop fusions).
No TensorFlow/profiler-plugin dependency — plain json.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def load_events(trace_dir: str):
    pats = [
        os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz"),
        os.path.join(trace_dir, "*.trace.json.gz"),
    ]
    files = sorted(f for p in pats for f in glob.glob(p))
    if not files:
        sys.exit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(files[-1]) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    # device pids are named like '/device:TPU:0'
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "device:" in e["args"].get("name", "")}
    return [e for e in ev if e.get("ph") == "X" and e.get("pid") in dev_pids
            and "hlo_category" in e.get("args", {})], files[-1]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", help="dir passed to --profile_dir / jax.profiler.trace")
    ap.add_argument("--top", type=int, default=20, help="source lines to show")
    opts = ap.parse_args(argv)

    events, path = load_events(opts.trace_dir)
    total = sum(e["dur"] for e in events)
    print(f"{path}\ndevice total: {total / 1e3:.1f} ms over {len(events)} ops\n")

    def table(keyfn, title, top):
        dur = collections.Counter()
        flops = collections.Counter()
        byt = collections.Counter()
        for e in events:
            k = keyfn(e)
            dur[k] += e["dur"]
            flops[k] += int(e["args"].get("model_flops", 0) or 0)
            byt[k] += int(e["args"].get("bytes_accessed", 0) or 0)
        print(f"{title:46s}{'ms':>9s}{'%':>6s}{'TF/s':>8s}{'GB/s':>8s}")
        for k, d in dur.most_common(top):
            sec = d * 1e-6
            print(f"{str(k)[:46]:46s}{d / 1e3:9.1f}{100 * d / total:6.1f}"
                  f"{flops[k] / sec / 1e12 if sec else 0:8.1f}"
                  f"{byt[k] / sec / 1e9 if sec else 0:8.0f}")
        print()

    table(lambda e: e["args"]["hlo_category"], "hlo_category", 99)
    table(lambda e: e["args"].get("source", "?"), "source line", opts.top)


if __name__ == "__main__":
    main()
