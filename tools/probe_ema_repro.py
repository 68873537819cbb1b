"""Minimal repro for the axon-backend InvalidArgument with tpu.ema_decay > 0.

Round-4 finding: the real train CLI / probe_trainloop die at the first
metrics materialization when ema_decay=0.999 (configs/synthfaces_hard.yaml)
but run clean with ema_decay=0 — CPU tests pass either way, so the EMA
train_step executable itself is rejected at RUNTIME by the TPU backend.
This isolates which ingredient (donation, cadence variant, step count)
triggers it by materializing after every step.

    python tools/probe_ema_repro.py --ema 0.999 --donate 1 --steps 4
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aclgan_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ema", type=float, default=0.999)
    p.add_argument("--donate", type=int, default=1)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--cadence", default="11,10",
                   help="comma list of do_dis/do_gen digit pairs per step, "
                        "cycled (default: D+G then D-only, the G_update=2 "
                        "pattern)")
    args = p.parse_args()

    from aclgan_tpu.config import load_config
    from aclgan_tpu.trainer import ACLGAN

    cfg = load_config("configs/synthfaces_hard.yaml")
    cfg.tpu.ema_decay = args.ema
    cfg.tpu.donate_state = bool(args.donate)
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    rng = np.random.default_rng(0)
    shape = (cfg.batch_size, cfg.data.crop_image_height,
             cfg.data.crop_image_width, 3)
    xa = jax.device_put(rng.integers(0, 256, shape, dtype=np.uint8))
    xb = jax.device_put(rng.integers(0, 256, shape, dtype=np.uint8))

    variants = args.cadence.split(",")
    print(f"ema={args.ema} donate={args.donate} variants={variants}")
    for i in range(args.steps):
        dd, dg = (c == "1" for c in variants[i % len(variants)])
        state, metrics = model.train_step(state, xa, xb, key, dd, dg)
        vals = {k: float(v) for k, v in metrics.items()}
        print(f"step {i} (dis={dd} gen={dg}) ok: "
              f"loss_gen_total={vals.get('loss_gen_total', float('nan')):.4f} "
              f"loss_dis_total={vals.get('loss_dis_total', float('nan')):.4f}",
              flush=True)
    print("PASS")


if __name__ == "__main__":
    main()
