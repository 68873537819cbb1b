"""Training CLI — `python -m aclgan_tpu.cli.train --config <yaml>`.

Loop-for-loop rebuild of the reference's train.py:22-104 with the device work
moved into fused jitted steps and the host loop reduced to cadence + IO:

- D/G cadence on the *epoch-local* index `it` exactly as the reference does
  (train.py:66,71-74 — the cadence counter resets each epoch while
  `iterations` is global; preserved quirk),
- fixed display noise drawn once (trainer.py:29-32),
- TB/JSONL scalars every log_iter, image grids + HTML every
  image_save_iter / image_display_iter, snapshot every snapshot_save_iter,
- LR schedule applied inside the step from the global iteration,
- --resume restores nets + optimizers + step from the latest snapshot.

On multi-device systems the batch is sharded over a data mesh and params are
replicated; XLA inserts the gradient all-reduce (parallel/mesh.py).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from aclgan_tpu.utils.compile_cache import enable as _enable_compile_cache
from aclgan_tpu.config import load_config, save_config
from aclgan_tpu.data.loader import device_prefetch, get_all_data_loaders
from aclgan_tpu.parallel.mesh import (batch_sharding, coordination_barrier,
                                      make_mesh, shard_state)
from aclgan_tpu.trainer import ACLGAN
from aclgan_tpu.utils.checkpoint import resume as resume_ckpt, save_checkpoint
from aclgan_tpu.utils.image import write_2images
from aclgan_tpu.utils.logging import MetricWriter, prepare_sub_folder, write_html
from aclgan_tpu.utils.backend import bound_transfer_journal
from aclgan_tpu.utils.timer import block_on


_enable_compile_cache()
# Training ships fresh batch bytes every iteration; an unbounded client
# transfer journal OOMs the host ~6 MB/iter (utils/backend.py docstring).
bound_transfer_journal()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="configs/male2female.yaml",
                        help="Path to the config file.")
    parser.add_argument("--output_path", type=str, default=".", help="outputs path")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--trainer", type=str, default="aclgan", help="aclgan")
    parser.add_argument("--max_iter", type=int, default=None,
                        help="override config max_iter (smoke runs)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler trace (TensorBoard "
                             "profile plugin) of iterations 10..14")
    opts = parser.parse_args(argv)

    if opts.trainer != "aclgan":
        sys.exit("Only support aclgan")

    cfg = load_config(opts.config)
    if cfg.tpu.distributed:
        # multi-host: global mesh over all hosts' devices; gradient all-reduce
        # rides ICI within a slice and DCN across (SURVEY §2.12/§5.8)
        jax.distributed.initialize()
    # file IO (TB/JSONL scalars, image grids, HTML, snapshots, config
    # snapshot) happens on process 0 only — every process computes the same
    # replicated metrics/params, and concurrent writers would race on a
    # shared filesystem
    is_main = jax.process_index() == 0
    if cfg.tpu.check_nans:
        # SURVEY §5.2: the race-detector analog — functional purity + NaN traps
        jax.config.update("jax_debug_nans", True)
    if opts.max_iter is not None:
        cfg.max_iter = opts.max_iter
    cfg.vgg_model_path = opts.output_path
    max_iter = cfg.max_iter
    display_size = cfg.display_size

    # Output folders + config snapshot (train.py:57-61)
    model_name = os.path.splitext(os.path.basename(opts.config))[0]
    log_dir = os.path.join(opts.output_path, "logs", model_name)
    output_directory = os.path.join(opts.output_path, "outputs", model_name)
    if is_main:
        checkpoint_directory, image_directory = prepare_sub_folder(output_directory)
        save_config(cfg, os.path.join(output_directory, "config.yaml"))
    else:
        checkpoint_directory = os.path.join(output_directory, "checkpoints")
        image_directory = os.path.join(output_directory, "images")
    writer = MetricWriter(log_dir) if is_main else None

    # Model + state
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(cfg.seed))

    # Mesh / sharding: replicate params, shard batches (no-op on 1 device)
    import math

    n_want = cfg.tpu.mesh_data if cfg.tpu.mesh_data != -1 else len(jax.devices())
    if cfg.batch_size % n_want != 0:
        n_fit = math.gcd(cfg.batch_size, n_want)
        print(f"batch_size {cfg.batch_size} not divisible by {n_want} devices; "
              f"using a {n_fit}-device data mesh")
        n_want = n_fit
    mesh = make_mesh(n_want)
    n_dev = mesh.devices.size
    state = shard_state(state, mesh)
    b_shard = batch_sharding(mesh) if n_dev > 1 else None

    # Data (utils.py:43-73) + fixed display batches (train.py:44-47).
    # Multi-host: each process loads batch_size/process_count samples from a
    # process-offset shuffle stream; device_prefetch assembles the global
    # sharded batch.
    n_proc = jax.process_count()
    if cfg.batch_size % max(n_proc, 1) != 0:
        sys.exit(f"batch_size {cfg.batch_size} not divisible by "
                 f"{n_proc} processes")
    import dataclasses as _dc

    local_cfg = _dc.replace(cfg, batch_size=cfg.batch_size // n_proc)
    train_loader_a, train_loader_b, test_loader_a, test_loader_b = \
        get_all_data_loaders(local_cfg, seed=cfg.seed + jax.process_index())
    if len(train_loader_a) == 0 or len(train_loader_b) == 0:
        # drop_last with a dataset smaller than the batch yields 0 batches;
        # without this check the epoch loop would busy-spin forever silently
        sys.exit(f"training dataset smaller than batch_size="
                 f"{local_cfg.batch_size}: trainA yields "
                 f"{len(train_loader_a)} batches, trainB "
                 f"{len(train_loader_b)} (drop_last)")
    train_display_a = train_loader_a.first_n(display_size)
    train_display_b = train_loader_b.first_n(display_size)
    test_display_a = test_loader_a.first_n(display_size)
    test_display_b = test_loader_b.first_n(display_size)
    # clamp to the smallest dataset: first_n returns min(n, len(dataset)), and
    # the jitted sample_fn needs matching batch/noise shapes (the reference
    # crashes on datasets smaller than display_size, train.py:44-47)
    n_avail = min(len(b) for b in (train_display_a, train_display_b,
                                   test_display_a, test_display_b))
    if n_avail < display_size:
        print(f"display_size {display_size} > smallest dataset ({n_avail}); "
              f"clamping")
        display_size = n_avail
        train_display_a = train_display_a[:n_avail]
        train_display_b = train_display_b[:n_avail]
        test_display_a = test_display_a[:n_avail]
        test_display_b = test_display_b[:n_avail]
    if n_proc > 1:
        # per-process loaders use process-offset seeds, so each process drew
        # DIFFERENT display batches; jit in multi-controller mode requires
        # host-local inputs to be identical on every process (they become the
        # replicated global value) — broadcast process 0's batches
        from jax.experimental import multihost_utils

        # this broadcast is the FIRST device collective; absorb the compile
        # skew accumulated so far (init_state) before its context-connect
        # window opens (parallel/mesh.py coordination_barrier docstring)
        coordination_barrier("pre-display-broadcast")
        # one pytree broadcast (not four sequential ones): a single
        # collective round through the Gloo context-connect window
        train_display_a, train_display_b, test_display_a, test_display_b = (
            np.asarray(b) for b in multihost_utils.broadcast_one_to_all(
                (train_display_a, train_display_b,
                 test_display_a, test_display_b)))

    # Fixed sampling noise (trainer.py:29-32)
    zkey = jax.random.PRNGKey(cfg.seed + 17)
    z_1, z_2, z_3 = (jax.random.normal(k, (display_size, cfg.style_dim))
                     for k in jax.random.split(zkey, 3))
    sample_fn = jax.jit(model.sample)

    iterations = 0
    restored_key = None
    if opts.resume:
        state, iterations, restored_key = resume_ckpt(checkpoint_directory, state)
        state = shard_state(state, mesh)

    # checkpointed RNG makes resume bitwise deterministic (improvement over
    # the reference, which restores weights+moments+iteration only)
    key = restored_key if restored_key is not None else jax.random.PRNGKey(cfg.seed + 1)

    def do_sample(x_a, x_b):
        outs = sample_fn(state.gen_params, jnp.asarray(x_a), jnp.asarray(x_b),
                         z_1, z_2, z_3)
        return [np.asarray(o, np.float32) for o in outs]

    if n_proc > 1 and b_shard is not None:
        # AOT-compile EVERY train-step cadence variant the loop will execute,
        # then barrier: each variant's first execution opens a collective
        # context-connect window, and compile skew between processes must not
        # eat into it (parallel/mesh.py) — precompiling only (True, True)
        # would re-expose the skew at iteration 2, where G_update=2 configs
        # compile the D-only variant mid-loop
        bdtype = jnp.uint8 if cfg.tpu.uint8_transfer else jnp.float32
        batch_sds = jax.ShapeDtypeStruct(
            (cfg.batch_size, cfg.data.crop_image_height,
             cfg.data.crop_image_width, 3), bdtype, sharding=b_shard)
        # simulate two epochs of the real epoch-local cadence (train.py:66
        # quirk): this enumerates every (do_dis, do_gen, step_increment)
        # triple the loop can produce, including the epoch-boundary gap when
        # the epoch length is not a multiple of the cadence cycle
        epoch_len = max(1, min(len(train_loader_a), len(train_loader_b)))
        variants = set()
        pending = 0
        for _ in range(2):
            for i in range(epoch_len):
                dd, dg = (i % cfg.D_update) == 0, (i % cfg.G_update) == 0
                if dd or dg:
                    variants.add((dd, dg, 1 + pending))
                    pending = 0
                else:
                    pending += 1
        for dd, dg, inc in sorted(variants):
            model.train_step.lower(state, batch_sds, batch_sds, key,
                                   dd, dg, inc).compile()
        coordination_barrier("train-steps-compiled")

    print(f"Training {model_name}: {max_iter} iterations, "
          f"batch {cfg.batch_size}, {n_dev} device(s)")
    t_last = time.time()
    # last-seen value per scalar: a logged step reports the most recent D and
    # G losses even when the cadence skipped one of them this iteration
    # (matches reference write_loss reflection over persistent trainer
    # attributes, utils.py:174-178 — with D/G cadence + even log_iter a step
    # can otherwise never carry gen metrics)
    metrics_seen = {}
    pending_skips = 0  # cadence-skipped iterations not yet folded into step
    trace_open = False  # profiler trace started but not yet stopped
    while True:
        it_a = device_prefetch(train_loader_a, cfg.tpu.prefetch, b_shard)
        it_b = device_prefetch(train_loader_b, cfg.tpu.prefetch, b_shard)
        for it, (images_a, images_b) in enumerate(zip(it_a, it_b)):
            if opts.profile_dir is not None and iterations == 10:
                jax.profiler.start_trace(opts.profile_dir)
                trace_open = True
            if opts.profile_dir is not None and iterations == 15:
                jax.profiler.stop_trace()
                trace_open = False
                print(f"profile trace written to {opts.profile_dir}")

            do_dis = (it % cfg.D_update) == 0
            do_gen = (it % cfg.G_update) == 0
            if do_dis or do_gen:
                # `key` stays loop-invariant: train_step derives the
                # per-iteration key as fold_in(key, state.step) in-graph, so
                # the host issues no per-iteration RNG executable (an extra
                # dispatch in the hot loop stalls ~540 ms/iter on the axon
                # backend — BENCH_NOTES "measurement caveat")
                state, metrics = model.train_step(state, images_a, images_b,
                                                  key, do_dis, do_gen,
                                                  1 + pending_skips)
                pending_skips = 0
            else:
                # neither update runs this iteration; the reference still
                # steps its LR scheduler (train.py:101) — fold the skip into
                # the next call's static step_increment
                pending_skips += 1
                metrics = {}

            metrics_seen.update(metrics)
            if (iterations + 1) % cfg.log_iter == 0:
                block_on(metrics)
                now = time.time()
                if is_main:
                    print("Iteration: %08d/%08d (%.3fs)" %
                          (iterations + 1, max_iter, now - t_last))
                    writer.write(iterations + 1,
                                 {k: float(v) for k, v in metrics_seen.items()})
                t_last = now

            if (iterations + 1) % cfg.image_save_iter == 0:
                # do_sample runs on every process (the jitted computation is
                # collective-free but must be issued globally); file writes
                # are main-only
                outs_test = do_sample(test_display_a, test_display_b)
                outs_train = do_sample(train_display_a, train_display_b)
                if is_main:
                    write_2images(outs_test, display_size, image_directory,
                                  "test_%08d" % (iterations + 1))
                    write_2images(outs_train, display_size, image_directory,
                                  "train_%08d" % (iterations + 1))
                    write_html(os.path.join(output_directory, "index.html"),
                               iterations + 1, cfg.image_save_iter, "images")

            if (iterations + 1) % cfg.image_display_iter == 0:
                outs_cur = do_sample(train_display_a, train_display_b)
                if is_main:
                    write_2images(outs_cur, display_size, image_directory,
                                  "train_current")

            if (iterations + 1) % cfg.snapshot_save_iter == 0 and is_main:
                save_checkpoint(checkpoint_directory, state, iterations,
                                keep=cfg.tpu.snapshot_keep, rng_key=key)

            iterations += 1
            if iterations >= max_iter:
                if trace_open:  # run ended inside the 10..15 trace window —
                    jax.profiler.stop_trace()  # flush instead of losing it
                    print(f"profile trace written to {opts.profile_dir}")
                if is_main:
                    save_checkpoint(checkpoint_directory, state, iterations - 1,
                                    rng_key=key)
                    writer.close()
                print("Finish training")
                return


if __name__ == "__main__":
    main()
