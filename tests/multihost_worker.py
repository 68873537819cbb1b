"""Worker process for the multi-host (multi-process) CPU tests
(SURVEY §2.12/§5.8, VERDICT r2 item 5).

Run as:
  python tests/multihost_worker.py <process_id> <num_processes> <port> \
      <out_dir> [scenario] [local_devices]

Scenarios:
  step    (default) one fused D+G train step over the global data mesh fed by
          per-process loaders — process 0 dumps the assembled global batch and
          metrics; every process dumps its LOCAL loader batch so the test can
          pin the process-rank -> global-row mapping.
  resume  2 steps -> process-0 checkpoint -> restore on ALL processes -> 2
          more steps, compared in-process against 4 uninterrupted steps
          (prints "resume-parity: ok" on success).
  cli     drives the REAL aclgan_tpu.cli.train main() for a few iterations
          under process_count()>1 (per-process loaders, broadcast display
          batches, main-only file IO).

local_devices > 1 gives each process that many virtual CPU devices, e.g.
2 processes x 2 devices = a 4-device global mesh — the topology where
per-process loader sharding can misalign with global device order.
"""

import json
import os
import sys


def main():
    process_id, num_processes, port, out_dir = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    scenario = sys.argv[5] if len(sys.argv) > 5 else "step"
    local_devices = int(sys.argv[6]) if len(sys.argv) > 6 else 1

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""

    import jax

    jax.config.update("jax_platforms", "cpu")
    if local_devices > 1:
        jax.config.update("jax_num_cpu_devices", local_devices)
    jax.config.update("jax_default_matmul_precision", "highest")
    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=num_processes,
                               process_id=process_id)
    assert jax.process_count() == num_processes
    assert len(jax.local_devices()) == local_devices

    if scenario == "step":
        run_step(process_id, num_processes, out_dir)
    elif scenario == "resume":
        run_resume(process_id, out_dir)
    elif scenario == "cli":
        run_cli(process_id, out_dir)
    else:
        sys.exit(f"unknown scenario {scenario}")

    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("done")
    print(f"worker {process_id}: ok", flush=True)


def _tiny_cfg():
    from aclgan_tpu.config import Config, DisConfig, GenConfig

    cfg = Config()
    cfg.gen = GenConfig(dim=8, mlp_dim=16, style_dim=8, output_dim=4,
                        n_downsample=2, n_res=2, pad_type="reflect")
    cfg.dis = DisConfig(dim=8, norm="none", activ="lrelu", n_layer=2,
                        gan_type="lsgan", num_scales=2, pad_type="reflect")
    cfg.data.synthetic = True
    cfg.data.num_workers = 0
    cfg.data.new_size = 16
    cfg.data.crop_image_height = cfg.data.crop_image_width = 16
    cfg.tpu.compute_dtype = "float32"
    cfg.tpu.donate_state = False
    cfg.batch_size = 4  # global
    return cfg


def run_step(process_id, num_processes, out_dir):
    """One fused step over the global mesh; exactly cli/train.py's multi-host
    data path (per-process loaders + device_prefetch assembly)."""
    import dataclasses

    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from aclgan_tpu.data.loader import device_prefetch, get_all_data_loaders
    from aclgan_tpu.parallel.mesh import batch_sharding, make_mesh, shard_state
    from aclgan_tpu.trainer import ACLGAN

    cfg = _tiny_cfg()
    n_global = jax.device_count()

    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    mesh = make_mesh(n_global)
    state = shard_state(state, mesh)
    b_shard = batch_sharding(mesh)

    # per-process loaders, exactly as cli/train.py
    local_cfg = dataclasses.replace(cfg, batch_size=cfg.batch_size // num_processes)
    loader_a, loader_b, _, _ = get_all_data_loaders(
        local_cfg, seed=cfg.seed + jax.process_index())
    # dump the local halves from a FRESHLY constructed identical loader pair
    # so the test can pin the process-rank -> global-row mapping (means/grads
    # are permutation invariant, so metric equality alone cannot catch a
    # scrambled order; a fresh loader is needed because iterating the real
    # one would consume its first epoch)
    dump_a, dump_b, _, _ = get_all_data_loaders(
        local_cfg, seed=cfg.seed + jax.process_index())
    la, lb = next(iter(dump_a)), next(iter(dump_b))
    np.save(os.path.join(out_dir, f"local_a_{process_id}.npy"), np.asarray(la))
    np.save(os.path.join(out_dir, f"local_b_{process_id}.npy"), np.asarray(lb))

    it_a = device_prefetch(loader_a, 2, b_shard)
    it_b = device_prefetch(loader_b, 2, b_shard)
    x_a, x_b = next(it_a), next(it_b)
    assert x_a.shape == (cfg.batch_size, 16, 16, 3), x_a.shape
    assert x_a.sharding.is_equivalent_to(
        NamedSharding(mesh, P("data")), x_a.ndim)

    # compile first, barrier, then execute: the step's first execution opens
    # the Gloo context-connect window (30 s, no knob) and cross-process
    # compile skew on this 1-core box can exceed it (parallel/mesh.py)
    from aclgan_tpu.parallel.mesh import coordination_barrier

    key = jax.random.PRNGKey(3)
    model.train_step.lower(state, x_a, x_b, key, True, True).compile()
    coordination_barrier("step-compiled")
    new_state, metrics = model.train_step(state, x_a, x_b, key, True, True)
    jax.block_until_ready(new_state)

    from jax.experimental import multihost_utils

    ga = multihost_utils.process_allgather(x_a, tiled=True)
    gb = multihost_utils.process_allgather(x_b, tiled=True)
    if process_id == 0:
        np.save(os.path.join(out_dir, "global_a.npy"), np.asarray(ga))
        np.save(os.path.join(out_dir, "global_b.npy"), np.asarray(gb))
        with open(os.path.join(out_dir, "metrics.json"), "w") as f:
            json.dump({k: float(v) for k, v in metrics.items()}, f)


def run_resume(process_id, out_dir):
    """Checkpoint-at-step-2 resume parity under process_count()==2: the
    resumed run's metrics at steps 3-4 must equal the uninterrupted run's,
    bitwise RNG stream included (fold_in(base key, step))."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    from aclgan_tpu.parallel.mesh import batch_sharding, make_mesh, shard_state
    from aclgan_tpu.trainer import ACLGAN
    from aclgan_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = _tiny_cfg()
    model = ACLGAN(cfg)
    mesh = make_mesh(jax.device_count())
    b_shard = batch_sharding(mesh)
    base = jax.random.PRNGKey(7)

    def batch(seed):
        # deterministic global batch, sharded over the data mesh
        arr = np.asarray(jax.random.uniform(
            jax.random.PRNGKey(seed), (cfg.batch_size, 16, 16, 3),
            minval=-1, maxval=1))
        local = arr[process_id * 2:(process_id + 1) * 2]
        return jax.make_array_from_process_local_data(b_shard, local, arr.shape)

    batches = [(batch(10 + i), batch(20 + i)) for i in range(4)]
    cadence = [(True, True), (True, False)] * 2

    def run(state, key, steps):
        ms = None
        for i in steps:
            dd, dg = cadence[i]
            state, ms = model.train_step(state, *batches[i], key, dd, dg)
        return state, {k: float(v) for k, v in ms.items()}

    state0 = shard_state(model.init_state(jax.random.PRNGKey(0)), mesh)

    # precompile both cadence variants, then barrier before the first
    # collective execution (see run_step)
    from aclgan_tpu.parallel.mesh import coordination_barrier

    for dd, dg in ((True, True), (True, False)):
        model.train_step.lower(state0, *batches[0], base, dd, dg).compile()
    coordination_barrier("resume-compiled")

    su, m_straight = run(state0, base, range(4))

    si, _ = run(state0, base, range(2))
    if process_id == 0:
        save_checkpoint(out_dir, si, iterations=int(si.step) - 1, rng_key=base)
    multihost_utils.sync_global_devices("ckpt-written")
    template = shard_state(model.init_state(jax.random.PRNGKey(9)), mesh)
    restored, _, rng = load_checkpoint(out_dir, template)
    restored = shard_state(restored, mesh)
    sr, m_resumed = run(restored, rng, range(2, 4))

    for k, want in m_straight.items():
        got = m_resumed[k]
        assert abs(got - want) <= 1e-6 * max(1.0, abs(want)), (k, got, want)
    # final params identical too
    fu = jnp.concatenate([x.reshape(-1) for x in jax.tree_util.tree_leaves(su.gen_params)])
    fr = jnp.concatenate([x.reshape(-1) for x in jax.tree_util.tree_leaves(sr.gen_params)])
    assert bool(jnp.all(fu == fr)), "resumed gen params differ"
    print(f"resume-parity: ok ({process_id})", flush=True)


def run_cli(process_id, out_dir):
    """Drive the REAL cli/train.py main() for 4 iterations at
    process_count()==2 (distributed is initialized here, so the config keeps
    tpu.distributed false to avoid double-init)."""
    from aclgan_tpu.cli.train import main as train_main
    from aclgan_tpu.config import load_config, save_config

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "smoke.yaml"))
    cfg.max_iter = 4
    cfg.batch_size = 4          # global; 2 per process
    cfg.snapshot_save_iter = 2
    cfg.log_iter = 1
    cfg.image_save_iter = 2
    cfg.image_display_iter = 4
    cfg_path = os.path.join(out_dir, f"mh_smoke.yaml")
    if process_id == 0:
        save_config(cfg, cfg_path)
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("cfg-written")
    train_main(["--config", cfg_path,
                "--output_path", os.path.join(out_dir, "run")])


if __name__ == "__main__":
    main()
