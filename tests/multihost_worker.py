"""Worker process for the 2-process multi-host CPU test (SURVEY §2.12/§5.8).

Run as: python tests/multihost_worker.py <process_id> <num_processes> <port> <out_dir>

Each process runs the exact multi-host path of cli/train.py:101-109: a
per-process loader (batch_size/num_processes samples, process-offset seed)
feeding jax.make_array_from_process_local_data over a global data mesh, then
one fused D+G train step. Process 0 dumps the assembled global batch (via
process_allgather of its addressable view) and the step metrics so the test
can assert equality with a single-process run on the same global batch.
"""

import json
import os
import sys


def main():
    process_id, num_processes, port, out_dir = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=num_processes,
                               process_id=process_id)
    assert jax.process_count() == num_processes
    n_global = jax.device_count()

    import dataclasses

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from aclgan_tpu.config import Config, DisConfig, GenConfig
    from aclgan_tpu.data.loader import device_prefetch, get_all_data_loaders
    from aclgan_tpu.parallel.mesh import batch_sharding, make_mesh, shard_state
    from aclgan_tpu.trainer import ACLGAN

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

    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    mesh = make_mesh(n_global)
    state = shard_state(state, mesh)
    b_shard = batch_sharding(mesh)

    # per-process loaders, exactly as cli/train.py:101-109
    local_cfg = dataclasses.replace(cfg, batch_size=cfg.batch_size // num_processes)
    loader_a, loader_b, _, _ = get_all_data_loaders(
        local_cfg, seed=cfg.seed + jax.process_index())
    it_a = device_prefetch(loader_a, 2, b_shard)
    it_b = device_prefetch(loader_b, 2, b_shard)
    x_a, x_b = next(it_a), next(it_b)
    assert x_a.shape == (cfg.batch_size, 16, 16, 3), x_a.shape
    assert x_a.sharding.is_equivalent_to(
        NamedSharding(mesh, P("data")), x_a.ndim)

    new_state, metrics = model.train_step(state, x_a, x_b,
                                          jax.random.PRNGKey(3), True, True)
    jax.block_until_ready(new_state)

    from jax.experimental import multihost_utils

    ga = multihost_utils.process_allgather(x_a, tiled=True)
    gb = multihost_utils.process_allgather(x_b, tiled=True)
    if process_id == 0:
        np.save(os.path.join(out_dir, "global_a.npy"), np.asarray(ga))
        np.save(os.path.join(out_dir, "global_b.npy"), np.asarray(gb))
        with open(os.path.join(out_dir, "metrics.json"), "w") as f:
            json.dump({k: float(v) for k, v in metrics.items()}, f)
    multihost_utils.sync_global_devices("done")
    print(f"worker {process_id}: ok", flush=True)


if __name__ == "__main__":
    main()
