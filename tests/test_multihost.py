"""Multi-host (2-process) data-parallel execution on CPU.

The TPU-native analog of a multi-node NCCL test (the reference has no
distributed code at all — bare .cuda(), SURVEY §2.12): two OS processes
joined by jax.distributed.initialize over a local coordinator, each loading
its half of the global batch, assembled with
jax.make_array_from_process_local_data, running one fused train step. The
single-process run on the gathered global batch must produce identical
metrics — proving the per-process loader sharding and the collective-backed
step are equivalent to the serial semantics.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_step_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # one local CPU device per process
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             str(i), "2", str(port), str(tmp_path)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"worker {i}: ok" in out

    with open(tmp_path / "metrics.json") as f:
        dist_metrics = json.load(f)
    x_a = np.load(tmp_path / "global_a.npy")
    x_b = np.load(tmp_path / "global_b.npy")
    assert x_a.shape == (4, 16, 16, 3)
    # halves must come from differently-seeded per-process loaders
    assert not np.allclose(x_a[:2], x_a[2:])

    # single-process reference on the same global batch
    import jax

    from aclgan_tpu.config import Config, DisConfig, GenConfig
    from aclgan_tpu.trainer import ACLGAN

    cfg = Config()
    cfg.gen = GenConfig(dim=8, mlp_dim=16, style_dim=8, output_dim=4,
                        n_downsample=2, n_res=2, pad_type="reflect")
    cfg.dis = DisConfig(dim=8, norm="none", activ="lrelu", n_layer=2,
                        gan_type="lsgan", num_scales=2, pad_type="reflect")
    cfg.data.synthetic = True
    cfg.tpu.compute_dtype = "float32"
    cfg.tpu.donate_state = False
    cfg.batch_size = 4
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    _, metrics = model.train_step(state, x_a, x_b, jax.random.PRNGKey(3),
                                  True, True)
    for k, want in dist_metrics.items():
        np.testing.assert_allclose(float(metrics[k]), want, rtol=1e-5,
                                   err_msg=k)
