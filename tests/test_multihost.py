"""Multi-host (multi-process) data-parallel execution on CPU.

The TPU-native analog of a multi-node NCCL test (the reference has no
distributed code at all — bare .cuda(), SURVEY §2.12): OS processes joined by
jax.distributed.initialize over a local coordinator, each loading its share
of the global batch, assembled with jax.make_array_from_process_local_data,
running the fused train step. Covered topologies (VERDICT r2 item 5):

- 2 processes x 1 device: one step; metrics equal a single-process run on the
  gathered global batch, and the process-rank -> global-row mapping is pinned
  against each process's local loader output.
- 2 processes x 2 devices (4-device global mesh): same assertions — the
  topology where per-process loader shards can misalign with device order.
- checkpoint-resume parity at process_count()==2 (asserted in-worker).
- the REAL cli/train.py main() driven for 4 iterations at process_count()==2
  (per-process loaders, broadcast display batches, main-only file IO).
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


def _run_workers(tmp_path, scenario="step", local_devices=1, num=2):
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # local device count set in-worker
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             str(i), str(num), str(port), str(tmp_path), scenario,
             str(local_devices)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(num)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"worker {i}: ok" in out
    return outs


def _assert_step_outputs(tmp_path):
    """Shared assertions for the 'step' scenario: row-order pinning + metric
    parity with a single-process run on the gathered global batch."""
    with open(tmp_path / "metrics.json") as f:
        dist_metrics = json.load(f)
    x_a = np.load(tmp_path / "global_a.npy")
    x_b = np.load(tmp_path / "global_b.npy")
    assert x_a.shape == (4, 16, 16, 3)
    # halves must come from differently-seeded per-process loaders
    assert not np.allclose(x_a[:2], x_a[2:])
    # process-rank -> global-row mapping: rank i's LOCAL loader batch must be
    # global rows [2i, 2i+2) (metric equality alone is permutation-invariant
    # and cannot catch a scrambled device order)
    for i in range(2):
        np.testing.assert_array_equal(
            x_a[2 * i:2 * i + 2], np.load(tmp_path / f"local_a_{i}.npy"))
        np.testing.assert_array_equal(
            x_b[2 * i:2 * i + 2], np.load(tmp_path / f"local_b_{i}.npy"))

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


@pytest.mark.slow
def test_two_process_step_matches_single_process(tmp_path):
    _run_workers(tmp_path, "step", local_devices=1)
    _assert_step_outputs(tmp_path)


@pytest.mark.slow
def test_two_process_two_device_mesh(tmp_path):
    """2 processes x 2 virtual devices = 4-device global mesh; each local
    2-image loader batch spans 2 devices."""
    _run_workers(tmp_path, "step", local_devices=2)
    _assert_step_outputs(tmp_path)


@pytest.mark.slow
def test_two_process_checkpoint_resume(tmp_path):
    outs = _run_workers(tmp_path, "resume", local_devices=1)
    for i, out in enumerate(outs):
        assert f"resume-parity: ok ({i})" in out


@pytest.mark.slow
def test_two_process_train_cli(tmp_path):
    outs = _run_workers(tmp_path, "cli", local_devices=1)
    # only process 0 logs iterations and writes files
    assert "Iteration: 00000004/00000004" in outs[0]
    assert "Iteration:" not in outs[1]
    for out in outs:
        assert "Finish training" in out
    run = tmp_path / "run" / "outputs" / "mh_smoke"
    assert (run / "checkpoints" / "gen_00000004.msgpack").exists()
    assert (run / "checkpoints" / "optimizer.msgpack").exists()
    assert (run / "images" / "gen_a2b_test_00000002.jpg").exists() or \
        any((run / "images").glob("*00000002*")), list((run / "images").glob("*"))
    scalars = tmp_path / "run" / "logs" / "mh_smoke" / "scalars.jsonl"
    assert scalars.exists()
    lines = [json.loads(l) for l in open(scalars)]
    assert len(lines) >= 4 and all(
        np.isfinite(v) for l in lines for k, v in l.items() if k != "step")
