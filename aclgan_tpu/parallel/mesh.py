"""Device mesh + sharding strategy (data parallelism over ICI).

The reference is strictly single-GPU (bare .cuda() calls, train.py:42; no
torch.distributed anywhere — SURVEY §2.12). This module is the TPU-native
scaling design it lacks:

- a 1-D `Mesh(('data',))` over all local devices (multi-host: all global
  devices after `jax.distributed.initialize`),
- parameters + optimizer state replicated (`P()`), image batches sharded on
  the batch axis (`P('data')`),
- the per-step gradient all-reduce is *compiled by XLA* from those shardings
  — the NCCL-allreduce equivalent, riding ICI within a slice and DCN across
  hosts, with zero communication code here.

An optional second `spatial` axis (activation H sharding with conv halo
exchange) is provided by aclgan_tpu.parallel.spatial for >256² images.

Per-sample normalization everywhere in the model means DP loss gradients are
exactly the mean of per-shard gradients — asserted by
tests/test_parallel.py against the single-device step.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = -1, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh; n_data=-1 uses every device."""
    devs = list(devices if devices is not None else jax.devices())
    if n_data == -1:
        n_data = len(devs)
    if n_data > len(devs):
        raise ValueError(f"mesh_data={n_data} > available devices {len(devs)}")
    return Mesh(np.asarray(devs[:n_data]), ("data",))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Place every leaf replicated on the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.device_put(tree, sharding)


def shard_state(state: Any, mesh: Mesh) -> Any:
    """Training state is replicated under pure DP."""
    return replicate(state, mesh)


def coordination_barrier(name: str, timeout_s: int = 1800) -> None:
    """Cross-process barrier over the distributed coordination service (gRPC
    to the coordinator) — NOT a device collective.

    Used to absorb cross-process compile skew before the first
    collective-bearing executable runs: the CPU (Gloo) backend's collective
    context-connect window is a fixed 30 s with no jax-level knob, and two
    processes compiling the same program on contended hosts can easily exceed
    that skew (observed on a 1-core box: one worker reached the first
    all-reduce minutes before its peer and the Gloo rendezvous timed out).
    The pattern is: AOT-compile the first step (`fn.lower(...).compile()`),
    call this barrier, then execute — the post-barrier skew is only cache
    reload time. No-op single-process.
    """
    if jax.process_count() == 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_s * 1000)
