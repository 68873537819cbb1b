"""Spatial (activation-H) sharding — the conv-GAN analog of sequence/context
parallelism (SURVEY §2.12, §5.7).

The model has no attention; what scales past one chip's memory at high
resolution is the activation footprint of the conv stacks. Strategy:

- 2-D mesh ('data', 'spatial'),
- image batches placed with PartitionSpec('data', 'spatial') — batch sharded
  over 'data', image HEIGHT sharded over 'spatial',
- parameters replicated,
- XLA GSPMD's spatial partitioning inserts the conv halo exchanges
  (collective-permutes over ICI) automatically from the shardings; no manual
  ppermute is needed on this path. `constrain_spatial` pins intermediate
  activations so the partitioner keeps them sharded instead of gathering.

Equivalence with the unsharded computation is asserted by
tests/test_spatial.py on the virtual 8-device CPU mesh (per-sample norms and
VALID convs after explicit padding make the math shard-invariant).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_2d(n_data: int, n_spatial: int,
                 devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    need = n_data * n_spatial
    if need > len(devs):
        raise ValueError(f"mesh {n_data}x{n_spatial} needs {need} devices, "
                         f"have {len(devs)}")
    arr = np.asarray(devs[:need]).reshape(n_data, n_spatial)
    return Mesh(arr, ("data", "spatial"))


def spatial_batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch: N over 'data', H over 'spatial'."""
    return NamedSharding(mesh, P("data", "spatial"))


def constrain_spatial(x, mesh: Mesh):
    """Pin an NHWC activation to (data, spatial) sharding inside jit."""
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("data", "spatial", None, None)))
