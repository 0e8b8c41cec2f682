"""Device mesh and sharding layout.

The reference's distributed backend is one-process-per-GPU DDP over NCCL
(util/misc.py:505-548, main.py:204-206). TPU-native replacement (SURVEY.md
§2.7): a ``jax.sharding.Mesh`` with axes ``("data", "model")`` under a
single jit — GSPMD shards the batch over ``data`` (DDP-equivalent; gradient
all-reduce is inserted by XLA over ICI), while ``model`` is reserved for
tensor-parallel layouts of the transformer heads/FFN on larger slices.
``reduce_dict``-style scalar syncs (util/misc.py:139-163) are free: metrics
computed from globally-sharded arrays inside jit are already global.

Multi-host: call :func:`init_distributed` first (``jax.distributed``
replaces the reference's env-var/SLURM process-group bootstrap).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed() -> None:
    """Multi-host bootstrap (no-op single-host) — parity with
    ``init_distributed_mode`` (util/misc.py:505-548)."""
    if "JAX_COORDINATOR_ADDRESS" in os.environ or "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()


def make_mesh(
    data: int = -1, model: int = 1, devices: Optional[list] = None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}×{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over 'data' — the DDP-equivalent layout."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict with the batch axis over the data axis."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
