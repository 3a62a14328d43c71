"""Mesh + sharding helpers: the TPU-native replacement for DDP/NCCL.

The reference scales with PyTorch-Lightning DDP over NCCL
(``train.py:135-146``; ``src/system/core.py:127,138`` all_gather). Here the
same capability is one ``jax.sharding.Mesh`` with a ``data`` axis spanning
hosts (DCN) × chips (ICI): batches are sharded over ``data``, parameters are
replicated, and XLA inserts the gradient all-reduce (psum) during jit — no
process groups, no hand-written collectives.

An optional ``model`` axis is reserved for intra-model sharding of the TF
core (frequency-sharded scans) in multi-chip-per-replica layouts.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults to all devices on the data axis. Device order follows
    ``jax.devices()`` so the data axis rides ICI within a host before
    spilling onto DCN across hosts.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"{n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, tree):
    """Place a batch pytree with the leading axis sharded over ``data``."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_spec() -> P:
    return P("data")


def replicated_spec() -> P:
    return P()
