"""Mesh and sharding helpers.

The workload's only meaningful parallel axis is the batch: models are
~0.3M parameters on length-320 inputs (the reference's sole distributed code
is a vestigial single-rank gloo DDP block, run_train.py:448-456).  The
TPU-native design is therefore a 1-D ``data`` mesh with batch sharding and
replicated parameters; XLA inserts the gradient ``psum`` over ICI.

A second ``model`` axis is supported for demonstration/testing of 2-D
layouts, but defaults to size 1; ``parallel/tp.py`` provides the
column/row-parallel layer pair that uses it.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices:
        raise ValueError(
            f"data_mesh needs {n_devices} devices but jax reports only "
            f"{len(devices)} ({[d.platform for d in devices]}); for a virtual "
            "mesh, configure jax_platforms='cpu' + jax_num_cpu_devices BEFORE "
            "any device use (see tests/conftest.py)."
        )
    devices = np.asarray(devices[:n_devices])
    assert n_devices % model_parallel == 0, (n_devices, model_parallel)
    grid = devices.reshape(n_devices // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place every array in a (possibly nested) batch with the leading dim
    sharded over the 'data' axis."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch
    )


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0):
    """Pad axis to a multiple (for even batch sharding); returns (padded, n_valid)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return np.pad(x, pad, mode="edge"), n
