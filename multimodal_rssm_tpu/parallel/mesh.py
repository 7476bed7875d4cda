"""Device mesh + sharding helpers.

The reference is strictly single-device (SURVEY §2: no DP/TP/PP/SP/EP, no
communication backend; device pick at utils/logger.py:96-104).  The
TPU-native replacement is single-controller JAX over a
``jax.sharding.Mesh``:

- a ``data`` axis over ICI shards the batch dimension of every array in the
  batch (data parallelism); parameters are replicated;
- gradients are averaged by XLA-inserted collectives (psum over ``data``)
  because the loss is a mean over sharded batch elements and params are
  replicated — no explicit NCCL-style calls anywhere;
- a ``model`` axis is reserved for future tensor sharding of the wide
  GRU/head matmuls (unused by default: at reference scale, DP is the only
  profitable axis — a GRU carry is sequential, so sequence parallelism does
  not apply; documented design decision per SURVEY §2).

Batches are time-major [L, B, ...]; the batch axis is dim 1.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh over available devices with (data, model) axes."""
    devices = list(devices) if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, batch_dim: int = 1) -> NamedSharding:
    """Shard the batch dimension over the data axis (time-major layout)."""
    spec = [None] * (batch_dim + 1)
    spec[batch_dim] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_spec(path_unused, leaf, n_model: int) -> P:
    """Partition spec for one parameter leaf under the ``model`` axis:
    matrices whose last dim divides the model-axis size are column-sharded
    (output-feature sharding of the wide GRU/head matmuls — each device
    computes a slice of the output features; XLA inserts the all-gathers
    where a replicated value is needed).  Everything else is replicated."""
    if n_model > 1 and leaf.ndim >= 2 and leaf.shape[-1] % n_model == 0:
        return P(*([None] * (leaf.ndim - 1) + [MODEL_AXIS]))
    return P()


def shard_params(params, mesh: Mesh):
    """device_put parameters with model-axis sharding where profitable."""
    n_model = mesh.shape.get(MODEL_AXIS, 1)

    def _put(leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, param_spec(None, leaf, n_model))
        )

    return jax.tree_util.tree_map(_put, params)


def shard_batch(batch, mesh: Mesh, batch_dim: int = 1):
    """Device_put every leaf with its batch dim sharded over ``data``."""
    def _put(x):
        spec = [None] * x.ndim
        if x.ndim > batch_dim:
            spec[batch_dim] = DATA_AXIS
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(_put, batch)
