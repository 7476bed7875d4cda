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
SLICE_AXIS = "slice"


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


def create_hybrid_mesh(
    n_slices: int,
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Multi-slice mesh with (slice, data, model) axes.

    The ``slice`` axis is the DCN dimension (across TPU slices); ``data``
    and ``model`` ride ICI within a slice.  Data parallelism spans
    slice × data: the batch dim is sharded over both (``data_axes``), and
    XLA lowers the resulting gradient all-reduce hierarchically —
    reduce-scatter/all-reduce over ICI inside each slice first, then one
    gradient buffer per slice over DCN — the bandwidth-correct layout for
    multi-slice DP (DCN traffic is independent of chips-per-slice).
    Model-axis sharding stays intra-slice so its all-gathers never touch
    DCN.

    On real multi-slice TPU, devices are grouped by their slice membership
    via ``mesh_utils.create_hybrid_device_mesh``; on flat platforms (the
    CPU test mesh, a single slice) a contiguous reshape stands in so the
    same code path is testable anywhere.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // (n_slices * n_model)
    want = n_slices * n_data * n_model
    if want > len(devices):
        raise ValueError(
            f"hybrid mesh {n_slices}x{n_data}x{n_model} needs {want} devices,"
            f" have {len(devices)}")
    try:
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_hybrid_device_mesh(
            (1, n_data, n_model), (n_slices, 1, 1), devices=devices[:want]
        )
    except Exception:
        # flat platform (no slice_index attributes): contiguous grouping
        grid = np.asarray(devices[:want]).reshape(n_slices, n_data, n_model)
    return Mesh(grid, (SLICE_AXIS, DATA_AXIS, MODEL_AXIS))


def mesh_from_config(cfg) -> Optional[Mesh]:
    """Build the training mesh from ``cfg.train.mesh`` (None = single device).

    YAML block (configs/train/train.yaml)::

        mesh:
          data: 0             # devices on the data axis; 0 disables the
                              # mesh, -1 = all devices left after model/slice
          model: 1            # tensor-parallel axis (column-sharded kernels)
          slice: 1            # >1 = hybrid multi-slice mesh (DCN-aware)
          min_shard_width: 128  # smallest model-shard width worth the
                                # collectives (one MXU lane tile)

    CLI: ``python scripts/train.py train.mesh.data=4 train.mesh.model=2``.
    """
    spec = cfg.train.get("mesh") if hasattr(cfg, "train") else None
    if not spec:
        return None
    n_data = int(spec.get("data", 0) or 0)
    n_model = int(spec.get("model", 1) or 1)
    n_slice = int(spec.get("slice", 1) or 1)
    if n_data == 0 and n_model <= 1 and n_slice <= 1:
        return None
    n_data_arg = None if n_data in (0, -1) else n_data
    if n_slice > 1:
        return create_hybrid_mesh(n_slice, n_data_arg, n_model)
    return create_mesh(n_data_arg, n_model)


def config_min_shard_width(cfg) -> int:
    spec = (cfg.train.get("mesh") or {}) if hasattr(cfg, "train") else {}
    return int(spec.get("min_shard_width", MIN_SHARD_WIDTH) or MIN_SHARD_WIDTH)


def data_axes(mesh: Mesh):
    """The partition-spec entry the batch dimension shards over:
    ('slice', 'data') on a hybrid mesh, 'data' on a flat one."""
    axes = tuple(a for a in (SLICE_AXIS, DATA_AXIS) if a in mesh.axis_names)
    if not axes:
        return None
    return axes if len(axes) > 1 else axes[0]


def batch_sharding(mesh: Mesh, batch_dim: int = 1) -> NamedSharding:
    """Shard the batch dimension over the data axes (time-major layout)."""
    spec = [None] * (batch_dim + 1)
    spec[batch_dim] = data_axes(mesh)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Minimum output features per model shard: one MXU/VPU lane tile.  A shard
# narrower than the 128-lane tile pads every matmul it feeds to 128 anyway,
# so sharding below this width costs collectives without saving compute.
MIN_SHARD_WIDTH = 128


def param_spec(path, leaf, n_model: int,
               min_width: int = MIN_SHARD_WIDTH) -> P:
    """Partition spec for one parameter leaf under the ``model`` axis.

    Megatron-style output-feature (column) sharding, applied conservatively:

    - only ``kernel`` leaves are candidates — biases, norm scales and other
      1-D/stat leaves stay replicated (tiny; XLA broadcasts them for free);
    - the output-feature (last) dim must divide the model-axis size AND
      leave each shard at least ``min_width`` lanes wide, so small matrices
      (e.g. a [4, 4] kernel whose trailing dim happens to divide
      ``n_model``) are never sharded;
    - each device then computes a slice of the output features of the wide
      GRU/head matmuls; XLA's sharding propagation inserts the all-gathers
      where a replicated value is needed.

    ``path`` is a ``tree_map_with_path`` key path; optimizer-state trees
    (Adam mu/nu) mirror the param tree, so their moment leaves match the
    same rules and land on the same shards as their parameters.
    """
    name = None
    if path:
        tail = path[-1]
        name = getattr(tail, "key", None) or getattr(tail, "name", None)
    if (
        n_model > 1
        and name == "kernel"
        and leaf.ndim >= 2
        and leaf.shape[-1] % n_model == 0
        and leaf.shape[-1] // n_model >= min_width
    ):
        return P(*([None] * (leaf.ndim - 1) + [MODEL_AXIS]))
    return P()


def shard_params(params, mesh: Mesh, min_width: int = MIN_SHARD_WIDTH):
    """device_put parameters with model-axis sharding where profitable.

    ``min_width`` exists for tiny-shape tests/dryruns that still want to
    exercise the tensor-parallel path; production callers use the default.
    """
    n_model = mesh.shape.get(MODEL_AXIS, 1)

    def _put(path, leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, param_spec(path, leaf, n_model, min_width))
        )

    return jax.tree_util.tree_map_with_path(_put, params)


def shard_state(state, mesh: Mesh, min_width: int = MIN_SHARD_WIDTH):
    """Place a TrainState on the mesh: kernels (and their Adam moments,
    which mirror the param tree) column-sharded over ``model`` where
    profitable, step/batch_stats and everything else replicated."""
    rep = replicated(mesh)
    return state.replace(
        step=jax.device_put(state.step, rep),
        params=shard_params(state.params, mesh, min_width),
        batch_stats=jax.device_put(state.batch_stats, rep),
        opt_state=shard_params(state.opt_state, mesh, min_width),
    )


def constrain_state(state, mesh: Mesh, min_width: int = MIN_SHARD_WIDTH):
    """``with_sharding_constraint`` version of :func:`shard_state`, for use
    INSIDE a jitted train step.  Without it GSPMD is free to resolve the
    step's output state as fully replicated, silently dropping the model-
    axis sharding after the first step — the constraint pins the output
    layout so tensor parallelism persists across steps."""
    from jax.lax import with_sharding_constraint as wsc

    n_model = mesh.shape.get(MODEL_AXIS, 1)
    rep = replicated(mesh)

    def _c(path, leaf):
        return wsc(leaf, NamedSharding(
            mesh, param_spec(path, leaf, n_model, min_width)))

    return state.replace(
        step=wsc(state.step, rep),
        params=jax.tree_util.tree_map_with_path(_c, state.params),
        batch_stats=jax.tree_util.tree_map(lambda x: wsc(x, rep),
                                           state.batch_stats),
        opt_state=jax.tree_util.tree_map_with_path(_c, state.opt_state),
    )


def shard_batch(batch, mesh: Mesh, batch_dim: int = 1):
    """Device_put every leaf with its batch dim sharded over the data axes
    ((slice, data) on a hybrid mesh)."""
    axes = data_axes(mesh)

    def _put(x):
        spec = [None] * x.ndim
        if x.ndim > batch_dim:
            spec[batch_dim] = axes
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(_put, batch)
