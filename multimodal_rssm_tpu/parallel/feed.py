"""Multi-host (multi-process) batch feeding.

On a multi-host TPU slice each process sees only its local devices; a
jit-compiled step over a global ``Mesh`` consumes *global* jax.Arrays whose
shards live on the local devices of every process.  The reference has no
multi-device story at all (SURVEY §2: single ``cuda:0``); the TPU-native
pattern is:

1. every host samples its own chunk batch from its local replay buffer
   (``data/buffer.py`` — the COBOTTA dataset is small enough to replicate
   per host; for larger corpora shard the episode files across hosts);
2. ``global_batch_from_local`` assembles the global [L, B_global, ...]
   arrays via ``jax.make_array_from_process_local_data``, placing each
   host's [L, B_local, ...] block on its local devices along the ``data``
   mesh axis;
3. the jitted train step runs SPMD over the global mesh; gradient psums
   ride ICI (and DCN between slices) — inserted by XLA, no explicit
   collectives here.

Single-process (including the CPU-simulated 8-device mesh used in tests)
is just the degenerate case process_count == 1, so the same code path runs
everywhere.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_rssm_tpu.parallel.mesh import data_axes


def global_batch_sharding(mesh, x_ndim: int, batch_dim: int = 1):
    """NamedSharding that shards ``batch_dim`` over the data axes
    (('slice', 'data') on a hybrid multi-slice mesh)."""
    spec = [None] * x_ndim
    if x_ndim > batch_dim:
        spec[batch_dim] = data_axes(mesh)
    return NamedSharding(mesh, P(*spec))


def global_batch_from_local(mesh, local_batch: Any, batch_dim: int = 1):
    """Assemble global arrays from per-process local batches.

    ``local_batch`` is any pytree of host numpy/jax arrays shaped
    [L, B_local, ...]; the result is a pytree of global jax.Arrays shaped
    [L, B_local * process_count, ...] sharded over the mesh ``data`` axis,
    each process contributing only its local block (no cross-host copies —
    the standard multi-host input-pipeline pattern).
    """

    def _make(x):
        sharding = global_batch_sharding(mesh, x.ndim, batch_dim)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(_make, local_batch)
