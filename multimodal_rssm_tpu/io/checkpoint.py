"""Checkpointing: params + optimizer state + step + PRNG, atomic, resumable.

Fixes the reference's checkpoint gaps (SURVEY §5): the reference saves only
module state_dicts every 1000 iters (base/algo.py:56-58), discards optimizer
state on load (:51-54) and never persists the iteration count.  Here a
checkpoint is the full TrainState (step, params, batch_stats, opt_state)
plus the data/augmentation PRNG states, written atomically (tmp + rename)
as flax-serialized msgpack, with `latest` discovery for auto-resume.

File naming keeps the reference's ``models_{itr}`` convention so run
directories stay recognisable to reference-era tooling.
"""

from __future__ import annotations

import os
import re
import shutil
import threading
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def _to_state_dict(tree):
    return serialization.to_state_dict(tree)


def _host_global(tree):
    """Every leaf as its full GLOBAL value on this host.

    Single-controller arrays are fully addressable and fetched directly.
    In a multi-process run (``jax.distributed``) leaves sharded or
    replicated over other hosts' devices are *not* fully addressable —
    ``jax.device_get`` would raise — so each is allgathered
    (``multihost_utils.process_allgather`` returns the fully-replicated
    global value for a non-addressable ``jax.Array``).  The allgather is a
    collective: in multi-process mode every process must reach the save at
    the same training step.
    """

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            # tiled=True is required for global arrays; the result is the
            # fully-replicated global value either way
            return multihost_utils.process_allgather(x, tiled=True)
        return x

    return jax.device_get(jax.tree_util.tree_map(fetch, tree))


def save_checkpoint(
    results_dir: str,
    step: int,
    train_state,
    extra: Optional[Dict[str, Any]] = None,
) -> str:
    """Atomically write ``models_{step}.msgpack``; returns the path.

    Multi-host safe: sharded/replicated global arrays are allgathered to
    their full value (collective — every process must call this at the
    same step), process 0 writes the file, and all processes rendezvous
    before returning so the checkpoint is visible to everyone on a shared
    filesystem.  Single-process behaviour (and the on-disk format) is
    unchanged.
    """
    payload = {
        "step": int(step),
        "state": _to_state_dict(_host_global(train_state)),
        "extra": extra or {},
    }
    path = os.path.join(results_dir, f"models_{step}.msgpack")
    if jax.process_index() == 0:
        os.makedirs(results_dir, exist_ok=True)
        data = serialization.msgpack_serialize(payload)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)  # atomic on POSIX
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # don't let another process proceed (e.g. resume, eval-on-ckpt)
        # before the file exists
        multihost_utils.sync_global_devices(f"save_checkpoint_{step}")
    return path


class AsyncCheckpointer:
    """Non-blocking checkpoint writes for the training loop.

    ``save_checkpoint`` blocks the loop on ``jax.device_get`` — the full
    device→host copy plus msgpack encode plus disk write, hundreds of ms
    at reference scale — every ``checkpoint_interval`` steps.  Here
    ``save`` instead (1) snapshots the state with an **on-device copy**
    (``jnp.copy``, dispatched asynchronously: required for correctness,
    not just speed, because the jitted train step donates its state
    argument, so the original buffers are invalidated the moment the next
    step is dispatched) and (2) hands the snapshot to a writer thread that
    does the device_get + serialize + atomic rename off the critical path.

    At most one write is in flight: a second ``save`` first joins the
    previous one (bounding host memory at one extra host copy of the
    state).  ``wait()`` joins and re-raises any writer exception — call it
    before reading the files back or returning from the loop.  The on-disk
    format is byte-identical to ``save_checkpoint``.

    Single-controller only: in a multi-process run ``save_checkpoint`` is
    a collective (allgather + barrier), and issuing collectives from a
    background thread can interleave differently across processes with the
    main loop's step collectives — a launch-order deadlock.  The training
    loop falls back to synchronous saves when ``jax.process_count() > 1``.
    """

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None
        self._last_path: Optional[str] = None

    def save(self, results_dir: str, step: int, train_state,
             extra: Optional[Dict[str, Any]] = None, keep: int = 0) -> None:
        snapshot = jax.tree_util.tree_map(jnp.copy, train_state)
        self.wait()

        def _write():
            try:
                self._last_path = save_checkpoint(
                    results_dir, step, snapshot, extra)
                prune_checkpoints(results_dir, keep)
            except BaseException as e:  # surfaced on the next wait()
                self._error = e

        self._thread = threading.Thread(
            target=_write, name=f"ckpt-write-{step}", daemon=True)
        self._thread.start()

    def wait(self) -> Optional[str]:
        """Join the in-flight write (if any); re-raises writer errors.
        Returns the path of the last completed write."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err
        return self._last_path


def prune_checkpoints(results_dir: str, keep: int) -> list:
    """Keep only the ``keep`` highest-step ``models_*.msgpack`` files
    (0 = keep everything, the reference's behaviour — it accumulates one
    ~0.4 GB file per 1000 iters forever).  Returns the deleted paths.
    Only process 0 deletes (mirrors the writer side)."""
    if keep <= 0 or jax.process_index() != 0:
        return []
    found = []
    if os.path.isdir(results_dir):
        for name in os.listdir(results_dir):
            m = re.fullmatch(r"models_(\d+)\.msgpack", name)
            if m:
                found.append((int(m.group(1)), os.path.join(results_dir, name)))
    found.sort()
    doomed = [p for _, p in found[:-keep]] if len(found) > keep else []
    for p in doomed:
        os.remove(p)
    return doomed


def latest_checkpoint(results_dir: str) -> Optional[str]:
    """Highest-step ``models_*.msgpack`` in a results dir (auto-resume)."""
    if not os.path.isdir(results_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(results_dir):
        m = re.fullmatch(r"models_(\d+)\.msgpack", name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(results_dir, name)
    return best


def _fill_missing_fields(template_sd, payload_sd, path="", filled=None):
    """Recursively inject template defaults for dict keys absent from a
    restored state dict (schema-forward restore: a checkpoint written
    before a field existed — e.g. BehaviorState.return_scale, added round
    3 — stays loadable; the new field starts at its init value).  Returns
    (merged, filled_key_paths)."""
    if filled is None:
        filled = []
    if not isinstance(template_sd, dict) or not isinstance(payload_sd, dict):
        return payload_sd, filled
    merged = {}
    for k, tv in template_sd.items():
        if k in payload_sd:
            merged[k], _ = _fill_missing_fields(
                tv, payload_sd[k], f"{path}/{k}", filled)
        else:
            merged[k] = tv
            filled.append(f"{path}/{k}")
    # keys present in the payload but not the template are kept so
    # from_state_dict raises its usual unknown-field error (a silently
    # dropped field would hide a real schema mismatch)
    for k, v in payload_sd.items():
        if k not in merged:
            merged[k] = v
    return merged, filled


def load_checkpoint(path: str, train_state_template) -> Tuple[Any, int, Dict]:
    """Restore a TrainState from file given a freshly-initialised template
    (shapes/dtypes source).  Returns (state, step, extra).

    Fields the template has but the checkpoint lacks are filled from the
    template (with a warning) so checkpoints predating a state-schema
    addition keep loading (ADVICE r3)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    template_sd = serialization.to_state_dict(train_state_template)
    merged, filled = _fill_missing_fields(template_sd, payload["state"])
    if filled:
        import logging

        logging.getLogger(__name__).warning(
            "checkpoint %s predates state field(s) %s; using template "
            "init values for them", path, ", ".join(filled))
    state = serialization.from_state_dict(train_state_template, merged)
    return state, int(payload["step"]), dict(payload.get("extra", {}))


def restore_or_none(results_dir: str, train_state_template):
    """Auto-resume hook: (state, step, extra) from the latest checkpoint or
    None when the directory holds none."""
    path = latest_checkpoint(results_dir)
    if path is None:
        return None
    return load_checkpoint(path, train_state_template)
