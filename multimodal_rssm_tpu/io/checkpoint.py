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
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_state_dict(tree):
    return serialization.to_state_dict(tree)


def save_checkpoint(
    results_dir: str,
    step: int,
    train_state,
    extra: Optional[Dict[str, Any]] = None,
) -> str:
    """Atomically write ``models_{step}.msgpack``; returns the path."""
    os.makedirs(results_dir, exist_ok=True)
    payload = {
        "step": int(step),
        "state": _to_state_dict(jax.device_get(train_state)),
        "extra": extra or {},
    }
    data = serialization.msgpack_serialize(payload)
    path = os.path.join(results_dir, f"models_{step}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic on POSIX
    return path


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


def load_checkpoint(path: str, train_state_template) -> Tuple[Any, int, Dict]:
    """Restore a TrainState from file given a freshly-initialised template
    (shapes/dtypes source).  Returns (state, step, extra)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = serialization.from_state_dict(train_state_template, payload["state"])
    return state, int(payload["step"]), dict(payload.get("extra", {}))


def restore_or_none(results_dir: str, train_state_template):
    """Auto-resume hook: (state, step, extra) from the latest checkpoint or
    None when the directory holds none."""
    path = latest_checkpoint(results_dir)
    if path is None:
        return None
    return load_checkpoint(path, train_state_template)
