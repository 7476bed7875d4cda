"""Metric logging: JSONL always, wandb when available and enabled.

The reference logs exclusively to wandb (utils/logger.py:71-90,
base/algo.py:262-266) with keys like ``observation_{name}_loss/train``.
This logger keeps those exact key conventions but writes an append-only
``metrics.jsonl`` in the results dir as the durable record (wandb is
optional and absent in this image), plus per-step wall-clock timing — the
observability the reference lacks (SURVEY §5 tracing: none).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Mapping, Optional


def _tree_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


class MetricLogger:
    def __init__(self, results_dir: str, use_wandb: bool = False,
                 wandb_kwargs: Optional[dict] = None):
        os.makedirs(results_dir, exist_ok=True)
        self.path = os.path.join(results_dir, "metrics.jsonl")
        self._f = open(self.path, "a", buffering=1)
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                wandb.init(**(wandb_kwargs or {}))
                self._wandb = wandb
            except Exception:
                self._wandb = None  # degrade silently to JSONL

    def log(self, metrics: Mapping[str, float], step: int,
            suffix: str = "train") -> None:
        """Log scalars under ``{name}/{suffix}`` (reference key convention,
        base/algo.py:264,290)."""
        rec: Dict[str, float] = {}
        for k, v in metrics.items():
            rec[f"{k}/{suffix}"] = float(v)
        rec["step"] = int(step)
        rec["time"] = time.time()
        self._f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log(
                {k: v for k, v in rec.items() if k not in ("step", "time")},
                step=step,
            )

    def log_histograms(self, tree, step: int, prefix: str = "params") -> None:
        """Per-module histogram summaries — the ``wandb.watch`` analogue
        (ref RSSM/algo.py:39-43 registers gradient/parameter histograms on
        every module).  For each top-level module of ``tree`` (params or
        grads pytree) logs count/min/max/mean/std plus a fixed 16-bin
        histogram, as JSON (and ``wandb.Histogram`` when wandb is active).
        """
        import numpy as np

        rec: Dict[str, object] = {"step": int(step), "time": time.time()}
        wandb_rec = {}
        for mod, sub in dict(tree).items():
            leaves = [np.asarray(l).ravel() for l in _tree_leaves(sub)]
            if not leaves:
                continue
            flat = np.concatenate([l.astype(np.float32) for l in leaves])
            finite = flat[np.isfinite(flat)]
            n_bad = int(flat.size - finite.size)
            if finite.size == 0:
                # all-NaN/Inf gradients: record the fact instead of letting
                # np.histogram raise and kill the training loop — this is
                # exactly the moment the diagnostics matter
                rec[f"{prefix}_{mod}/hist"] = {
                    "count": int(flat.size), "nonfinite": n_bad,
                }
                continue
            counts, edges = np.histogram(finite, bins=16)
            rec[f"{prefix}_{mod}/hist"] = {
                "count": int(flat.size),
                "nonfinite": n_bad,
                "min": float(finite.min()), "max": float(finite.max()),
                "mean": float(finite.mean()), "std": float(finite.std()),
                "bin_counts": counts.tolist(),
                "bin_edges": [float(e) for e in edges],
            }
            if self._wandb is not None:
                wandb_rec[f"{prefix}_{mod}/hist"] = (
                    self._wandb.Histogram(np_histogram=(counts, edges)))
        self._f.write(json.dumps(rec) + "\n")
        if self._wandb is not None and wandb_rec:
            self._wandb.log(wandb_rec, step=step)

    def log_frame_count(self, step: int, batch_size: int, chunk_size: int) -> None:
        """``frame`` counter (ref base/algo.py:265-266)."""
        self._f.write(json.dumps({
            "frame": int(step * batch_size * chunk_size),
            "step": int(step), "time": time.time(),
        }) + "\n")

    def finish(self) -> None:
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
