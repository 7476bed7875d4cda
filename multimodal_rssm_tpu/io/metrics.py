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
