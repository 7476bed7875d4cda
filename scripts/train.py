#!/usr/bin/env python
"""Training entry point.

Mirrors the reference CLI (train/.../MRSSM/main.py): compose the config
from ``configs/`` and accept hydra-style dotted overrides, e.g.

    python scripts/train.py main.experiment_name=sample \
        rssm.multimodal_params.fusion_method=PoE train.batch_size=32

Multi-seed sweeps via ``--seeds 0,1,2`` (ref main.py:41 seed loop).
"""

import argparse
import copy
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from multimodal_rssm_tpu.core.config import compose  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("overrides", nargs="*", help="dotted config overrides")
    parser.add_argument("--config-dir", default=os.path.join(
        os.path.dirname(__file__), "..", "configs"))
    parser.add_argument("--config-name", default="config")
    parser.add_argument("--seeds", default=None,
                        help="comma-separated seeds (default: cfg.main.seed)")
    parser.add_argument("--cwd", default=".")
    args = parser.parse_args()

    from multimodal_rssm_tpu.train.loop import run

    cfg = compose(args.config_dir, args.config_name, args.overrides)
    if cfg.main.experiment_name is None:
        cfg.main.experiment_name = "RSSM"

    seeds = ([int(s) for s in args.seeds.split(",")]
             if args.seeds else [int(cfg.main.seed or 0)])
    for seed in seeds:
        _cfg = copy.deepcopy(cfg)
        _cfg.main.seed = seed
        if len(seeds) > 1:
            _cfg.main.experiment_name = f"{cfg.main.experiment_name}-seed_{seed}"
        run(_cfg, cwd=args.cwd)


if __name__ == "__main__":
    main()
