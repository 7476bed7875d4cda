#!/usr/bin/env python
"""Offline batch state estimation over saved runs.

Mirrors the reference ``estimate_state.py``: scan a directory of run
folders, re-open each run's saved ``hydra_config.yaml``, load its
checkpoint, and dump per-episode posterior states as
``states_models_{itr}.npy`` next to the checkpoint.

    python scripts/estimate_state.py --targets eval_targets [--itr 10000]

Accepts native ``models_{itr}.msgpack`` checkpoints and reference
``models_{itr}.pth`` files interchangeably.
"""

import argparse
import os


def multi_run(targets_dir: str, itr: int):
    from multimodal_rssm_tpu.core.config import load_run_config
    from multimodal_rssm_tpu.eval.state_estimation import run

    for folder in sorted(os.listdir(targets_dir)):
        run_dir = os.path.join(targets_dir, folder)
        if not os.path.isdir(run_dir):
            continue
        if "hydra_config.yaml" not in os.listdir(run_dir):
            continue
        cfg = load_run_config(run_dir)
        cfg.main.wandb = False
        log_dir = cfg.main.log_dir or run_dir
        for ext in (".msgpack", ".pth"):
            model_path = os.path.join(log_dir, f"models_{itr}{ext}")
            if os.path.exists(model_path):
                break
        else:
            print(f"skip {run_dir}: no models_{itr} checkpoint")
            continue
        out = run(cfg, cwd=".", model_path=model_path)
        print(f"saved {out}")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--targets", default="eval_targets")
    parser.add_argument("--itr", type=int, default=10_000)
    args = parser.parse_args()
    from multimodal_rssm_tpu.core.runtime import enable_persistent_cache

    enable_persistent_cache()
    multi_run(args.targets, args.itr)


if __name__ == "__main__":
    main()
