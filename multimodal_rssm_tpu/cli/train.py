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

from multimodal_rssm_tpu.core.config import compose  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("overrides", nargs="*", help="dotted config overrides")
    parser.add_argument("--config-dir", default=None,
                        help="config tree (default: the packaged configs/, or $MRSSM_CONFIG_DIR)")
    parser.add_argument("--config-name", default="config")
    parser.add_argument("--seeds", default=None,
                        help="comma-separated seeds (default: cfg.main.seed)")
    parser.add_argument("--cwd", default=".")
    parser.add_argument("--resume", default=None, metavar="RUN_DIR",
                        help="resume an interrupted run from its results dir "
                             "(or 'latest': most recent run of the composed "
                             "main.experiment_name); restores step + params "
                             "+ optimizer + PRNG from the newest checkpoint")
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                        help="force a JAX platform (this container's "
                             "sitecustomize ignores the JAX_PLATFORMS env "
                             "var, so CPU smoke runs need this flag)")
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from multimodal_rssm_tpu.core.runtime import enable_persistent_cache
    from multimodal_rssm_tpu.train.loop import run

    enable_persistent_cache()

    if args.resume:
        if args.seeds:
            parser.error("--resume resumes ONE run; --seeds is not allowed")
        from multimodal_rssm_tpu.core.config import apply_overrides, load_run_config
        from multimodal_rssm_tpu.io.experiment import find_latest_run

        if args.resume == "latest":
            cfg = compose(args.config_dir, args.config_name, args.overrides)
            if cfg.main.experiment_name is None:
                parser.error("--resume latest needs main.experiment_name")
            resume_dir = find_latest_run(args.cwd, cfg.main.experiment_name)
        else:
            resume_dir = args.resume
        # the saved run config IS the run archive (ref estimate_state.py:28-29);
        # CLI overrides still apply on top (e.g. extending train_iteration)
        cfg = load_run_config(resume_dir)
        apply_overrides(cfg, args.overrides)
        print(f"resuming run at {resume_dir}")
        run(cfg, cwd=args.cwd, resume_dir=resume_dir)
        return

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
