#!/usr/bin/env python
"""Online Dreamer training: learn the world model AND the actor-critic
while interacting with an environment.

Assembles the pieces the reference ships but never connects (online
buffer append memory.py:225-238, actor/value heads policy.py) into the
full Dreamer loop: alternate world-model + behavior updates with
actor-driven episode collection (multimodal_rssm_tpu/train/online.py).

    python scripts/train_online.py --env synthetic \
        main.experiment_name=online online.episodes=50 \
        online.collect_interval=100

    python scripts/train_online.py --env peg --env-length 100 ...

Results land in the standard run-dir layout (world-model checkpoints at
the top level — consumable by estimate_state.py / check_model.py — and
actor/value checkpoints under ``behavior/``).
"""

import argparse
import os

from multimodal_rssm_tpu.core.config import compose  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("overrides", nargs="*", help="dotted config overrides")
    parser.add_argument("--config-dir", default=None,
                        help="config tree (default: the packaged configs/, or $MRSSM_CONFIG_DIR)")
    parser.add_argument("--config-name", default="config")
    parser.add_argument(
        "--env", default="synthetic",
        help="'synthetic' | 'peg' | external-suite spec "
             "('gym:Pendulum-v1', 'dmc:cartpole:swingup', "
             "'robosuite:Lift') — see envs/zoo.py")
    parser.add_argument("--env-length", type=int, default=100,
                        help="episode length of the environment")
    parser.add_argument("--cwd", default=".")
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax

    from multimodal_rssm_tpu.core.runtime import enable_persistent_cache

    enable_persistent_cache()

    from multimodal_rssm_tpu.envs import make_env
    from multimodal_rssm_tpu.io.experiment import setup_experiment
    from multimodal_rssm_tpu.train.online import online_cfg, run_online

    cfg = compose(args.config_dir, args.config_name, args.overrides)
    if cfg.main.experiment_name is None:
        cfg.main.experiment_name = "online"
    online_cfg(cfg)

    env = make_env(args.env, length=args.env_length)
    if int(cfg.env.action_size) != int(env.action_size):
        # zoo adapters carry the suite's action dimensionality; the model
        # and buffer must be built to match it
        print(f"online training: env.action_size {cfg.env.action_size} -> "
              f"{env.action_size} (from --env {args.env})")
        cfg.env.action_size = int(env.action_size)
    cwd, results_dir, logger, key = setup_experiment(cfg, args.cwd)
    try:
        run_online(cfg, env, results_dir, logger, key)
    finally:
        logger.finish()
    print(f"done: {results_dir}")


if __name__ == "__main__":
    main()
