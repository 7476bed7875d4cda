#!/usr/bin/env python
"""Evaluate a trained actor in an environment (greedy episodes).

Loads a run directory produced by scripts/train_online.py (or a world-model
run plus scripts/train_behavior.py output) — the world-model checkpoint at
the top level and the actor/value checkpoint under ``behavior/`` — and
rolls the latent agent without exploration noise, printing one JSON line
of return statistics.

    python scripts/eval_policy.py --run-dir results/online/DATE/run_0 \
        --env synthetic --episodes 5
"""

import argparse
import json
import os
import sys


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("overrides", nargs="*", help="dotted config overrides")
    parser.add_argument("--run-dir", required=True)
    parser.add_argument(
        "--env", default="synthetic",
        help="'synthetic' | 'peg' | suite spec ('gym:<id>', "
             "'dmc:<domain>:<task>', 'robosuite:<Task>' — envs/zoo.py)")
    parser.add_argument("--env-length", type=int, default=100)
    parser.add_argument("--episodes", type=int, default=5)
    parser.add_argument("--stochastic", action="store_true",
                        help="sample the actor instead of the mode-seeking "
                             "deterministic action")
    parser.add_argument("--policy", default="actor",
                        choices=["actor", "cem"],
                        help="'actor': trained behavior head (needs the "
                             "behavior/ checkpoint); 'cem': zero-shot CEM "
                             "planning through the world model alone "
                             "(train/planner.py — planner.* overrides set "
                             "horizon/candidates)")
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax

    from multimodal_rssm_tpu.core.config import apply_overrides, load_run_config
    from multimodal_rssm_tpu.core.runtime import enable_persistent_cache

    enable_persistent_cache()

    from multimodal_rssm_tpu.envs import make_env
    from multimodal_rssm_tpu.eval.policy import evaluate_policy
    from multimodal_rssm_tpu.eval.state_estimation import load_model_variables
    from multimodal_rssm_tpu.io import checkpoint as ckpt
    from multimodal_rssm_tpu.models.world_model import WorldModel
    from multimodal_rssm_tpu.train import behavior as bh
    from multimodal_rssm_tpu.train import trainer as tr

    cfg = load_run_config(args.run_dir)
    apply_overrides(cfg, args.overrides)
    bh.behavior_cfg(cfg)

    wm_path = ckpt.latest_checkpoint(args.run_dir)
    if wm_path is None:
        raise FileNotFoundError(f"need models_*.msgpack in {args.run_dir}")

    model = WorldModel.from_config(cfg, dtype=tr.compute_dtype(cfg))
    wm_variables = load_model_variables(model, cfg, wm_path)
    wm_variables.setdefault("batch_stats", {})

    agent = None
    actor = actor_params = None
    if args.policy == "cem":
        from multimodal_rssm_tpu.data.buffer import build_buffer
        from multimodal_rssm_tpu.train.planner import (
            CEMAgent,
            check_reward_head_trained,
        )

        check_reward_head_trained(cfg, "--policy cem")
        if args.stochastic:
            parser.error("--stochastic only applies to --policy actor "
                         "(CEM planning is already the greedy policy)")
        print(f"world model: {wm_path}\npolicy: CEM planner",
              file=sys.stderr)
        agent = CEMAgent(cfg, model, build_buffer(cfg))
    else:
        bh_path = ckpt.latest_checkpoint(
            os.path.join(args.run_dir, "behavior"))
        if bh_path is None:
            raise FileNotFoundError(
                f"need a behavior/ checkpoint in {args.run_dir} for "
                "--policy actor (or use --policy cem)"
            )
        print(f"world model: {wm_path}\nactor/value: {bh_path}",
              file=sys.stderr)
        actor, value = bh.build_policy_models(cfg)
        actor_opt, value_opt = bh.build_behavior_optimizers(cfg)
        template = bh.init_behavior_state(cfg, actor, value, actor_opt,
                                          value_opt, jax.random.PRNGKey(0))
        bstate, _, _ = ckpt.load_checkpoint(bh_path, template)
        actor_params = bstate.actor_params

    env = make_env(args.env, length=args.env_length)
    stats = evaluate_policy(cfg, env, model, wm_variables, actor,
                            actor_params, episodes=args.episodes,
                            seed=int(cfg.main.seed or 0),
                            det=not args.stochastic, agent=agent)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
