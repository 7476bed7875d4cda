#!/usr/bin/env python
"""Export a trained run to frozen StableHLO serving artifacts.

The reference has no deployment story (inference lives in
check_model.ipynb against the live torch modules); this emits
self-contained ``jax.export`` artifacts — weights baked in, no model
code or config needed at load time (io/export.py):

- ``filter_step.jaxexport``: raw frame -> posterior update (streaming
  state estimation for a controller / logger)
- ``decode.jaxexport``: (belief, state) -> per-modality reconstructions
- ``agent_step.jaxexport``: raw frame -> posterior update -> greedy
  action (full controller step; needs a behavior/ checkpoint from
  scripts/train_behavior.py or train_online.py)
- ``plan_step.jaxexport`` (``--plan``): raw frame -> posterior update ->
  CEM-planned action (zero-shot MPC, train/planner.py — world-model
  weights only; ``planner.*`` overrides are baked in at export time)

    python scripts/export_model.py --run-dir results/.../run_0 \
        --out exported/ [--batch-size 1] [--platforms cpu,tpu]
"""

import argparse
import json
import os
import sys


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("overrides", nargs="*", help="dotted config overrides")
    parser.add_argument("--run-dir", required=True)
    parser.add_argument("--out", default=None,
                        help="output dir (default: <run-dir>/exported)")
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--platforms", default=None,
                        help="comma-separated lowering platforms, e.g. "
                             "'cpu,tpu' for one cross-platform artifact "
                             "(default: current backend)")
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                        help="backend to trace/export on")
    parser.add_argument("--plan", action="store_true",
                        help="also export plan_step (CEM planning "
                             "controller; no behavior checkpoint needed)")
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax

    from multimodal_rssm_tpu.core.config import apply_overrides, load_run_config
    from multimodal_rssm_tpu.core.runtime import enable_persistent_cache

    enable_persistent_cache()

    from multimodal_rssm_tpu.eval.state_estimation import load_model_variables
    from multimodal_rssm_tpu.io import checkpoint as ckpt
    from multimodal_rssm_tpu.io import export as ex
    from multimodal_rssm_tpu.models.world_model import WorldModel
    from multimodal_rssm_tpu.train import behavior as bh
    from multimodal_rssm_tpu.train import trainer as tr

    cfg = load_run_config(args.run_dir)
    apply_overrides(cfg, args.overrides)

    wm_path = ckpt.latest_checkpoint(args.run_dir)
    if wm_path is None:
        raise FileNotFoundError(f"no models_*.msgpack in {args.run_dir}")
    print(f"world model: {wm_path}", file=sys.stderr)

    model = WorldModel.from_config(cfg)
    variables = load_model_variables(model, cfg, wm_path)
    variables.setdefault("batch_stats", {})

    platforms = args.platforms.split(",") if args.platforms else None
    out_dir = args.out or os.path.join(args.run_dir, "exported")
    os.makedirs(out_dir, exist_ok=True)

    written = {}
    art = ex.export_filter_step(cfg, model, variables,
                                batch_size=args.batch_size,
                                platforms=platforms)
    written["filter_step"] = ex.save_exported(
        art, os.path.join(out_dir, "filter_step.jaxexport"))

    art = ex.export_decode(cfg, model, variables,
                           batch_size=args.batch_size, platforms=platforms)
    written["decode"] = ex.save_exported(
        art, os.path.join(out_dir, "decode.jaxexport"))

    bh_path = ckpt.latest_checkpoint(os.path.join(args.run_dir, "behavior"))
    if bh_path is not None:
        print(f"actor/value: {bh_path}", file=sys.stderr)
        bh.behavior_cfg(cfg)
        actor, value = bh.build_policy_models(cfg)
        actor_opt, value_opt = bh.build_behavior_optimizers(cfg)
        template = bh.init_behavior_state(cfg, actor, value, actor_opt,
                                          value_opt, jax.random.PRNGKey(0))
        bstate, _, _ = ckpt.load_checkpoint(bh_path, template)
        art = ex.export_agent_step(cfg, model, actor, variables,
                                   bstate.actor_params,
                                   batch_size=args.batch_size,
                                   platforms=platforms)
        written["agent_step"] = ex.save_exported(
            art, os.path.join(out_dir, "agent_step.jaxexport"))
    else:
        print("no behavior/ checkpoint: skipping agent_step export",
              file=sys.stderr)

    if args.plan:
        from multimodal_rssm_tpu.train.planner import check_reward_head_trained

        check_reward_head_trained(cfg, "--plan (plan_step export)")
        art = ex.export_plan_step(cfg, model, variables,
                                  batch_size=args.batch_size,
                                  platforms=platforms)
        written["plan_step"] = ex.save_exported(
            art, os.path.join(out_dir, "plan_step.jaxexport"))

    print(json.dumps({k: {"path": v, "bytes": os.path.getsize(v)}
                      for k, v in written.items()}))


if __name__ == "__main__":
    main()
