#!/usr/bin/env python
"""Behavior (actor-critic) training on top of a trained world model.

Turns the reference's dormant policy heads (utils/models/policy.py,
never trained by its pipeline) into a live Dreamer-style agent: imagination
rollouts through the frozen world model train ``ActorModel``/``ValueModel``
with TD(lambda) returns (multimodal_rssm_tpu/train/behavior.py).

    python scripts/train_behavior.py --run-dir results/exp/date/run_0 \
        behavior.horizon=15 behavior.train_iteration=2000

``--run-dir`` points at a world-model training run (its hydra_config.yaml +
latest ``models_*.msgpack`` / reference ``models_*.pth`` are used);
``--model-path`` selects a specific checkpoint.  Actor/value checkpoints and
metrics land in ``{run_dir}/behavior/``.
"""

import argparse
import os
import time


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("overrides", nargs="*", help="dotted config overrides")
    parser.add_argument("--run-dir", required=True,
                        help="world-model run dir (hydra_config.yaml + ckpt)")
    parser.add_argument("--model-path", default=None,
                        help="explicit checkpoint (.msgpack or reference "
                             ".pth); default: latest in --run-dir")
    parser.add_argument("--cwd", default=".")
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from multimodal_rssm_tpu.core.runtime import enable_persistent_cache

    enable_persistent_cache()

    from multimodal_rssm_tpu.core.config import apply_overrides, load_run_config
    from multimodal_rssm_tpu.data.device_buffer import DeviceReplay, gather_batch
    from multimodal_rssm_tpu.eval.state_estimation import load_model_variables
    from multimodal_rssm_tpu.io import checkpoint as ckpt
    from multimodal_rssm_tpu.io.metrics import MetricLogger
    from multimodal_rssm_tpu.models.world_model import WorldModel
    from multimodal_rssm_tpu.train import behavior as bh
    from multimodal_rssm_tpu.train import trainer as tr
    from multimodal_rssm_tpu.train.loop import get_dataset_loader, _device_batch

    cfg = load_run_config(args.run_dir)
    apply_overrides(cfg, args.overrides)
    bh.behavior_cfg(cfg)

    model_path = args.model_path or ckpt.latest_checkpoint(args.run_dir)
    if model_path is None:
        raise FileNotFoundError(f"no models_*.msgpack under {args.run_dir}")
    print(f"world model: {model_path}")

    model = WorldModel.from_config(cfg, dtype=tr.compute_dtype(cfg))
    wm_variables = load_model_variables(model, cfg, model_path)
    wm_variables.setdefault("batch_stats", {})

    D = get_dataset_loader(cfg, args.cwd, cfg.train.train_data_path,
                           seed=int(cfg.main.seed or 0))
    aug_spec = tr.build_aug_spec(D)
    draws = tr.HostAugmentDraws(D, aug_spec)
    B, L = int(cfg.train.batch_size), int(cfg.train.chunk_size)

    actor, value = bh.build_policy_models(cfg)
    actor_opt, value_opt = bh.build_behavior_optimizers(cfg)
    key = jax.random.PRNGKey(int(cfg.main.seed or 0))
    key, init_key = jax.random.split(key)
    bstate = bh.init_behavior_state(cfg, actor, value, actor_opt, value_opt,
                                    init_key)
    step_fn = bh.make_behavior_step(model, cfg, actor, value, actor_opt,
                                    value_opt, aug_spec)

    out_dir = os.path.join(args.run_dir, "behavior")
    logger = MetricLogger(out_dir, use_wandb=bool(cfg.main.wandb))

    use_device_replay = DeviceReplay.fits(D)
    if use_device_replay:
        dev = DeviceReplay(D)

        def next_batch():
            return gather_batch(dev.arrays, dev.sample_indices(B, L),
                                D.observation_names, dev.row_shapes)
    else:
        def next_batch():
            return _device_batch(D.sample(B, L))

    b = cfg.behavior
    iters = int(b.train_iteration)
    t0 = time.perf_counter()
    for itr in range(1, iters + 1):
        key, k = jax.random.split(key)
        bstate, metrics = step_fn(bstate, wm_variables, next_batch(),
                                  draws.draw(), k)
        if itr % int(b.log_interval) == 0 or itr == iters:
            host = {k2: float(v) for k2, v in
                    jax.device_get(metrics).items()}
            host["steps_per_sec"] = itr / (time.perf_counter() - t0)
            logger.log(host, itr)
            print(f"[{itr}/{iters}] actor {host['actor_loss']:.4f} "
                  f"value {host['value_loss']:.4f} "
                  f"return {host['imag_return']:.4f} "
                  f"({host['steps_per_sec']:.2f} it/s)")
        if itr % int(b.checkpoint_interval) == 0 or itr == iters:
            path = ckpt.save_checkpoint(out_dir, itr, bstate)
            print(f"saved {path}")
    logger.finish()


if __name__ == "__main__":
    main()
