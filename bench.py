#!/usr/bin/env python
"""Benchmark harness: COBOTTA-scale training steps/sec on the current JAX
backend (TPU in production).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Configuration mirrors the reference's default experiment scale
(config/train/train.yaml: batch 50 x chunk 50, belief 1024 / state 128,
image_horizon + sound MoPoE fusion, AMP on -> bf16 here) on synthetic
COBOTTA-schema episodes.  ``vs_baseline`` compares against the PyTorch
reference measured by scripts/bench_reference_torch.py on this host
(recorded in bench_baseline_torch.json); the reference publishes no numbers
of its own (BASELINE.md).

Flags: --steps N --warmup N --batch-size B --chunk-size L --small (tiny
model for CI smoke).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--batch-size", type=int, default=50)
    parser.add_argument("--chunk-size", type=int, default=50)
    parser.add_argument("--small", action="store_true")
    parser.add_argument("--episodes", type=int, default=4)
    parser.add_argument("--episode-length", type=int, default=120)
    parser.add_argument("--override", action="append", default=[],
                        help="extra config overrides (repeatable), e.g. "
                             "--override rssm.remat=false")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodal_rssm_tpu.core.runtime import enable_persistent_cache

    enable_persistent_cache()

    from multimodal_rssm_tpu.core.config import compose
    from multimodal_rssm_tpu.data.buffer import build_buffer
    from multimodal_rssm_tpu.models.world_model import WorldModel
    from multimodal_rssm_tpu.train import trainer as tr

    overrides = [
        f"train.batch_size={args.batch_size}",
        f"train.chunk_size={args.chunk_size}",
        "train.experience_size=20000",
    ]
    if args.small:
        # tiny model AND tiny batch/chunk (unless explicitly overridden):
        # the small profile is an any-backend smoke test — at the default
        # batch 50 x chunk 50 the f32 sound-decoder activations alone
        # (f32[2450,128,20,128] = 3 GB each) exceed a v5e chip's 16 GB HBM
        if args.batch_size == parser.get_default("batch_size"):
            overrides[0] = "train.batch_size=8"
        if args.chunk_size == parser.get_default("chunk_size"):
            overrides[1] = "train.chunk_size=10"
        overrides += [
            "rssm.belief_size=64", "rssm.state_size=16", "rssm.hidden_size=64",
            "rssm.embedding_size.image=64", "rssm.embedding_size.sound=32",
            "rssm.embedding_size.fusion=64", "rssm.embedding_size.other=16",
            "train.use_amp=False",
        ]
    overrides += list(args.override)
    cfg_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs")
    cfg = compose(cfg_dir, overrides=overrides)

    # synthetic episodes straight into the buffer (no filesystem round trip)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "scripts"))
    from _profiling_common import fill_synthetic_buffer

    D = fill_synthetic_buffer(build_buffer(cfg), cfg, episodes=args.episodes,
                              ep_len=args.episode_length)

    model = WorldModel.from_config(cfg, dtype=tr.compute_dtype(cfg))
    optimizer = tr.build_optimizer(cfg)
    spec = tr.build_aug_spec(D)
    draws_src = tr.HostAugmentDraws(D, spec)

    B, L = int(cfg.train.batch_size), int(cfg.train.chunk_size)
    key = jax.random.PRNGKey(0)

    def device_batch():
        obs, act, rew, nt = D.sample(B, L)
        return ({k: jnp.asarray(v) for k, v in obs.items()},
                jnp.asarray(act), jnp.asarray(rew), jnp.asarray(nt))

    raw = device_batch()
    prep = tr.prepare_observations(raw[0], spec, draws_src.draw(),
                                   int(cfg.env.bit_depth), key)
    state = tr.init_train_state(model, cfg, optimizer, key,
                                (prep, raw[1], raw[2], raw[3]))

    # HBM-resident replay when the dataset fits: the steady-state
    # host->device traffic is a few KB of chunk indices per step
    # (data/device_buffer.py).
    from multimodal_rssm_tpu.data.device_buffer import DeviceReplay

    use_device_replay = DeviceReplay.fits(D)
    if use_device_replay:
        dev = DeviceReplay(D)
        train_step, _ = tr.make_device_resident_steps(
            model, cfg, optimizer, spec, D.observation_names)

        def run_step(state, k):
            return train_step(state, dev.arrays, dev.sample_indices(B, L),
                              draws_src.draw(), k)
    else:
        train_step, _ = tr.make_train_step(model, cfg, optimizer, spec)

        def run_step(state, k):
            return train_step(state, device_batch(), draws_src.draw(), k)

    for i in range(args.warmup):
        key, k = jax.random.split(key)
        state, metrics = run_step(state, k)
    # value fetch, not block_until_ready: through the remote-TPU tunnel the
    # latter can return before execution completes (observed empirically);
    # materialising the scalar is the reliable barrier.
    float(jax.device_get(metrics["loss"]))

    t0 = time.perf_counter()
    for i in range(args.steps):
        key, k = jax.random.split(key)
        state, metrics = run_step(state, k)
    float(jax.device_get(metrics["loss"]))
    elapsed = time.perf_counter() - t0
    steps_per_sec = args.steps / elapsed

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_baseline_torch.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        base = baseline.get("steps_per_sec")
        if base:
            vs_baseline = steps_per_sec / base

    print(json.dumps({
        "metric": "cobotta_mrssm_train_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
