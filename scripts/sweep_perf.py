#!/usr/bin/env python
"""Measure train-step throughput for config variants (fresh-batch pattern,
value-fetch synchronisation — reliable through the remote-TPU tunnel).

    python scripts/sweep_perf.py --variants remat,noremat --steps 20
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))



VARIANTS = {
    "remat": [],
    "noremat": ["rssm.remat=False"],
    "f32": ["train.use_amp=False"],
    "b100": ["train.batch_size=100"],
    "b128": ["train.batch_size=128"],
    "b100_conv": ["train.batch_size=100", "rssm.remat=decoders_conv"],
    "b128_conv": ["train.batch_size=128", "rssm.remat=decoders_conv"],
    "b128_full": ["train.batch_size=128", "rssm.remat=True"],
    "poe": ["rssm.multimodal_params.fusion_method=PoE"],
    "nonorm": ["rssm.normalization=None"],
    "groupnorm": ["rssm.normalization=GroupNorm"],
    # lax.scan unroll factor for the 49-step time loop (rssm.scan_unroll)
    "unroll2": ["rssm.scan_unroll=2"],
    "unroll7": ["rssm.scan_unroll=7"],
    "unroll49": ["rssm.scan_unroll=49"],
}


def measure(overrides, steps, episodes=4, ep_len=120, xla_options=None):
    import jax
    import jax.numpy as jnp

    from multimodal_rssm_tpu.core.config import compose
    from multimodal_rssm_tpu.data.buffer import build_buffer
    from multimodal_rssm_tpu.models.world_model import WorldModel
    from multimodal_rssm_tpu.train import trainer as tr

    cfg = compose(os.path.join(os.path.dirname(__file__), "..", "configs"),
                  overrides=["train.experience_size=20000"] + overrides)
    if xla_options is not None:
        # replace (not merge): the sweep states the full option set so each
        # row is self-describing
        cfg.train.xla_options = xla_options
    from _profiling_common import fill_synthetic_buffer

    D = fill_synthetic_buffer(build_buffer(cfg), cfg, episodes=episodes,
                              ep_len=ep_len)

    model = WorldModel.from_config(cfg, dtype=tr.compute_dtype(cfg))
    optimizer = tr.build_optimizer(cfg)
    spec = tr.build_aug_spec(D)
    draws_src = tr.HostAugmentDraws(D, spec)
    key = jax.random.PRNGKey(0)
    B, L = int(cfg.train.batch_size), int(cfg.train.chunk_size)

    def device_batch():
        obs, act, rew, nt = D.sample(B, L)
        return ({k: jnp.asarray(v) for k, v in obs.items()},
                jnp.asarray(act), jnp.asarray(rew), jnp.asarray(nt))

    raw = device_batch()
    prep = tr.prepare_observations(raw[0], spec, draws_src.draw(),
                                   int(cfg.env.bit_depth), key)
    state = tr.init_train_state(model, cfg, optimizer, key,
                                (prep, raw[1], raw[2], raw[3]))

    from multimodal_rssm_tpu.data.device_buffer import DeviceReplay

    dev = DeviceReplay(D)
    train_step, _ = tr.make_device_resident_steps(model, cfg, optimizer, spec,
                                                  D.observation_names,
                                                  row_shapes=dev.row_shapes)

    def run_step(state, k):
        return train_step(state, dev.arrays, dev.sample_indices(B, L),
                          draws_src.draw(), k)

    for _ in range(3):
        key, k = jax.random.split(key)
        state, metrics = run_step(state, k)
    float(jax.device_get(metrics["loss"]))

    t0 = time.perf_counter()
    for _ in range(steps):
        key, k = jax.random.split(key)
        state, metrics = run_step(state, k)
    loss = float(jax.device_get(metrics["loss"]))
    el = time.perf_counter() - t0
    frames = B * L
    return steps / el, 1e3 * el / steps, loss, frames


def _parse_xla_spec(spec):
    """``k=v,k=v`` -> dict with int/bool literal coercion ('' -> {})."""
    out = {}
    for item in filter(None, spec.split(",")):
        k, v = item.split("=", 1)
        if v in ("true", "false"):
            out[k] = v == "true"
        else:
            for cast in (int, float):
                try:
                    out[k] = cast(v)
                    break
                except ValueError:
                    continue
            else:
                out[k] = v
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--variants", default="remat")
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument(
        "--xla", action="append", default=None, metavar="SPEC",
        help="sweep XLA compiler options instead of config variants: each "
             "SPEC is a full 'k=v,k=v' option set (repeatable; 'default' = "
             "shipped config value, 'none' = compiler defaults).  Unknown "
             "flags fail at compile time and are reported per-row.")
    args = parser.parse_args()

    if args.xla is not None:
        for spec in args.xla:
            if spec == "default":
                xla = None      # leave the shipped train.yaml value
            elif spec == "none":
                xla = {}
            else:
                xla = _parse_xla_spec(spec)
            try:
                sps, ms, loss, frames = measure([], args.steps,
                                                xla_options=xla)
            except Exception as e:
                print(f"xla[{spec}] FAILED: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:160]}", flush=True)
                continue
            print(f"xla[{spec}] {sps:7.3f} steps/s  {ms:7.0f} ms/step  "
                  f"loss {loss:.1f}", flush=True)
        return

    for name in args.variants.split(","):
        try:
            sps, ms, loss, frames = measure(VARIANTS[name], args.steps)
        except Exception as e:  # e.g. HBM OOM at large batch without remat
            print(f"{name:10s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
            continue
        print(f"{name:10s} {sps:7.2f} steps/s  {ms:7.0f} ms/step  "
              f"{sps*frames:9.0f} frames/s  loss {loss:.1f}", flush=True)


if __name__ == "__main__":
    main()
