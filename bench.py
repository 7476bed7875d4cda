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
    parser.add_argument("--feed", default="auto",
                        choices=["auto", "device", "streaming", "host"],
                        help="replay feed path: 'device' = HBM-resident "
                             "buffer (index-only transfers), 'streaming' = "
                             "device-resident working set with async "
                             "segment refresh (the over-budget default "
                             "since round 5 — train.yaml's 500k "
                             "experience_size lands here), 'host' = "
                             "host-streamed batches behind the training "
                             "loop's depth-2 prefetcher (the legacy "
                             "fallback), 'auto' = the training loop's "
                             "decision (DeviceReplay.fits -> streaming -> "
                             "host)")
    parser.add_argument("--refresh-interval", type=int, default=1,
                        help="streaming feed: steps between segment "
                             "refreshes (train.stream_refresh_interval)")
    parser.add_argument("--buffer-gb", type=float, default=None,
                        help="fill the host ring to ~N GiB by tiling the "
                             "synthetic episodes (content-irrelevant for "
                             "throughput; exercises the feed path at "
                             "reference buffer capacity — train.yaml's "
                             "500k experience_size is ~11 GiB)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodal_rssm_tpu.core.runtime import enable_persistent_cache

    enable_persistent_cache()

    from multimodal_rssm_tpu.core.config import compose
    from multimodal_rssm_tpu.data.buffer import build_buffer
    from multimodal_rssm_tpu.models.world_model import WorldModel
    from multimodal_rssm_tpu.train import trainer as tr

    experience_size = 20000
    if args.buffer_gb:
        # rough row estimate just for the ring allocation; the exact fill
        # happens below by tiling loaded episodes
        experience_size = max(experience_size,
                              int(args.buffer_gb * 2**30 / 20000))
    overrides = [
        f"train.batch_size={args.batch_size}",
        f"train.chunk_size={args.chunk_size}",
        f"train.experience_size={experience_size}",
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
    if args.buffer_gb:
        import numpy as np

        base = D.idx
        row_bytes = (sum(D.observations[n][0].nbytes
                         for n in D.observation_names)
                     + D.actions[0].nbytes + D.rewards[0].nbytes
                     + D.nonterminals[0].nbytes)
        target = min(D.size, int(args.buffer_gb * 2**30 / row_bytes))
        while D.idx < target:
            n = min(base, target - D.idx)
            idx = np.arange(D.idx, D.idx + n)
            for name in D.observation_names:
                D.observations[name][idx] = D.observations[name][:n]
            D.actions[idx] = D.actions[:n]
            D.rewards[idx] = D.rewards[:n]
            D.nonterminals[idx] = D.nonterminals[:n]
            D.idx += n
            D.steps += n
        print(f"# host ring filled to {D.idx} rows "
              f"(~{D.idx * row_bytes / 2**30:.2f} GiB)", file=sys.stderr)

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
    from multimodal_rssm_tpu.data.device_buffer import (
        DeviceReplay, StreamingDeviceReplay)

    if args.feed == "auto":
        feed = "device" if DeviceReplay.fits(D) else "streaming"
    else:
        feed = args.feed
    use_device_replay = feed in ("device", "streaming")
    prefetcher = None
    if use_device_replay:
        if feed == "streaming":
            dev = StreamingDeviceReplay(D, chunk_size=L)
        else:
            dev = DeviceReplay(D)
        train_step, _ = tr.make_device_resident_steps(
            model, cfg, optimizer, spec, D.observation_names,
            row_shapes=dev.row_shapes)
        step_count = [0]

        def run_step(state, k):
            out = train_step(state, dev.arrays, dev.sample_indices(B, L),
                             draws_src.draw(), k)
            step_count[0] += 1
            if feed == "streaming" and step_count[0] % args.refresh_interval == 0:
                dev.refresh()
            return out
    else:
        # the training loop's exact fallback shape (train/loop.py): sample
        # + host->device transfer on a worker thread, depth-2 prefetch
        # overlapping the device step
        from multimodal_rssm_tpu.train.prefetch import Prefetcher

        train_step, _ = tr.make_train_step(model, cfg, optimizer, spec)
        prefetcher = Prefetcher(device_batch, depth=2)

        def run_step(state, k):
            return train_step(state, prefetcher.get(), draws_src.draw(), k)

    try:
        for i in range(args.warmup):
            key, k = jax.random.split(key)
            state, metrics = run_step(state, k)
        # value fetch, not block_until_ready: through the remote-TPU tunnel
        # the latter can return before execution completes (observed
        # empirically); materialising the scalar is the reliable barrier.
        float(jax.device_get(metrics["loss"]))

        t0 = time.perf_counter()
        for i in range(args.steps):
            key, k = jax.random.split(key)
            state, metrics = run_step(state, k)
        float(jax.device_get(metrics["loss"]))
        elapsed = time.perf_counter() - t0
        steps_per_sec = args.steps / elapsed
        sec_per_step = elapsed / args.steps
    finally:
        # an exception mid-timing must not leave the worker thread sampling
        # until interpreter exit (ADVICE r4)
        if prefetcher is not None:
            prefetcher.close()

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_baseline_torch.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        base = baseline.get("steps_per_sec")
        if base:
            vs_baseline = steps_per_sec / base

    # ---- roofline (VERDICT r3 #2): XLA cost analysis of the compiled step
    # -> machine-checkable MFU / HBM-bandwidth utilisation, so a perf
    # regression is visible in BENCH_r*.json rather than buried in prose.
    flops = hbm_bytes = None
    try:
        if use_device_replay:
            lowered = train_step.lower(
                state, dev.arrays, dev.sample_indices(B, L),
                draws_src.draw(), key)
        else:
            lowered = train_step.lower(state, device_batch(),
                                       draws_src.draw(), key)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax returned [dict]
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0)) or None
        hbm_bytes = float(ca.get("bytes accessed", 0)) or None
    except Exception as e:  # cost analysis is best-effort per backend
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr)

    peak_flops, peak_bw = _device_peaks(jax.devices()[0])
    mfu = (flops / sec_per_step / peak_flops
           if flops and peak_flops else None)
    hbm_util = (hbm_bytes / sec_per_step / peak_bw
                if hbm_bytes and peak_bw else None)

    print(json.dumps({
        "metric": "cobotta_mrssm_train_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "ms_per_step": round(1e3 * sec_per_step, 2),
        "frames_per_sec": round(steps_per_sec * B * L, 1),
        "flops_per_step": flops,
        "hbm_bytes_per_step": hbm_bytes,
        "mfu": round(mfu, 4) if mfu else None,
        "hbm_util": round(hbm_util, 4) if hbm_util else None,
        "device_kind": getattr(jax.devices()[0], "device_kind", "unknown"),
        "feed": {"device": "device_resident", "streaming": "streaming",
                 "host": "host_streamed"}[feed],
    }))


def _device_peaks(dev):
    """(peak bf16 FLOP/s, peak HBM bytes/s) per chip by device kind.

    Public per-chip specs (cloud.google.com/tpu/docs/system-architecture);
    bf16 MXU peak is the right denominator for this bf16-compute step
    (train.use_amp -> bf16 policy, DESIGN D7).  Unknown kinds (CPU, new
    TPUs) return (None, None) and the utilisation fields are omitted.
    """
    table = [
        ("v5 lite", (197e12, 819e9)), ("v5e", (197e12, 819e9)),
        ("v5p", (459e12, 2765e9)),
        ("v6 lite", (918e12, 1640e9)), ("v6e", (918e12, 1640e9)),
        ("v4", (275e12, 1228e9)),
        ("v3", (123e12, 900e9)),
    ]
    kind = getattr(dev, "device_kind", "").lower()
    for sub, peaks in table:
        if sub in kind:
            return peaks
    return (None, None)


if __name__ == "__main__":
    main()
