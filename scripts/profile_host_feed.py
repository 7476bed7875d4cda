#!/usr/bin/env python
"""Root-cause the host-streamed feed cliff (VERDICT r4 weak #2).

Times each host-side component of the ``--feed host`` path in isolation at
the default COBOTTA scale (batch 50 x chunk 50), then the composed loop
with and without the prefetcher, so the ~gap between the compiled step
(BENCH ms_per_step) and the observed host-feed step rate is attributed to
named costs instead of guesswork.

Usage: python scripts/profile_host_feed.py [--batch-size 50 --chunk-size 50]
Prints a JSON dict of per-component milliseconds.
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, n=10, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return 1e3 * statistics.median(ts)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=50)
    parser.add_argument("--chunk-size", type=int, default=50)
    parser.add_argument("--episodes", type=int, default=4)
    parser.add_argument("--episode-length", type=int, default=120)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_rssm_tpu.core.config import compose
    from multimodal_rssm_tpu.core.runtime import enable_persistent_cache
    from multimodal_rssm_tpu.data.buffer import build_buffer
    from multimodal_rssm_tpu.models.world_model import WorldModel
    from multimodal_rssm_tpu.train import trainer as tr
    from multimodal_rssm_tpu.train.prefetch import Prefetcher

    enable_persistent_cache()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = compose(os.path.join(root, "configs"), overrides=[
        f"train.batch_size={args.batch_size}",
        f"train.chunk_size={args.chunk_size}",
        "train.experience_size=20000",
    ])
    sys.path.insert(0, os.path.join(root, "scripts"))
    from _profiling_common import fill_synthetic_buffer

    D = fill_synthetic_buffer(build_buffer(cfg), cfg, episodes=args.episodes,
                              ep_len=args.episode_length)
    B, L = int(cfg.train.batch_size), int(cfg.train.chunk_size)

    out = {}

    # 1. index sampling (python rejection loop, B calls)
    out["sample_indices_ms"] = timeit(lambda: D.sample_indices(B, L))

    # 2. host gather (C++ threaded / numpy fallback)
    idxs = D.sample_indices(B, L)
    out["host_gather_ms"] = timeit(lambda: D.gather(idxs, B, L))

    # 3. host->device transfer of one gathered batch (blocked)
    batch = D.gather(idxs, B, L)
    obs, act, rew, nt = batch
    nbytes = sum(v.nbytes for v in obs.values()) + act.nbytes + rew.nbytes + nt.nbytes
    out["batch_mb"] = round(nbytes / 1e6, 1)

    def transfer():
        leaves = ([jnp.asarray(v) for v in obs.values()]
                  + [jnp.asarray(act), jnp.asarray(rew), jnp.asarray(nt)])
        jax.block_until_ready(leaves)
        # value-fetch barrier (tunnel caveat, bench.py:149-152)
        float(jax.device_get(leaves[-1].reshape(-1)[0]))

    out["transfer_ms"] = timeit(transfer)
    out["transfer_mb_per_s"] = round(nbytes / 1e6 / (out["transfer_ms"] / 1e3), 1)

    # 4. aug draws
    spec = tr.build_aug_spec(D)
    draws_src = tr.HostAugmentDraws(D, spec)
    out["aug_draw_ms"] = timeit(draws_src.draw)

    # 5. full device_batch (sample + transfer, what the prefetch worker runs)
    def device_batch():
        o, a, r, n = D.sample(B, L)
        leaves = ({k: jnp.asarray(v) for k, v in o.items()},
                  jnp.asarray(a), jnp.asarray(r), jnp.asarray(n))
        return leaves

    def device_batch_blocked():
        leaves = device_batch()
        jax.block_until_ready(jax.tree_util.tree_leaves(leaves))
        float(jax.device_get(leaves[1].reshape(-1)[0]))

    out["device_batch_blocked_ms"] = timeit(device_batch_blocked)

    # 6. compiled step alone, device-resident args (no host feed)
    model = WorldModel.from_config(cfg, dtype=tr.compute_dtype(cfg))
    optimizer = tr.build_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    raw = device_batch()
    prep = tr.prepare_observations(raw[0], spec, draws_src.draw(),
                                   int(cfg.env.bit_depth), key)
    state = tr.init_train_state(model, cfg, optimizer, key,
                                (prep, raw[1], raw[2], raw[3]))
    train_step, _ = tr.make_train_step(model, cfg, optimizer, spec)
    fixed = device_batch()
    jax.block_until_ready(jax.tree_util.tree_leaves(fixed))
    state2, m = train_step(state, fixed, draws_src.draw(), key)

    def step_only():
        nonlocal state2
        state2, m = train_step(state2, fixed, draws_src.draw(), key)
        float(jax.device_get(m["loss"]))

    out["compiled_step_ms"] = timeit(step_only, n=10)

    # 7. composed: synchronous host feed (no prefetcher)
    def sync_loop():
        nonlocal state2
        b = device_batch()
        state2, m = train_step(state2, b, draws_src.draw(), key)
        float(jax.device_get(m["loss"]))

    out["sync_feed_step_ms"] = timeit(sync_loop, n=10)

    # 8. composed: prefetcher depth-2 (bench.py --feed host shape)
    pf = Prefetcher(device_batch, depth=2)
    try:
        def pf_loop():
            nonlocal state2
            state2, m = train_step(state2, pf.get(), draws_src.draw(), key)
            float(jax.device_get(m["loss"]))

        out["prefetch_feed_step_ms"] = timeit(pf_loop, n=10)
    finally:
        pf.close()

    out["ncpu"] = os.cpu_count()
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
