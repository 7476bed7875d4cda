#!/usr/bin/env python
"""Phase-wise timing of the training step on the current backend.

Times: full train step, forward-only loss, posterior estimation alone
(encoder+scan), encoder alone, decode alone, and the input pipeline — to
show where a step's wall-clock goes.  Run on TPU for real numbers.

    python scripts/profile_step.py [--batch-size 50 --chunk-size 50 --small]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, n=10, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=50)
    parser.add_argument("--chunk-size", type=int, default=50)
    parser.add_argument("--small", action="store_true")
    parser.add_argument("--override", action="append", default=[],
                        help="extra config overrides (repeatable), e.g. "
                             "--override rssm.latent_dist=categorical")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from _profiling_common import build_step_setup, enable_compile_cache
    from multimodal_rssm_tpu.train import trainer as tr

    enable_compile_cache()
    overrides = []
    if args.small:
        overrides += [
            "rssm.belief_size=64", "rssm.state_size=16", "rssm.hidden_size=64",
            "rssm.embedding_size.image=64", "rssm.embedding_size.sound=32",
            "rssm.embedding_size.fusion=64", "train.use_amp=False",
        ]
    overrides += list(args.override)
    (cfg, model, optimizer, spec, draws, raw, prep, state,
     key) = build_step_setup(args.batch_size, args.chunk_size, overrides)
    bit_depth = int(cfg.env.bit_depth)
    train_step, eval_step = tr.make_train_step(model, cfg, optimizer, spec)
    loss_fn = tr.make_loss_fn(model, cfg)

    # phases
    obs_t = {k: v[1:] for k, v in prep.items()}
    acts, nts = raw[1][:-1], raw[3][:-1]

    prep_j = jax.jit(lambda o, k: tr.prepare_observations(o, spec, draws, bit_depth, k))
    est_j = jax.jit(lambda p, bs, k: model.apply(
        {"params": p, "batch_stats": bs}, obs_t, acts, nts, k, False, True,
        method=model.estimate_state, mutable=["batch_stats"]))
    states, _ = est_j(state.params, state.batch_stats, key)
    dec_j = jax.jit(lambda p, bs: model.apply(
        {"params": p, "batch_stats": bs}, states["beliefs"],
        states["posterior_states"], True, method=model.decode,
        mutable=["batch_stats"]))
    enc_j = jax.jit(lambda p, bs: model.apply(
        {"params": p, "batch_stats": bs}, obs_t, True, method=model.encode,
        mutable=["batch_stats"]))
    fwd_j = jax.jit(lambda p, bs, k: loss_fn(p, bs, (prep, raw[1], raw[2], raw[3]), k, True))

    results = {}
    results["input_pipeline_ms"] = timeit(prep_j, raw[0], key) * 1e3
    results["encoder_ms"] = timeit(enc_j, state.params, state.batch_stats) * 1e3
    results["estimate_state_ms"] = timeit(est_j, state.params, state.batch_stats, key) * 1e3
    results["decode_ms"] = timeit(dec_j, state.params, state.batch_stats) * 1e3
    results["forward_loss_ms"] = timeit(fwd_j, state.params, state.batch_stats, key) * 1e3

    # full step: thread the (donated) state through the loop
    for _ in range(2):
        state, m = train_step(state, raw, draws, key)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        state, m = train_step(state, raw, draws, key)
    jax.block_until_ready(m["loss"])
    results["full_train_step_ms"] = (time.perf_counter() - t0) / n * 1e3

    for k, v in results.items():
        print(f"{k:22s} {v:8.2f}")
    scan_ms = results["estimate_state_ms"] - results["encoder_ms"]
    print(f"{'(scan alone ~)':22s} {scan_ms:8.2f}")


if __name__ == "__main__":
    main()
