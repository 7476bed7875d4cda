#!/usr/bin/env python
"""Mesh-size scaling sweep: train-step throughput at a list of mesh shapes
(SURVEY §7 build-plan item 7's "scaling sweep over mesh sizes").

Runs the full device-resident train step (the production mesh path from
train/loop.py) at each requested ``data x model`` mesh shape and reports
steps/s, frames/s and per-chip efficiency vs the first (smallest) shape.
The global batch is scaled with the data axis (weak scaling, the regime a
DP pod runs in) unless --fixed-batch is given.

On real multi-chip hardware this measures ICI scaling; with --virtual-cpu N
it runs the identical program on an N-device virtual CPU platform — numbers
are then only good for validating the harness and the collective layout,
not for throughput claims (printed as a warning).

    python scripts/bench_scaling.py --meshes 1x1,2x1,4x1,8x1 --virtual-cpu 8 --small
    python scripts/bench_scaling.py --meshes 1x1 --steps 20   # 1 real chip
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))



def parse_meshes(spec):
    out = []
    for item in spec.split(","):
        d, m = item.lower().split("x")
        out.append((int(d), int(m)))
    return out


def measure(cfg, mesh, steps, warmup=3):
    import jax
    import jax.numpy as jnp

    from multimodal_rssm_tpu.data.buffer import build_buffer
    from multimodal_rssm_tpu.data.device_buffer import DeviceReplay
    from multimodal_rssm_tpu.models.world_model import WorldModel
    from multimodal_rssm_tpu.parallel import mesh as mesh_lib
    from multimodal_rssm_tpu.train import trainer as tr

    from _profiling_common import fill_synthetic_buffer

    D = fill_synthetic_buffer(build_buffer(cfg), cfg)

    model = WorldModel.from_config(cfg, dtype=tr.compute_dtype(cfg))
    optimizer = tr.build_optimizer(cfg)
    spec = tr.build_aug_spec(D)
    draws_src = tr.HostAugmentDraws(D, spec)
    key = jax.random.PRNGKey(0)
    B, L = int(cfg.train.batch_size), int(cfg.train.chunk_size)

    obs, act, rew, nt = D.sample(B, L)
    raw = ({k: jnp.asarray(v) for k, v in obs.items()},
           jnp.asarray(act), jnp.asarray(rew), jnp.asarray(nt))
    prep = tr.prepare_observations(raw[0], spec, draws_src.draw(),
                                   int(cfg.env.bit_depth), key)
    state = tr.init_train_state(model, cfg, optimizer, key,
                                (prep, raw[1], raw[2], raw[3]))
    if mesh is not None:
        state = mesh_lib.shard_state(
            state, mesh, mesh_lib.config_min_shard_width(cfg))

    dev = DeviceReplay(D, mesh=mesh)
    train_step, _ = tr.make_device_resident_steps(
        model, cfg, optimizer, spec, D.observation_names, mesh=mesh,
        row_shapes=dev.row_shapes)

    def run_step(state, k):
        return train_step(state, dev.arrays, dev.sample_indices(B, L),
                          draws_src.draw(), k)

    for _ in range(warmup):
        key, k = jax.random.split(key)
        state, metrics = run_step(state, k)
    float(jax.device_get(metrics["loss"]))

    t0 = time.perf_counter()
    for _ in range(steps):
        key, k = jax.random.split(key)
        state, metrics = run_step(state, k)
    loss = float(jax.device_get(metrics["loss"]))
    el = time.perf_counter() - t0
    return steps / el, loss


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--meshes", default="1x1",
                        help="comma list of DATAxMODEL mesh shapes")
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--batch-size", type=int, default=50,
                        help="per-data-shard batch (weak scaling)")
    parser.add_argument("--chunk-size", type=int, default=50)
    parser.add_argument("--fixed-batch", action="store_true",
                        help="keep the global batch at --batch-size "
                             "regardless of mesh size (strong scaling)")
    parser.add_argument("--small", action="store_true")
    parser.add_argument("--virtual-cpu", type=int, default=0, metavar="N",
                        help="force an N-device virtual CPU platform "
                             "(harness validation only)")
    parser.add_argument("--json", action="store_true",
                        help="emit one JSON line per mesh shape")
    args = parser.parse_args()

    if args.virtual_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.virtual_cpu)
        print(f"WARNING: virtual {args.virtual_cpu}-device CPU platform — "
              "numbers validate the harness, not throughput", file=sys.stderr)

    import jax

    from multimodal_rssm_tpu.core.config import compose
    from multimodal_rssm_tpu.core.runtime import enable_persistent_cache
    from multimodal_rssm_tpu.parallel import mesh as mesh_lib

    enable_persistent_cache()
    n_avail = len(jax.devices())
    results = []
    for n_data, n_model in parse_meshes(args.meshes):
        n_dev = n_data * n_model
        if n_dev > n_avail:
            print(f"{n_data}x{n_model}: skipped (needs {n_dev} devices, "
                  f"have {n_avail})", flush=True)
            continue
        B = args.batch_size if args.fixed_batch else args.batch_size * n_data
        overrides = [
            f"train.batch_size={B}",
            f"train.chunk_size={args.chunk_size}",
            "train.experience_size=20000",
        ]
        if args.small:
            overrides += [
                "rssm.belief_size=64", "rssm.state_size=16",
                "rssm.hidden_size=64", "rssm.embedding_size.image=64",
                "rssm.embedding_size.sound=32",
                "rssm.embedding_size.fusion=64",
                "rssm.embedding_size.other=16", "train.use_amp=False",
                "train.mesh.min_shard_width=1",
            ]
        cfg = compose(os.path.join(os.path.dirname(__file__), "..",
                                   "configs"), overrides=overrides)
        mesh = None
        if n_dev > 1:
            mesh = mesh_lib.create_mesh(
                n_data=n_data, n_model=n_model,
                devices=jax.devices()[:n_dev])
        sps, loss = measure(cfg, mesh, args.steps)
        frames = sps * B * args.chunk_size
        row = {"mesh": f"{n_data}x{n_model}", "devices": n_dev,
               "global_batch": B, "steps_per_sec": round(sps, 3),
               "frames_per_sec": round(frames, 1), "loss": round(loss, 2)}
        if results:
            base = results[0]
            row["efficiency_vs_first"] = round(
                (frames / n_dev) / (base["frames_per_sec"] / base["devices"]),
                3)
        results.append(row)
        if args.json:
            print(json.dumps(row), flush=True)
        else:
            eff = row.get("efficiency_vs_first")
            print(f"{row['mesh']:>5s}  B={B:<4d} {sps:7.3f} steps/s  "
                  f"{frames:10.0f} frames/s"
                  + (f"  per-chip eff {eff:.2f}" if eff is not None else ""),
                  flush=True)


if __name__ == "__main__":
    main()
