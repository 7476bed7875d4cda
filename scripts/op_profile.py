#!/usr/bin/env python
"""Op-level attribution of the training step: capture a jax.profiler trace
on the current backend and print the top HLO ops by self time.

    python scripts/op_profile.py [--batch-size 50 --chunk-size 50]
        [--override rssm.remat=false] [--top 30]

Complements scripts/profile_step.py (phase-level timing) with per-fusion
attribution so kernel work targets the real hotspots.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=50)
    parser.add_argument("--chunk-size", type=int, default=50)
    parser.add_argument("--top", type=int, default=30)
    parser.add_argument("--steps", type=int, default=5)
    parser.add_argument("--override", action="append", default=[])
    parser.add_argument("--trace-dir", default="/tmp/rssm_trace")
    args = parser.parse_args()

    import jax

    from _profiling_common import build_step_setup, enable_compile_cache
    from multimodal_rssm_tpu.train import trainer as tr

    enable_compile_cache()
    (cfg, model, optimizer, spec, draws, raw, prep, state,
     key) = build_step_setup(args.batch_size, args.chunk_size, args.override)
    train_step, _ = tr.make_train_step(model, cfg, optimizer, spec)

    for _ in range(3):
        state, m = train_step(state, raw, draws, key)
    float(jax.device_get(m["loss"]))

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.steps):
            state, m = train_step(state, raw, draws, key)
        float(jax.device_get(m["loss"]))

    # ---- parse the trace: sum durations per op name on device lines ----
    paths = glob.glob(os.path.join(
        args.trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace found under", args.trace_dir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # device PIDs: process_name metadata containing "TPU" / "/device:"
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            n = e.get("args", {}).get("name", "")
            if "TPU" in n or "/device:" in n or "Device" in n:
                device_pids.add(e["pid"])

    tot = collections.Counter()
    cnt = collections.Counter()
    cat = collections.Counter()
    long_names = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        a = e.get("args", {}) or {}
        # leaf HLO events carry hlo_category; container/step events don't —
        # skipping them avoids double counting (jit_train_step wraps all)
        if "hlo_category" not in a:
            continue
        dur = e.get("dur", 0)  # us
        name = e.get("name", "?")
        tot[name] += dur
        cnt[name] += 1
        cat[a["hlo_category"]] += dur
        if name not in long_names:
            ln = a.get("long_name", "")
            long_names[name] = ln.split(" fusion(")[0][:120] if ln else ""
        total += dur

    print(f"trace: {path}")
    print(f"total HLO self time: {total/1e3:.1f} ms over {args.steps} steps "
          f"-> {total/1e3/args.steps:.1f} ms/step")
    print("\nphase attribution (hlo_category):")
    print(f"{'ms/step':>10s} {'%':>6s}  category")
    for name, us in cat.most_common():
        print(f"{us/1e3/args.steps:10.3f} {100*us/total:6.2f}  {name}")
    print(f"\n{'self_ms/step':>12s} {'%':>6s} {'count':>6s}  op")
    for name, us in tot.most_common(args.top):
        print(f"{us/1e3/args.steps:12.3f} {100*us/total:6.2f} {cnt[name]:6d}  "
              f"{name}  {long_names.get(name, '')[:100]}")


if __name__ == "__main__":
    main()
