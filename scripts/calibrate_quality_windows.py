#!/usr/bin/env python
"""Multi-seed, multi-config calibration of scripts/quality_windows.json
(VERDICT r4 #6: the committed windows were single-seed with ±40% bands and
an SSIM window spanning the whole range — decoration, not a gate).

Runs the quality-gate train+eval chain (scripts/quality_gate.py machinery)
for every (config, seed) pair, then derives windows that (a) contain every
calibration seed with margin and (b) are tight enough to catch the
builder's own sabotage experiments (ROUND4 §2: the uncentered-normalize
bug moved train_loss_first 2.3x below band and SSIM to 0.65 — both must
stay excluded).  Per-seed values are recorded under ``_calibration`` so
the bands are auditable.

Band rules (from the seed min/max):
  losses / MSE:            [0.65 * min, 1.5 * max]
  imagination_psnr_*:      [min - 3, max + 6]
  imagination_ssim_*:      [min - 0.1, max + 0.15]   (a REAL upper bound)
  val_rows_finite:         [1, 1]

Usage (TPU, ~10 min per cell after the first compile)::

    python scripts/calibrate_quality_windows.py --seeds 0 1 2 \
        --configs default categorical chunk200 --write
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import quality_gate as qg  # noqa: E402


def derive_windows(per_seed):
    """per_seed: {seed: {metric: value}} -> {metric: [lo, hi]} +
    _calibration record."""
    metrics = sorted({m for vals in per_seed.values() for m in vals})
    block = {}
    for name in metrics:
        vals = [per_seed[s][name] for s in per_seed if name in per_seed[s]]
        lo_v, hi_v = min(vals), max(vals)
        if name == "val_rows_finite":
            block[name] = [1.0, 1.0]
        elif name.startswith("imagination_ssim"):
            block[name] = [round(lo_v - 0.1, 4), round(hi_v + 0.15, 4)]
        elif name.startswith("imagination_psnr"):
            block[name] = [round(lo_v - 3.0, 2), round(hi_v + 6.0, 2)]
        else:
            block[name] = [round(lo_v * 0.65, 6), round(hi_v * 1.5, 6)]
    block["_calibration"] = {
        "seeds": sorted(per_seed),
        "values": {name: {str(s): per_seed[s].get(name)
                          for s in sorted(per_seed)}
                   for name in metrics},
    }
    return block


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--configs", nargs="+", default=["default"],
                    choices=sorted(qg.CONFIGS))
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--workdir", default="/tmp/mrssm_qgate")
    ap.add_argument("--write", action="store_true",
                    help="merge the derived blocks into quality_windows.json")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    platform = qg.resolve_platform(args.platform)
    print(f"# calibration platform: {platform}")

    out = {}
    for config in args.configs:
        per_seed = {}
        for seed in args.seeds:
            ns = argparse.Namespace(
                platform=platform, iters=args.iters, seed=seed,
                workdir=args.workdir, config=config)
            run_dir = qg.train_and_eval(ns)
            per_seed[seed] = qg.collect_metrics(run_dir)
            print(f"# {config} seed {seed}: "
                  f"{json.dumps(per_seed[seed])}", flush=True)
        key = platform + qg.CONFIGS[config][1]
        out[key] = derive_windows(per_seed)

    print(json.dumps(out, indent=2))
    if args.write:
        windows = {}
        if os.path.exists(qg.WINDOWS_PATH):
            with open(qg.WINDOWS_PATH) as f:
                windows = json.load(f)
        windows.update(out)
        with open(qg.WINDOWS_PATH, "w") as f:
            json.dump(windows, f, indent=2)
            f.write("\n")
        print(f"# wrote {qg.WINDOWS_PATH}")


if __name__ == "__main__":
    main()
