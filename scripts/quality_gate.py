#!/usr/bin/env python
"""Quality regression gate: short fixed-seed train + deterministic eval
chain, FAILING when any metric leaves its committed window.

Why this exists (VERDICT r3 weak #5): imagination MSE / PSNR / soak losses
were reported in markdown each round but asserted nowhere, and the round-2
eval-program miscompile (train-scoped XLA vmem options leaking into the
validation executable -> every in-loop validation metric NaN) proved that
silent quality regressions are this project's real failure mode.  This
gate turns those reports into a machine check:

1. generate the fixed-seed synthetic COBOTTA dataset (cached per seed),
2. run a short training through the real user CLI
   (``scripts/train.py`` — config compose, data pipeline, jit train step,
   in-loop validation, checkpointing),
3. run the deterministic eval chain on the final checkpoint
   (``scripts/check_model.py`` — posterior estimation, reconstruction,
   open-loop imagination; the eval semantics of the reference's
   ``check_model.ipynb`` cells 55-58),
4. assert every metric inside the committed windows
   (``scripts/quality_windows.json``, keyed by platform).

The eval chain is deterministic (bit-identical imagination MSE across
runs on one platform — ROUND3 evidence); the short train is seeded, so
the windows can be tight.  Windows are calibrated per platform because
TPU bf16 matmuls and CPU f32 land measurably different loss floors.

Usage::

    python scripts/quality_gate.py                 # TPU (default platform)
    python scripts/quality_gate.py --platform cpu  # tiny-model CPU variant
    python scripts/quality_gate.py --calibrate     # print a windows block

Exit code 0 = inside all windows, 1 = regression (each violation printed).
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOWS_PATH = os.path.join(REPO, "scripts", "quality_windows.json")

# Tiny-model overrides for the CPU variant (full scale takes minutes/step
# on a 1-core host; the gate must stay a smoke-scale check there).
TINY = [
    "rssm.belief_size=64", "rssm.state_size=16", "rssm.hidden_size=64",
    "rssm.embedding_size.image=64", "rssm.embedding_size.sound=32",
    "rssm.embedding_size.fusion=64", "rssm.embedding_size.other=16",
    "train.use_amp=False",
]

# Gate config matrix (VERDICT r4 #8): the scaling configs BASELINE.md
# advertises (categorical latents, long chunks) must also keep *learning*,
# not just keep their steps/s.  Each entry: (extra overrides, windows-key
# suffix).  batch x chunk stay at the gate's smoke scale.
# entry: (extra overrides, windows-key suffix, episode length).  The
# chunk-200 row needs episodes longer than the chunk (the default gate
# dataset's 80-step validation episode cannot seed a 200-step chunk).
CONFIGS = {
    "default": ([], "", 80),
    "categorical": (["rssm.latent_dist=categorical"], "_categorical", 80),
    "chunk200": (["train.batch_size=2", "train.chunk_size=200"],
                 "_chunk200", 300),
}


def run(cmd, env=None):
    print("+", " ".join(cmd), flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    subprocess.run(cmd, check=True, env=e, cwd=REPO)


def build_dataset(root, seed, length=80):
    suffix = "" if length == 80 else f"_len{length}"
    ds = os.path.join(root, f"qgate_ds_seed{seed}{suffix}")
    if not os.path.isdir(os.path.join(ds, "train")):
        run([sys.executable, os.path.join(REPO, "scripts", "make_synthetic_dataset.py"),
             "--out", ds, "--episodes", "4", "--length", str(length),
             "--seed", str(seed)])
    return ds


def resolve_platform(explicit):
    """The platform the gated run will actually execute on.

    With no ``--platform`` the old code assumed TPU, so on a CPU-only host
    it launched a full-scale CPU train (hours) and gated it against
    TPU-calibrated windows (ADVICE r4).  Ask JAX in a subprocess instead
    (a subprocess so the probe doesn't initialise a backend in this
    process with different env than the gated child run).
    """
    if explicit:
        return explicit
    probe = subprocess.run(
        [sys.executable, "-c", "import jax; print(jax.default_backend())"],
        capture_output=True, text=True)
    backend = probe.stdout.strip().splitlines()[-1] if probe.stdout.strip() else ""
    return "tpu" if backend == "tpu" else "cpu"


def train_and_eval(args):
    ds = build_dataset(args.workdir, args.seed, CONFIGS[args.config][2])
    run_root = os.path.join(args.workdir, "qgate_run")
    overrides = [
        f"train.train_data_path=[{ds}/train]",
        f"train.validation_data_path=[{ds}/validation]",
        "train.batch_size=8", "train.chunk_size=20",
        f"train.train_iteration={args.iters}",
        "train.validation_interval=50",
        f"train.checkpoint_interval={args.iters}",
        f"main.seed={args.seed}",
        "main.experiment_name=qgate",
    ]
    overrides += CONFIGS[args.config][0]
    if args.platform == "cpu":
        overrides += TINY
    cmd = [sys.executable, os.path.join(REPO, "scripts", "train.py"),
           *overrides, "--cwd", run_root]
    # only CPU is forced explicitly: the TPU plugin may register under a
    # platform alias (this container's tunneled backend is "axon"), so
    # "tpu" is what auto-selection already picks — forcing the literal
    # name breaks init
    if args.platform == "cpu":
        cmd += ["--platform", args.platform]
    run(cmd)

    # newest run dir under results/qgate/<date>/run_*
    exp = os.path.join(run_root, "results", "qgate")
    runs = [os.path.join(d, r)
            for d in (os.path.join(exp, x) for x in os.listdir(exp))
            for r in os.listdir(d)]
    run_dir = max(runs, key=os.path.getmtime)

    cmd = [sys.executable, os.path.join(REPO, "scripts", "check_model.py"),
           "--run", run_dir, "--itr", str(args.iters),
           "--t-start", "10", "--horizon", "10", "--cwd", args.workdir]
    env = {"JAX_PLATFORMS": "cpu"} if args.platform == "cpu" else None
    run(cmd, env=env)
    return run_dir


def collect_metrics(run_dir):
    """Flatten the gate's observables from the run artifacts."""
    out = {}
    train_loss, val_rows = [], []
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "loss/train" in rec:
                train_loss.append((rec["step"], rec["loss/train"]))
            if "loss/validation" in rec:
                val_rows.append(rec["loss/validation"])
    import math

    # empty train/val rows (e.g. --iters below validation_interval, or a
    # truncated metrics.jsonl) must surface as a gate failure ("metric
    # missing"), not an IndexError traceback (ADVICE r4)
    if train_loss:
        out["train_loss_first"] = train_loss[0][1]
        out["train_loss_final"] = train_loss[-1][1]
    if val_rows:
        out["val_loss_final"] = val_rows[-1]
        out["val_rows_finite"] = float(all(math.isfinite(r) for r in val_rows))

    analysis = os.path.join(run_dir, "analysis", "imagination_mse.json")
    if not os.path.exists(analysis):
        return out
    with open(analysis) as f:
        imag = json.load(f)
    for mod, v in imag["mse"].items():
        out[f"imagination_mse_{mod}"] = v
    for mod, qm in imag.get("metrics", {}).items():
        for name, v in qm.items():
            if name != "mse":
                out[f"imagination_{name}_{mod}"] = v
    return out


def check_windows(metrics, windows):
    failures = []
    for name, bounds in windows.items():
        if name.startswith("_"):  # calibration metadata, not a window
            continue
        lo, hi = bounds
        v = metrics.get(name)
        if v is None:
            failures.append(f"{name}: metric missing from run artifacts")
        elif not (v == v) or not (lo <= v <= hi):
            failures.append(f"{name}: {v!r} outside [{lo}, {hi}]")
    return failures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="default: the session platform (TPU when attached)")
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default="/tmp/mrssm_qgate")
    ap.add_argument("--calibrate", action="store_true",
                    help="print a quality_windows.json block instead of gating")
    ap.add_argument("--config", default="default", choices=sorted(CONFIGS),
                    help="gate config matrix entry: 'categorical' = "
                         "rssm.latent_dist=categorical (32x32), 'chunk200' "
                         "= batch 2 x chunk 200 — the scaling configs "
                         "BASELINE.md advertises must keep learning too")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    args.platform = resolve_platform(args.platform)
    print(f"# gate platform: {args.platform}, config: {args.config}")
    run_dir = train_and_eval(args)
    metrics = collect_metrics(run_dir)
    print(json.dumps(metrics, indent=2))

    key = args.platform + CONFIGS[args.config][1]
    if args.calibrate:
        # +-40% band around the measured value for losses/MSE, fixed bands
        # for bounded metrics; hand-tighten before committing.
        block = {}
        for name, v in metrics.items():
            if name == "val_rows_finite":
                block[name] = [1.0, 1.0]
            elif name.startswith("imagination_ssim"):
                block[name] = [round(v - 0.1, 4), 1.0]
            elif name.startswith("imagination_psnr"):
                block[name] = [round(v - 3.0, 2), round(v + 6.0, 2)]
            else:
                block[name] = [round(v * 0.6, 6), round(v * 1.4, 6)]
        print(f"\n--calibrate: proposed windows for platform '{key}':")
        print(json.dumps({key: block}, indent=2))
        return 0

    with open(WINDOWS_PATH) as f:
        windows = json.load(f)
    if key not in windows:
        print(f"no committed windows for platform '{key}' in {WINDOWS_PATH}; "
              f"run with --calibrate first", file=sys.stderr)
        return 2
    failures = check_windows(metrics, windows[key])
    if failures:
        print("\nQUALITY GATE FAILED:", file=sys.stderr)
        for f_ in failures:
            print("  -", f_, file=sys.stderr)
        return 1
    print(f"\nquality gate OK: {len(windows[key])} metrics inside windows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
