#!/usr/bin/env python
"""Measure the PyTorch reference's training steps/sec on this host.

The reference publishes no benchmark numbers (BASELINE.md), so this harness
runs the actual reference implementation (read-only checkout at
/root/reference) at its default experiment scale on synthetic
COBOTTA-schema episodes and records steps/sec into
``bench_baseline_torch.json`` — the denominator for bench.py's
``vs_baseline``.

Notes recorded alongside the number: the hardware (this image has CPU-only
torch), config (batch x chunk, model sizes), and AMP setting (disabled on
CPU).
"""

import argparse
import json
import os
import sys
import tempfile
import time
import types

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)
sys.path.insert(0, REFERENCE)

# the reference imports wandb/omegaconf at module scope; stub them (the
# image ships neither, and logging is disabled for benchmarking)
wandb_stub = types.ModuleType("wandb")
wandb_stub.log = lambda *a, **k: None
wandb_stub.watch = lambda *a, **k: None
wandb_stub.init = lambda *a, **k: None
wandb_stub.finish = lambda *a, **k: None
sys.modules.setdefault("wandb", wandb_stub)
omegaconf_stub = types.ModuleType("omegaconf")
omegaconf_stub.ListConfig = list
omegaconf_stub.DictConfig = dict
sys.modules.setdefault("omegaconf", omegaconf_stub)

from multimodal_rssm_tpu.core.config import compose  # noqa: E402
from multimodal_rssm_tpu.data.synthetic import write_synthetic_dataset  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--warmup", type=int, default=1)
    parser.add_argument("--batch-size", type=int, default=50)
    parser.add_argument("--chunk-size", type=int, default=50)
    parser.add_argument("--episodes", type=int, default=4)
    parser.add_argument("--episode-length", type=int, default=120)
    parser.add_argument("--out", default=os.path.join(REPO, "bench_baseline_torch.json"))
    args = parser.parse_args()

    import torch

    cfg = compose(os.path.join(REPO, "configs"), overrides=[
        f"train.batch_size={args.batch_size}",
        f"train.chunk_size={args.chunk_size}",
        "train.experience_size=20000",
        "train.use_amp=False",   # CPU torch: no AMP
        "main.wandb=False",
        "main.device=cpu",
    ])

    shapes = {
        "image_horizon": cfg.env.observation_shapes["image_horizon"],
        "sound": cfg.env.observation_shapes["sound"],
    }
    data_dir = tempfile.mkdtemp()
    write_synthetic_dataset(data_dir, args.episodes, args.episode_length,
                            shapes, str(cfg.env.action_name),
                            int(cfg.env.action_size))
    # reference stores images CHW; our generator writes HWC uint8 — the
    # reference's preprocess_data transposes when shape[1] > shape[3],
    # which holds for 64x64x3, so files load unchanged.

    # build the reference buffer directly (its train.py pulls in hydra via
    # utils.logger; the buffer + model are what we're timing)
    from utils.replay_buffer.memory import ExperienceReplay_Multimodal
    from algos.MRSSM.MRSSM.algo import build_RSSM

    device = torch.device("cpu")
    observation_names = list(set(
        list(cfg.rssm.observation_names_enc) + list(cfg.rssm.observation_names_rec)
    ))
    D = ExperienceReplay_Multimodal(
        size=cfg.train.experience_size,
        observation_names=observation_names,
        observation_shapes=cfg.env.observation_shapes,
        n_crop=cfg.train.augmentation.n_crop,
        dh_base=cfg.train.augmentation.dh_base,
        dw_base=cfg.train.augmentation.dw_base,
        noise_scales=cfg.train.augmentation.noise_scales,
        pca_scales=cfg.train.augmentation.pca_scales,
        action_name=cfg.env.action_name,
        action_size=cfg.env.action_size,
        bit_depth=cfg.env.bit_depth,
        device=device,
    )
    D.load_dataset(data_dir)

    model = build_RSSM(cfg, device)

    for _ in range(args.warmup):
        model.optimize(D)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        model.optimize(D)
    elapsed = time.perf_counter() - t0
    steps_per_sec = args.steps / elapsed

    result = {
        "steps_per_sec": steps_per_sec,
        "seconds_per_step": elapsed / args.steps,
        "hardware": "cpu (torch {} — no GPU in this image)".format(torch.__version__),
        "config": {
            "batch_size": args.batch_size, "chunk_size": args.chunk_size,
            "belief_size": int(cfg.rssm.belief_size),
            "state_size": int(cfg.rssm.state_size),
            "fusion_method": str(cfg.rssm.multimodal_params.fusion_method),
            "use_amp": False,
        },
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
