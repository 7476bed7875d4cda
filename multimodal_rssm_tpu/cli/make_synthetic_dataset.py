#!/usr/bin/env python
"""Generate a synthetic COBOTTA-schema dataset for benchmarks/smoke runs.

    python scripts/make_synthetic_dataset.py --out dataset/synthetic \
        --episodes 20 --length 200
"""

import argparse
import os

from multimodal_rssm_tpu.data.synthetic import write_synthetic_dataset  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", required=True)
    parser.add_argument("--episodes", type=int, default=10)
    parser.add_argument("--length", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--modalities", default="image_horizon,sound",
        help="comma-separated modality names",
    )
    args = parser.parse_args()

    shapes_all = {
        "image_horizon": [3, 64, 64], "image_horizon_128": [3, 128, 128],
        "image_horizon_256": [3, 256, 256], "sound": [128, 20],
        "pose_quat_v2": [3],
    }
    names = args.modalities.split(",")
    shapes = {n: shapes_all.get(n, [3]) for n in names}
    for d in ("train", "validation"):
        write_synthetic_dataset(
            os.path.join(args.out, d),
            args.episodes if d == "train" else max(1, args.episodes // 5),
            args.length, shapes, seed=args.seed + (0 if d == "train" else 10_000),
        )
    print(f"wrote synthetic dataset to {args.out}")


if __name__ == "__main__":
    main()
