"""Raw-recording -> training-episode builder.

Library replacement for the reference's dataset-construction notebook
(dataset/COBOTTA/SingleHoleDrilling/pick_data.ipynb): converts raw
per-episode recordings (high-resolution camera frames, sound spectrograms,
raw poses) into the training ``.npy`` schema —

- multi-scale image resize (256 / 128 / 64) (notebook cell 5);
- adaptive-threshold binary image channels (``*_bin``) (cell 4);
- derived pose/action channels via data/pose.preprocess_pose (cell 5);
- ``done`` termination flags and train/validation splitting.

Pure NumPy + PIL (host-side, offline).
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, Mapping, Optional, Sequence

import numpy as np

from multimodal_rssm_tpu.data.pose import preprocess_pose


def resize_images(images: np.ndarray, size: int) -> np.ndarray:
    """Resize a [T, H, W, C] uint8 sequence to [T, size, size, C]."""
    from PIL import Image

    out = np.empty((images.shape[0], size, size, images.shape[-1]), np.uint8)
    for t, frame in enumerate(images):
        img = Image.fromarray(frame if frame.shape[-1] != 1 else frame[..., 0])
        resized = np.asarray(img.resize((size, size), Image.BILINEAR))
        out[t] = resized[..., None] if resized.ndim == 2 else resized
    return out


def adaptive_threshold(
    images: np.ndarray, block_size: int = 11, offset: float = 2.0
) -> np.ndarray:
    """Per-frame adaptive mean thresholding -> binary uint8 {0, 255}
    channel (the notebook uses cv2.adaptiveThreshold; this is the same
    local-mean variant via a uniform filter)."""
    from scipy.ndimage import uniform_filter

    gray = images.astype(np.float32)
    if gray.shape[-1] == 3:
        gray = gray @ np.asarray([0.299, 0.587, 0.114], np.float32)
    else:
        gray = gray[..., 0]
    out = np.empty((*gray.shape, 1), np.uint8)
    for t in range(gray.shape[0]):
        local_mean = uniform_filter(gray[t], size=block_size)
        out[t, ..., 0] = ((gray[t] > local_mean - offset) * 255).astype(np.uint8)
    return out


def build_episode(
    raw: Mapping[str, np.ndarray],
    image_key: str = "image",
    image_sizes: Sequence[int] = (64, 128, 256),
    binary: bool = False,
    camera_prefix: str = "image_horizon",
) -> Dict[str, np.ndarray]:
    """One raw recording -> training episode dict.

    ``raw`` must contain an image sequence (HWC uint8), optionally
    ``sound`` [T, 128, 20], ``pose_quat`` [T, >=3], ``reward``, ``done``.
    """
    episode: Dict[str, np.ndarray] = {}
    images = np.asarray(raw[image_key])
    if images.dtype != np.uint8:
        images = np.clip(images, 0, 255).astype(np.uint8)
    T = images.shape[0]

    for size in image_sizes:
        resized = resize_images(images, size)
        key = camera_prefix if size == 64 else f"{camera_prefix}_{size}"
        episode[key] = resized
        if size == 64:
            episode[f"{camera_prefix}_64"] = resized
        if binary:
            episode[f"{camera_prefix}_{size}_bin"] = adaptive_threshold(resized)

    if "sound" in raw:
        episode["sound"] = np.asarray(raw["sound"], np.float32)

    pose_data = {k: np.asarray(v, np.float32) for k, v in raw.items()
                 if k.startswith("pose") or k == "servo_value"}
    if pose_data:
        episode.update(preprocess_pose(pose_data))

    episode["reward"] = np.asarray(
        raw.get("reward", np.zeros(T)), np.float32
    )
    done = np.asarray(raw.get("done", np.zeros(T)), np.float32).copy()
    done[-1] = 1.0
    episode["done"] = done
    return episode


def build_dataset(
    raw_episodes: Iterable[Mapping[str, np.ndarray]],
    out_dir: str,
    validation_fraction: float = 0.2,
    **episode_kwargs,
) -> None:
    """Raw recordings -> ``{out_dir}/{train,validation}/episode_*.npy``."""
    episodes = [build_episode(r, **episode_kwargs) for r in raw_episodes]
    n_val = max(1, int(len(episodes) * validation_fraction)) if len(episodes) > 1 else 0
    splits = {"train": episodes[: len(episodes) - n_val],
              "validation": episodes[len(episodes) - n_val :]}
    for split, eps in splits.items():
        d = os.path.join(out_dir, split)
        os.makedirs(d, exist_ok=True)
        for i, ep in enumerate(eps):
            np.save(os.path.join(d, f"episode_{i:04d}.npy"), ep,
                    allow_pickle=True)
