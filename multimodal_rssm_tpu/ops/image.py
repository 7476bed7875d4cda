"""Bit-depth image normalisation (PlaNet preprocessing), device-side.

Replicates reference utils/processing/image_processing.py:5-16: quantise
uint8 pixels to ``bit_depth`` bits, map to [-0.5, 0.5], and add uniform
dequantisation noise; plus the inverse mapping back to uint8.  Runs
jit-compiled on device as part of the input pipeline (the reference does this
per-batch on GPU with torch.jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def normalize_image(observation: jnp.ndarray, bit_depth: int, key) -> jnp.ndarray:
    """float [0, 255] -> quantised float [-0.5, 0.5] with dequant noise.

    ``key`` supplies the uniform dequantisation noise (the reference uses
    ``torch.rand_like``, image_processing.py:10).
    """
    observation = observation.astype(jnp.float32)
    obs = jnp.floor(observation / 2 ** (8 - bit_depth)) / 2**bit_depth - 0.5
    noise = jax.random.uniform(key, obs.shape, dtype=obs.dtype) / 2**bit_depth
    return obs + noise


def normalize_image_deterministic(observation: jnp.ndarray, bit_depth: int) -> jnp.ndarray:
    """Normalisation without dequant noise (for deterministic eval paths)."""
    observation = observation.astype(jnp.float32)
    return jnp.floor(observation / 2 ** (8 - bit_depth)) / 2**bit_depth - 0.5


def reverse_normalized_image(observation: np.ndarray, bit_depth: int = 5) -> np.ndarray:
    """float [-0.5, 0.5] -> uint8 [0, 255] (host-side; reference
    image_processing.py:15-16). Used at dataset-ingest time."""
    arr = np.floor((np.asarray(observation) + 0.5) * 2**bit_depth) * 2 ** (8 - bit_depth)
    return np.clip(arr, 0, 2**8 - 1).astype(np.uint8)


def reverse_normalized_image_jnp(observation: jnp.ndarray, bit_depth: int = 5) -> jnp.ndarray:
    """Device-side inverse normalisation (for visualising reconstructions)."""
    arr = jnp.floor((observation + 0.5) * 2**bit_depth) * 2 ** (8 - bit_depth)
    return jnp.clip(arr, 0, 255).astype(jnp.uint8)
