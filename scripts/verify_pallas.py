#!/usr/bin/env python
"""Run the pallas input-pipeline kernel on the real TPU and report the
dequantisation-noise statistics (the CPU interpreter stubs the on-core
PRNG, so randomness can only be verified on hardware)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax.numpy as jnp

from multimodal_rssm_tpu.ops.image import normalize_image_deterministic
from multimodal_rssm_tpu.ops.pallas_kernels import normalize_image_pallas

rng = np.random.default_rng(0)
img = rng.integers(0, 256, size=(4, 8, 64, 64, 3), dtype=np.uint8)
out = np.asarray(normalize_image_pallas(jnp.asarray(img), 5, jnp.asarray([7], jnp.int32)))
det = np.asarray(normalize_image_deterministic(jnp.asarray(img), 5))
noise = out - det
print(f"noise min {noise.min():.5f} max {noise.max():.5f} "
      f"mean {noise.mean():.5f} (expect ~{1/64:.5f}) std {noise.std():.5f} "
      f"(expect ~{(1/32)/np.sqrt(12):.5f})")
a = np.asarray(normalize_image_pallas(jnp.asarray(img), 5, jnp.asarray([7], jnp.int32)))
b = np.asarray(normalize_image_pallas(jnp.asarray(img), 5, jnp.asarray([8], jnp.int32)))
print("same-seed deterministic:", np.array_equal(out, a), "| diff-seed differs:", bool(np.any(a != b)))
