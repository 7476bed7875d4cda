"""Pallas input-pipeline kernel: fused bit-depth normalise (interpret mode
on CPU; the same kernel runs compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_rssm_tpu.ops.image import normalize_image_deterministic
from jax.experimental.pallas import tpu as pltpu

from multimodal_rssm_tpu.ops.pallas_kernels import (
    normalize_image_pallas, supports_shape,
)


def _run(img, bit_depth, seed):
    with pltpu.force_tpu_interpret_mode():
        return np.asarray(normalize_image_pallas(
            jnp.asarray(img), bit_depth, jnp.asarray(seed, jnp.int32)))


def test_supports_shape():
    assert supports_shape((5, 2, 64, 64, 3))   # 122880 % 512 == 0
    assert not supports_shape((3, 7))


def test_normalize_pallas_matches_semantics(rng):
    img = rng.integers(0, 256, size=(2, 4, 64, 64, 3), dtype=np.uint8)
    out = _run(img, 5, [7])
    det = np.asarray(normalize_image_deterministic(jnp.asarray(img), 5))
    # output = quantised value + uniform dequant noise in [0, 1/32)
    noise = out - det
    assert noise.min() >= 0.0
    assert noise.max() < 1.0 / 32 + 1e-6
    assert out.min() >= -0.5
    # NOTE: the pallas interpreter stubs pltpu.prng_random_bits to zeros, so
    # the randomness itself is asserted on real TPU (scripts/verify_pallas.py
    # output recorded in DESIGN.md); here we check the deterministic part:
    np.testing.assert_allclose(out - noise, det, atol=1e-7)


def test_normalize_pallas_seed_determinism(rng):
    img = rng.integers(0, 256, size=(1, 2, 64, 64, 3), dtype=np.uint8)
    a = _run(img, 5, [3])
    b = _run(img, 5, [3])
    np.testing.assert_array_equal(a, b)
