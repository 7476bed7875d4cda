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


def test_prepare_observations_pallas_dispatch(rng):
    """The train-step input pipeline (trainer.prepare_observations) uses the
    fused kernel when pallas_normalize is on and the shape qualifies, and
    the result's deterministic (quantised) part matches the jax.random
    path exactly (the dequant noise differs only in its PRNG stream)."""
    from multimodal_rssm_tpu.train import trainer as tr

    img = rng.integers(0, 256, size=(2, 4, 64, 64, 3), dtype=np.uint8)
    spec = tr.AugSpec(modalities=(
        ("image_horizon", tr.ModalityAugSpec(
            out_size=(64, 64), needs_crop=False, noise=False, pca=False,
            normalize=True)),
    ))
    obs = {"image_horizon": jnp.asarray(img)}
    key = jax.random.PRNGKey(0)
    with pltpu.force_tpu_interpret_mode():
        out_pallas = tr.prepare_observations(
            obs, spec, {"image_horizon": {}}, 5, key, pallas_normalize=True)
    out_jax = tr.prepare_observations(
        obs, spec, {"image_horizon": {}}, 5, key, pallas_normalize=False)
    det = np.asarray(normalize_image_deterministic(jnp.asarray(img), 5))
    for out in (out_pallas, out_jax):
        noise = np.asarray(out["image_horizon"]) - det
        assert noise.min() >= 0.0 and noise.max() < 1.0 / 32 + 1e-6


def test_pallas_normalize_enabled_resolution():
    from multimodal_rssm_tpu.core.config import ConfigDict
    from multimodal_rssm_tpu.train import trainer as tr

    mk = lambda v: ConfigDict({"train": {"pallas_normalize": v}})
    assert tr.pallas_normalize_enabled(mk(True)) is True
    assert tr.pallas_normalize_enabled(mk(False)) is False
    # auto = TPU only; tests run on the CPU backend
    assert tr.pallas_normalize_enabled(mk("auto")) is False
    assert tr.pallas_normalize_enabled(ConfigDict({"train": {}})) is False
    with pytest.raises(ValueError):
        tr.pallas_normalize_enabled(mk("sometimes"))
