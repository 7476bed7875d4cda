"""Golden-value tests for the fusion math (ops/fusion.py) against
hand-computed NumPy and against the reference's torch implementation
semantics (utils/models/encoder.py:50-124)."""

import numpy as np
import jax.numpy as jnp
import pytest

from multimodal_rssm_tpu.ops import fusion


def np_poe(means, stds):
    """Reference poe (encoder.py:50-55): precision = 1/std (not 1/var)."""
    T = 1.0 / stds
    mu = (means * T).sum(0) / T.sum(0)
    return mu, 1.0 / T.sum(0)


def test_poe_matches_reference_formula(rng):
    means = rng.normal(size=(3, 4, 5)).astype(np.float32)
    stds = rng.uniform(0.1, 2.0, size=(3, 4, 5)).astype(np.float32)
    m, s = fusion.poe(jnp.asarray(means), jnp.asarray(stds))
    em, es = np_poe(means, stds)
    np.testing.assert_allclose(np.asarray(m), em, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s), es, rtol=1e-5, atol=1e-6)


def test_poe_two_equal_experts():
    # Two identical experts: mean unchanged, "std-precision" product halves
    # the std (reference convention, not variance-precision).
    means = jnp.ones((2, 1, 4)) * 3.0
    stds = jnp.ones((2, 1, 4)) * 0.5
    m, s = fusion.poe(means, stds)
    np.testing.assert_allclose(np.asarray(m), 3.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s), 0.25, rtol=1e-6)


def test_enumerate_subsets_order():
    # Matches itertools.combinations enumeration in calc_subset_states
    # (encoder.py:84-91): sizes 0..M, prior expert (0) always included.
    assert fusion.enumerate_subsets(2) == [(0,), (0, 1), (0, 2), (0, 1, 2)]
    assert fusion.enumerate_subsets(1) == [(0,), (0, 1)]
    assert len(fusion.enumerate_subsets(3)) == 8


def test_mopoe_partition():
    # floor(S/K) slices, last takes remainder (encoder.py:107-120).
    assert fusion.mopoe_partition(128, 4) == [(0, 32), (32, 64), (64, 96), (96, 128)]
    assert fusion.mopoe_partition(10, 4) == [(0, 2), (2, 4), (4, 6), (6, 10)]


def test_mopoe_posterior_golden(rng):
    K, B, S = 3, 2, 8  # prior + 2 modalities -> 4 subsets, slices of 2
    means = rng.normal(size=(K, B, S)).astype(np.float32)
    stds = rng.uniform(0.2, 1.5, size=(K, B, S)).astype(np.float32)
    m, s = fusion.mopoe_posterior(jnp.asarray(means), jnp.asarray(stds))

    subsets = [(0,), (0, 1), (0, 2), (0, 1, 2)]
    exp_m = np.empty((B, S), np.float32)
    exp_s = np.empty((B, S), np.float32)
    for k, sub in enumerate(subsets):
        lo, hi = (k * 2, k * 2 + 2) if k < 3 else (6, 8)
        sm, ss = np_poe(means[list(sub)], stds[list(sub)])
        exp_m[:, lo:hi] = sm[:, lo:hi]
        exp_s[:, lo:hi] = ss[:, lo:hi]
    np.testing.assert_allclose(np.asarray(m), exp_m, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s), exp_s, rtol=1e-5)


def test_fuse_dispatch(rng):
    means = jnp.asarray(rng.normal(size=(2, 3, 4)).astype(np.float32))
    stds = jnp.asarray(rng.uniform(0.1, 1.0, size=(2, 3, 4)).astype(np.float32))
    m_poe, _ = fusion.fuse("PoE", means, stds)
    m_nn, _ = fusion.fuse("NN", means, stds)  # NN falls through to PoE
    np.testing.assert_allclose(np.asarray(m_poe), np.asarray(m_nn))
    m_mopoe, _ = fusion.fuse("MoPoE", means, stds)
    assert m_mopoe.shape == (3, 4)


def test_poe_matches_torch_reference(rng):
    """Direct numerical check against the torch reference formula."""
    torch = pytest.importorskip("torch")
    means = rng.normal(size=(3, 4, 6)).astype(np.float32)
    stds = rng.uniform(0.1, 2.0, size=(3, 4, 6)).astype(np.float32)

    tm, ts = torch.tensor(means), torch.tensor(stds)
    T = 1.0 / ts
    ref_mu = torch.sum(tm * T, dim=0) / torch.sum(T, dim=0)
    ref_scale = 1.0 / torch.sum(T, dim=0)

    m, s = fusion.poe(jnp.asarray(means), jnp.asarray(stds))
    np.testing.assert_allclose(np.asarray(m), ref_mu.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s), ref_scale.numpy(), rtol=1e-5, atol=1e-6)
