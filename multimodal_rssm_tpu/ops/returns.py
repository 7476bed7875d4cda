"""Robust return/value transforms — the DreamerV3 toolkit.

No reference counterpart (the reference's value head is a scale-1 Gaussian,
utils/models/policy.py:36-43, and its training path never trains it).
These are the techniques DreamerV3 (Hafner et al. 2023, "Mastering Diverse
Domains through World Models") introduced to make actor-critic learning
robust across reward scales, used by train/behavior.py behind
``behavior.value_head=twohot_symlog`` and ``behavior.return_norm=true``:

- ``symlog``/``symexp``: a signed log squashing so targets of wildly
  different magnitudes land in a bounded range (DreamerV3 eq. 1);
- two-hot discrete regression: a scalar target becomes a weighted two-bin
  categorical over fixed symlog-spaced bins; the critic learns by
  cross-entropy, decoupling gradient scale from target scale (eq. 9-10);
- percentile return normalization: scale actor advantages by an EMA of the
  5th-95th percentile return range, clipped below 1 so small-return noise
  is never amplified (eq. 11).

All pure float32 jnp functions — everything fuses into the behavior step.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def symlog(x: jnp.ndarray) -> jnp.ndarray:
    """sign(x) * log(1 + |x|)."""
    return jnp.sign(x) * jnp.log1p(jnp.abs(x))


def symexp(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of symlog: sign(x) * (exp(|x|) - 1)."""
    return jnp.sign(x) * jnp.expm1(jnp.abs(x))


def bin_centers(num_bins: int, low: float = -20.0, high: float = 20.0
                ) -> jnp.ndarray:
    """Fixed critic bins: linear in symlog space (DreamerV3 uses 255 bins
    over [-20, 20], covering |values| up to ~e^20 after symexp)."""
    return jnp.linspace(low, high, num_bins, dtype=jnp.float32)


def twohot(x: jnp.ndarray, bins: jnp.ndarray) -> jnp.ndarray:
    """Two-hot encoding of ``x`` [...] onto ``bins`` [K] -> [..., K].

    The two bins bracketing x get weights proportional to proximity (sum to
    1); values outside the bin range clip to the end bins.  Exactly
    invertible by ``twohot_decode`` for in-range x.
    """
    K = bins.shape[0]
    x = jnp.clip(x, bins[0], bins[-1])
    idx_hi = jnp.clip(jnp.searchsorted(bins, x, side="left"), 0, K - 1)
    idx_lo = jnp.clip(idx_hi - 1, 0, K - 1)
    width = bins[idx_hi] - bins[idx_lo]
    w_hi = jnp.where(width > 0, (x - bins[idx_lo]) / jnp.where(width > 0, width, 1.0), 1.0)
    w_hi = jnp.clip(w_hi, 0.0, 1.0)
    onehot_lo = jax.nn.one_hot(idx_lo, K, dtype=jnp.float32)
    onehot_hi = jax.nn.one_hot(idx_hi, K, dtype=jnp.float32)
    return onehot_lo * (1.0 - w_hi)[..., None] + onehot_hi * w_hi[..., None]


def twohot_decode(probs: jnp.ndarray, bins: jnp.ndarray) -> jnp.ndarray:
    """Expected bin value: [..., K] -> [...]."""
    return jnp.sum(probs * bins, axis=-1)


def update_return_scale(prev_scale: jnp.ndarray, returns: jnp.ndarray,
                        decay: float = 0.99, percentile: float = 5.0,
                        step=None) -> jnp.ndarray:
    """EMA of the (100-p)th minus p-th percentile of the imagined returns
    (DreamerV3's range statistic S).  ``returns`` may be any shape; the
    percentiles are over all elements.  Gradients are stopped — this is a
    running statistic, not a learned quantity.

    ``step`` (the behavior optimiser step, traced or concrete) removes the
    EMA warmup bias (ADVICE r3): the carry is seeded at 1.0, so with decay
    0.99 an environment whose true spread is far from 1 would otherwise
    need ~300 updates before the normalizer is right — under-normalised
    early actor updates act like a larger learning rate.  At step 0 the
    statistic jumps straight to the first batch's spread (DreamerV3
    debiases its moment EMA for exactly this warmup); afterwards it is the
    standard EMA.  ``step=None`` keeps the raw-EMA behaviour.
    """
    r = jax.lax.stop_gradient(returns.astype(jnp.float32).ravel())
    spread = jnp.percentile(r, 100.0 - percentile) - jnp.percentile(r, percentile)
    ema = decay * prev_scale + (1.0 - decay) * spread
    if step is None:
        return ema
    return jnp.where(jnp.asarray(step) == 0, spread, ema)


def normalize_returns(returns: jnp.ndarray, scale: jnp.ndarray
                      ) -> jnp.ndarray:
    """returns / max(1, S): large return ranges are scaled down to ~[0, 1];
    ranges below 1 are left untouched (dividing by max(1, S), never by a
    small S — the clip that makes the normalizer safe on sparse rewards)."""
    return returns / jnp.maximum(1.0, jax.lax.stop_gradient(scale))
