"""Diagonal-Gaussian primitives.

The reference leans on ``torch.distributions.Normal`` for reparameterised
sampling, log-probs and KL (e.g. algos/MRSSM/base/algo.py:84-91,
utils/models/observation_model.py:22-26).  Here they are small pure jnp
functions so XLA can fuse them into the surrounding compute, and so the loss
math stays in float32 regardless of the bf16 compute policy.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def rsample(mean, std, eps):
    """Reparameterised sample given pre-drawn standard-normal noise.

    Noise is drawn once for a whole rollout outside the scan (one big PRNG
    call instead of 49 small ones) and threaded in as scan inputs.
    """
    return mean + std * eps


def log_prob(mean, std, value):
    """Elementwise diagonal-Gaussian log density (matches
    torch.distributions.Normal.log_prob)."""
    var = std * std
    return -((value - mean) ** 2) / (2 * var) - jnp.log(std) - _LOG_SQRT_2PI


def kl_normal(mean_q, std_q, mean_p, std_p):
    """Elementwise KL( N(mean_q, std_q) || N(mean_p, std_p) ).

    Matches torch.distributions.kl.kl_divergence for Normal/Normal.
    """
    var_ratio = (std_q / std_p) ** 2
    t1 = ((mean_q - mean_p) / std_p) ** 2
    return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))


def kl_standard_normal(mean_q, std_q):
    """KL against the global prior N(0, I) (reference keeps an explicit
    batch-shaped global prior, algos/MRSSM/base/algo.py:23-24; broadcasting
    removes its batch-size coupling bug)."""
    return kl_normal(mean_q, std_q, jnp.zeros_like(mean_q), jnp.ones_like(std_q))
