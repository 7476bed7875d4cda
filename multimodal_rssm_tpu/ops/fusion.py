"""Multimodal posterior fusion as pure functions.

The reference implements three fusion strategies over per-modality Gaussian
"experts" (utils/models/encoder.py:50-124):

- ``poe``: precision-weighted product of Gaussian experts;
- ``calc_subset_states``: PoE over every subset of modality experts, each
  subset always including the learned "prior expert" p(s|h);
- ``get_mopoe_state``: Mixture-of-Products-of-Experts realised by
  *partitioning the latent dimension* equally across the 2^M subset
  posteriors and concatenating their slices (stratified sampling across
  mixture components).

Here experts are a single stacked array ``mean/std: [K, ..., S]`` with a
fixed, static expert ordering (index 0 is always the prior expert, the rest
follow the configured modality order).  Subset enumeration and the MoPoE
latent partition are computed at trace time from the static expert count, so
everything stays shape-static under jit.

Note on the reference's variance convention: the reference's ``poe`` computes
precision as ``1/scale`` where ``scale`` is a *standard deviation* and
returns ``pd_scale = 1/sum(1/scale)`` which it then uses as a standard
deviation again (utils/models/encoder.py:50-55).  That is a product of
experts in "std-precision" rather than variance-precision space.  We
replicate it exactly (parity matters more than textbook form) — see
``poe``.
"""

from __future__ import annotations

import itertools
from typing import List, Sequence, Tuple

import jax.numpy as jnp


def poe(means: jnp.ndarray, stds: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Product of Gaussian experts over the leading (expert) axis.

    Replicates reference ``poe`` (utils/models/encoder.py:50-55) exactly,
    including its convention of treating 1/std (not 1/var) as the precision
    weight:  mean = sum(mu_i / std_i) / sum(1 / std_i),  std = 1 / sum(1/std_i).
    """
    precision = 1.0 / stds
    denom = jnp.sum(precision, axis=0)
    mean = jnp.sum(means * precision, axis=0) / denom
    std = 1.0 / denom
    return mean, std


def enumerate_subsets(num_modalities: int) -> List[Tuple[int, ...]]:
    """Static subset enumeration mirroring reference ``calc_subset_states``
    (utils/models/encoder.py:73-97): every combination of the modality
    experts (sizes 0..M, in itertools.combinations order), with the prior
    expert (index 0) prepended to each.

    Returns tuples of indices into the stacked expert axis, e.g. for M=2:
    ``[(0,), (0,1), (0,2), (0,1,2)]``.
    """
    modality_ids = list(range(1, num_modalities + 1))
    subsets: List[Tuple[int, ...]] = []
    for n in range(len(modality_ids) + 1):
        for combo in itertools.combinations(modality_ids, n):
            subsets.append((0, *combo))
    return subsets


def subset_poe_states(
    expert_means: jnp.ndarray, expert_stds: jnp.ndarray
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """PoE posterior for every expert subset (always including the prior
    expert).  Inputs are stacked ``[K, ..., S]`` with K = 1 + num_modalities.
    """
    num_modalities = expert_means.shape[0] - 1
    subset_means, subset_stds = [], []
    for subset in enumerate_subsets(num_modalities):
        idx = jnp.asarray(subset)
        m, s = poe(expert_means[idx], expert_stds[idx])
        subset_means.append(m)
        subset_stds.append(s)
    return subset_means, subset_stds


def mopoe_partition(state_size: int, num_components: int) -> List[Tuple[int, int]]:
    """The MoPoE latent-dimension partition (reference
    utils/models/encoder.py:107-120): equal ``floor(S/K)``-sized slices for
    all components, with the final component absorbing the remainder."""
    bounds: List[Tuple[int, int]] = []
    start = 0
    width = state_size // num_components
    for k in range(num_components):
        end = state_size if k == num_components - 1 else start + width
        bounds.append((start, end))
        start = end
    return bounds


def poe_posterior(
    expert_means: jnp.ndarray, expert_stds: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-product posterior over all experts (reference ``get_poe_state``
    minus the sampling, utils/models/encoder.py:57-71)."""
    return poe(expert_means, expert_stds)


def mopoe_posterior(
    expert_means: jnp.ndarray, expert_stds: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MoPoE posterior over all experts (reference ``get_mopoe_state`` minus
    the sampling, utils/models/encoder.py:99-124): concatenate
    latent-dimension slices of the subset-PoE posteriors."""
    subset_means, subset_stds = subset_poe_states(expert_means, expert_stds)
    state_size = expert_means.shape[-1]
    bounds = mopoe_partition(state_size, len(subset_means))
    mean = jnp.concatenate(
        [m[..., s:e] for m, (s, e) in zip(subset_means, bounds)], axis=-1
    )
    std = jnp.concatenate(
        [sd[..., s:e] for sd, (s, e) in zip(subset_stds, bounds)], axis=-1
    )
    return mean, std


def fuse(
    method: str, expert_means: jnp.ndarray, expert_stds: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch on the fusion method.

    The reference routes fusion_method "MoPoE" to MoPoE and everything else
    (including "NN") to PoE inside the transition model
    (utils/models/transition_model.py:184-187); we keep that behaviour, so
    "NN" == "PoE" at the posterior level.
    """
    if method == "MoPoE":
        return mopoe_posterior(expert_means, expert_stds)
    return poe_posterior(expert_means, expert_stds)
