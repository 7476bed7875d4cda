"""Categorical (discrete) latent primitives — the DreamerV2-family variant.

The reference implements Gaussian latent states only
(utils/models/encoder.py:126-155 — loc + softplus scale heads).  This module
adds the discrete alternative introduced by DreamerV2 (Hafner et al. 2021,
"Mastering Atari with Discrete World Models"): the stochastic state is a
vector of V independent categorical variables with K classes each, sampled
as one-hot vectors with straight-through gradients, optionally regularised
with a uniform mixture ("unimix", DreamerV3).  It is a capability the
reference lacks but its model family (PlaNet/Dreamer) standardised on.

Conventions:

- ``logits`` arrays are shaped [..., V, K] and are always *normalized*
  (``log p``, i.e. log_softmax has been applied — possibly through the
  unimix mixture).  Normalization makes logit addition an exact product of
  the expert distributions up to the final renormalization, which
  ``normalize_logits`` performs.
- flattened state vectors (what the GRU / decoders consume) are
  [..., V*K] float32, matching the Gaussian contract's ``state_size``.
- all math is float32 regardless of the bf16 compute policy (the calling
  heads cast, exactly like the Gaussian heads in rssm/core.py).

TPU notes: everything here is elementwise + small reductions over the class
axis — XLA fuses it into the surrounding matmuls; the one-hot argmax sample
is a compare-against-max broadcast, not a gather, so it vectorises on the
VPU with no dynamic indexing.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp


def normalize_logits(raw: jnp.ndarray, unimix: float = 0.0) -> jnp.ndarray:
    """log_softmax over the class axis, optionally through a uniform mixture.

    ``unimix`` > 0 parameterises the distribution as
    ``p = (1-u) * softmax(raw) + u/K`` (DreamerV3's 1% unimix): probabilities
    are floored at ``u/K`` so KL terms stay bounded and straight-through
    gradients never die on a saturated class.  Returns exact log
    probabilities.
    """
    raw = raw.astype(jnp.float32)
    logp = jax.nn.log_softmax(raw, axis=-1)
    if unimix and unimix > 0.0:
        K = raw.shape[-1]
        probs = (1.0 - unimix) * jnp.exp(logp) + unimix / K
        logp = jnp.log(probs)
    return logp


def gumbel_noise(key: jax.Array, shape: Tuple[int, ...]) -> jnp.ndarray:
    """Standard Gumbel noise (the categorical analogue of the Gaussian
    rollouts' pre-drawn eps): ``argmax(logits + g)`` is an exact categorical
    sample, and zero noise degrades to the distribution mode — so the same
    ``det = zero-noise`` convention as the Gaussian scan core applies."""
    return jax.random.gumbel(key, shape, jnp.float32)


def st_sample(logits: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """Straight-through one-hot sample, shaped like ``logits`` [..., V, K].

    Forward: one_hot(argmax(logits + noise)) — an exact sample (Gumbel-max)
    or the mode when ``noise`` is zero.  Backward: gradients flow through
    the probabilities (sample + p - sg(p), DreamerV2 eq. 3).
    """
    probs = jnp.exp(logits)
    idx = jnp.argmax(logits + noise, axis=-1)
    onehot = jax.nn.one_hot(idx, logits.shape[-1], dtype=jnp.float32)
    return onehot + probs - jax.lax.stop_gradient(probs)


def flatten_state(x: jnp.ndarray) -> jnp.ndarray:
    """[..., V, K] -> [..., V*K]."""
    return x.reshape(*x.shape[:-2], x.shape[-2] * x.shape[-1])


def unflatten_state(x: jnp.ndarray, variables: int, classes: int) -> jnp.ndarray:
    """[..., V*K] -> [..., V, K]."""
    return x.reshape(*x.shape[:-1], variables, classes)


def kl_categorical(logits_q: jnp.ndarray, logits_p: jnp.ndarray) -> jnp.ndarray:
    """KL(q || p) per variable: sum_k q_k (log q_k - log p_k) over the class
    axis -> [..., V].  Inputs must be normalized log-probs."""
    q = jnp.exp(logits_q)
    return jnp.sum(q * (logits_q - logits_p), axis=-1)


def kl_uniform(logits_q: jnp.ndarray) -> jnp.ndarray:
    """KL(q || Uniform(K)) per variable = log K - H(q) -> [..., V].

    The categorical analogue of the Gaussian global KL against N(0, I)
    (losses/elbo.py:global_kl; ref base/algo.py:186-188) — the maximum-
    entropy reference distribution.
    """
    K = logits_q.shape[-1]
    q = jnp.exp(logits_q)
    return jnp.sum(q * logits_q, axis=-1) + jnp.log(jnp.float32(K))


# -- multimodal fusion -----------------------------------------------------
#
# Products of categorical experts are exact in logit space: the normalized
# product of expert distributions has log p ∝ sum of expert log p.  This is
# the discrete counterpart of ops/fusion.py's Gaussian PoE; the subset
# enumeration and the MoPoE partition (over the V *variables* instead of the
# latent dimensions) mirror fusion.enumerate_subsets / mopoe_partition so
# the three fusion strategies (NN→PoE fall-through included) carry over.

from multimodal_rssm_tpu.ops.fusion import enumerate_subsets, mopoe_partition


def poe_logits(expert_logits: jnp.ndarray) -> jnp.ndarray:
    """Product of categorical experts over the leading axis:
    [E, ..., V, K] -> normalized [..., V, K]."""
    return jax.nn.log_softmax(jnp.sum(expert_logits, axis=0), axis=-1)


def subset_poe_logits(expert_logits: jnp.ndarray) -> List[jnp.ndarray]:
    """Product posterior for every expert subset (prior expert index 0
    always included — mirrors fusion.subset_poe_states)."""
    num_modalities = expert_logits.shape[0] - 1
    out = []
    for subset in enumerate_subsets(num_modalities):
        idx = jnp.asarray(subset)
        out.append(poe_logits(expert_logits[idx]))
    return out


def mopoe_logits(expert_logits: jnp.ndarray) -> jnp.ndarray:
    """MoPoE posterior: partition the V variables equally across the 2^M
    subset products and concatenate their slices — the exact discrete
    counterpart of the reference's latent-dimension partition
    (utils/models/encoder.py:99-124), acting on whole categorical variables
    so every class distribution stays intact."""
    subsets = subset_poe_logits(expert_logits)
    V = expert_logits.shape[-2]
    bounds = mopoe_partition(V, len(subsets))
    return jnp.concatenate(
        [l[..., s:e, :] for l, (s, e) in zip(subsets, bounds)], axis=-2
    )


def fuse_logits(method: str, expert_logits: jnp.ndarray) -> jnp.ndarray:
    """Dispatch like fusion.fuse: "MoPoE" -> variable-partition mixture,
    everything else (incl. "NN", matching reference quirk 2) -> full product."""
    if method == "MoPoE":
        return mopoe_logits(expert_logits)
    return poe_logits(expert_logits)
