"""ELBO loss assembly.

Replicates the reference's loss math (algos/MRSSM/base/algo.py:75-232 and
algos/MRSSM/MRSSM_MoPoE/algo.py:110-137) as pure float32 functions over the
scan outputs:

- per-modality reconstruction loss: MSE or Gaussian NLL, ``mean over (T, B)
  then sum over feature dims`` (ref :368-385, RSSM :82-96);
- reward loss: NLL or MSE mean (ref :96-109), zeroed when
  ``predict_reward`` is off (ref :200-201);
- KL with balancing: ``alpha * KL(sg(q) || p) + (1-alpha) * KL(q || sg(p))``
  summed over the state dim, elementwise max with free nats, mean over
  (T, B) (ref :75-94);
- MoPoE KL: the same, averaged over all 2^M expert-subset PoE posteriors
  (plain KL — the reference applies no balancing here, MoPoE algo :110-137);
- global KL against N(0, I) (ref :186-188; the reference's batch-size-bound
  global prior bug :23-24 is fixed by broadcasting).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp

from multimodal_rssm_tpu.ops import categorical, fusion, gaussian


def observation_losses(
    per_elem: Mapping[str, jnp.ndarray], negate: bool
) -> Dict[str, jnp.ndarray]:
    """Reduce per-element recon losses: mean over (T, B), sum over features.

    ``negate`` for log-probs (loss = -logp); False for MSE.
    """
    out = {}
    for name, v in per_elem.items():
        v = v.astype(jnp.float32)
        red = jnp.mean(v, axis=(0, 1)).sum()
        out[name] = -red if negate else red
    return out


def reward_loss(
    pred_loc: jnp.ndarray,
    pred_scale: jnp.ndarray,
    rewards: jnp.ndarray,
    use_log_prob: bool,
) -> jnp.ndarray:
    """Reward NLL or MSE over [T, B] (ref :96-109).  ``rewards`` must
    already be the aligned target (the reference passes rewards[:-1])."""
    if use_log_prob:
        lp = gaussian.log_prob(pred_loc, pred_scale, rewards)
        return -jnp.mean(lp)
    return jnp.mean(jnp.square(pred_loc - rewards))


def kl_balanced(
    post_mean: jnp.ndarray,
    post_std: jnp.ndarray,
    prior_mean: jnp.ndarray,
    prior_std: jnp.ndarray,
    alpha: Optional[float],
    free_nats: float,
) -> jnp.ndarray:
    """KL-balancing with free nats (ref :75-94).

    alpha None -> plain KL.  The free-nats max applies to the state-dim sum
    (so padded/low-information steps contribute exactly free_nats).
    """
    sg = jax.lax.stop_gradient
    if alpha is None:
        div = gaussian.kl_normal(post_mean, post_std, prior_mean, prior_std).sum(-1)
    else:
        kl1 = gaussian.kl_normal(
            sg(post_mean), sg(post_std), prior_mean, prior_std
        ).sum(-1)
        kl2 = gaussian.kl_normal(
            post_mean, post_std, sg(prior_mean), sg(prior_std)
        ).sum(-1)
        div = alpha * kl1 + (1.0 - alpha) * kl2
    return jnp.maximum(div, free_nats).mean()


def mopoe_kl(
    expert_means: jnp.ndarray,
    expert_stds: jnp.ndarray,
    prior_mean: jnp.ndarray,
    prior_std: jnp.ndarray,
    free_nats: float,
) -> jnp.ndarray:
    """Mean over subset-PoE posteriors of the (unbalanced) free-nats KL
    against the prior (ref MoPoE algo :110-137).

    expert stacks are [T, K, B, S] (scan-stacked); subsets enumerated
    statically over the expert axis.
    """
    means = jnp.moveaxis(expert_means, 1, 0)  # [K, T, B, S]
    stds = jnp.moveaxis(expert_stds, 1, 0)
    subset_means, subset_stds = fusion.subset_poe_states(means, stds)
    losses = []
    for m, sd in zip(subset_means, subset_stds):
        div = gaussian.kl_normal(m, sd, prior_mean, prior_std).sum(-1)
        losses.append(jnp.maximum(div, free_nats).mean())
    return jnp.stack(losses).mean()


def global_kl(post_mean: jnp.ndarray, post_std: jnp.ndarray) -> jnp.ndarray:
    """KL against N(0, I), summed over state dim, mean over (T, B)
    (ref :186-188)."""
    return gaussian.kl_standard_normal(post_mean, post_std).sum(-1).mean()


# -- categorical-latent (DreamerV2-family) counterparts --------------------
#
# Same reduction/free-nats/balancing structure with per-variable categorical
# KLs (ops/categorical.py) in place of the per-dimension Gaussian terms.
# ``*_logits`` arrays are normalized log-probs [T, B, V, K] (experts
# [T, E, B, V, K]).  No reference counterpart — the reference is
# Gaussian-only; the loss SHAPE (sum over latent axis, max with free nats,
# mean over (T, B)) deliberately mirrors the Gaussian path so configs mean
# the same thing under either latent_dist.


def kl_balanced_categorical(
    post_logits: jnp.ndarray,
    prior_logits: jnp.ndarray,
    alpha: Optional[float],
    free_nats: float,
) -> jnp.ndarray:
    """Balanced categorical KL with free nats (DreamerV2 eq. 4 uses the
    same two-term stop-gradient balancing the reference applies to its
    Gaussians, base/algo.py:83-91)."""
    sg = jax.lax.stop_gradient
    if alpha is None:
        div = categorical.kl_categorical(post_logits, prior_logits).sum(-1)
    else:
        kl1 = categorical.kl_categorical(sg(post_logits), prior_logits).sum(-1)
        kl2 = categorical.kl_categorical(post_logits, sg(prior_logits)).sum(-1)
        div = alpha * kl1 + (1.0 - alpha) * kl2
    return jnp.maximum(div, free_nats).mean()


def mopoe_kl_categorical(
    expert_logits: jnp.ndarray,
    prior_logits: jnp.ndarray,
    free_nats: float,
) -> jnp.ndarray:
    """Mean over subset-product posteriors of the (unbalanced) free-nats
    categorical KL against the prior — the discrete mirror of ``mopoe_kl``.
    """
    stacked = jnp.moveaxis(expert_logits, 1, 0)  # [E, T, B, V, K]
    losses = []
    for subset_logits in categorical.subset_poe_logits(stacked):
        div = categorical.kl_categorical(subset_logits, prior_logits).sum(-1)
        losses.append(jnp.maximum(div, free_nats).mean())
    return jnp.stack(losses).mean()


def global_kl_categorical(post_logits: jnp.ndarray) -> jnp.ndarray:
    """KL against the per-variable uniform distribution (the max-entropy
    global prior — the categorical analogue of N(0, I)), summed over
    variables, mean over (T, B)."""
    return categorical.kl_uniform(post_logits).sum(-1).mean()
