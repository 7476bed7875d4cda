"""Open-loop imagination (video prediction) and reconstruction.

The reference's north-star eval lives only in a notebook
(check_model.ipynb cells 33-36 reconstruction, 55-58 imagination: posterior
warm-up, then det prior rollout decoded per modality).  Here it is a
first-class library:

- ``reconstruct``: decode the posterior states of an estimated chunk;
- ``imagine``: from (h, s) at ``t_start``, roll the prior open-loop with the
  recorded actions (det => means) and decode every modality;
- ``video_prediction_mse``: per-modality MSE of the imagined rollout vs the
  ground-truth normalised observations — the BASELINE.json parity metric.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def reconstruct(model, variables, states) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Posterior reconstruction (notebook cells 33-36): decode
    (beliefs, posterior_states)."""
    return model.apply(
        variables, states["beliefs"], states["posterior_states"], False,
        method=model.decode,
    )


def imagine(
    model,
    variables,
    states,
    actions: jnp.ndarray,
    t_start: int,
    horizon: Optional[int] = None,
    det: bool = True,
    key: Optional[jax.Array] = None,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, Dict[str, jnp.ndarray]]]:
    """Open-loop rollout from the posterior at ``t_start``.

    states: output of estimate_state over a chunk with T-1 outputs;
    actions: the chunk's [T-1, B, A] actions (aligned with states).
    Returns (prior rollout dict, per-modality decoded predictions), each
    covering times t_start+1 .. t_start+horizon.

    Det-state convention per latent family (ADVICE r3): for Gaussian
    latents the det state is the mean (``*_means``; identical to
    ``*_states`` under zero eps).  For categorical latents the det state
    is the MODE one-hot (``*_states`` under zero Gumbel noise — the
    DreamerV2/V3 convention): the dynamics carry is the one-hot, so the
    decoder must be conditioned on the same one-hots, not on the
    probability vectors ``*_means`` flattens — the decoder never saw
    probability-vector inputs during training.  Callers in det mode must
    therefore pass ``states`` from a det estimate (check_model does).
    """
    T = actions.shape[0]
    horizon = horizon if horizon is not None else T - t_start - 1
    categorical = getattr(model, "latent_dist", "gaussian") == "categorical"
    det_key = "posterior_states" if categorical else "posterior_means"
    h0 = states["beliefs"][t_start]
    s0 = (states[det_key] if det else states["posterior_states"])[t_start]
    acts = actions[t_start + 1 : t_start + 1 + horizon]
    roll = model.apply(
        variables, h0, s0, acts, None, key, det,
        method=model.rollout_prior,
    )
    det_roll_key = "prior_states" if categorical else "prior_means"
    s_roll = roll[det_roll_key] if det else roll["prior_states"]
    preds = model.apply(
        variables, roll["beliefs"], s_roll, False, method=model.decode,
    )
    return roll, preds


def video_prediction_mse(
    preds: Mapping[str, Mapping[str, jnp.ndarray]],
    targets: Mapping[str, jnp.ndarray],
    t_start: int,
    horizon: int,
) -> Dict[str, float]:
    """Per-modality MSE of imagined predictions vs normalised ground truth
    over the imagination window."""
    out = {}
    for name, pred in preds.items():
        gt = targets[name][t_start + 1 : t_start + 1 + horizon]
        out[name] = float(jnp.mean(jnp.square(pred["loc"] - gt)))
    return out


def cross_modal_model(model, subset: Tuple[str, ...]):
    """A view of the world model whose posterior uses only ``subset`` of the
    modalities' experts (cross-modal inference — the reference gets this via
    ``calc_subset_states``; here the same trained parameters are applied
    with a restricted static modality set, so the prior expert + subset
    experts drive the carry)."""
    return model.clone(
        observation_names_enc=tuple(subset),
        observation_names_rec=tuple(model.observation_names_rec),
    )
