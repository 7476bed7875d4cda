"""The RSSM recurrence as a single time-major ``lax.scan``.

TPU-native re-design of the reference transition models
(utils/models/transition_model.py — ``TransitionModel`` :10-136 and
``MultimodalTransitionModel`` :139-307):

- the reference's per-timestep Python loop (:66, :226) becomes one
  ``nn.scan`` (an XLA while-loop compiled once), carry = (belief h, state s);
- the reference's 4 algo subclasses collapse into one core with a static
  ``fusion_method`` — PoE / MoPoE / NN are pure functions over stacked
  expert (mean, std) tensors (ops/fusion.py);
- reparameterisation noise for every timestep is drawn in two bulk PRNG
  calls outside the scan and threaded through as scan inputs (``det`` rollout
  == zero noise);
- the action contribution to the state-action embedding and the
  observation half of each expert head's first layer do not depend on the
  recurrent carry, so they are hoisted out of the scan into single large
  (T·B) MXU matmuls; only carry-dependent matmuls remain per step.  This is
  numerically identical to the reference's concatenated Linears.

Time-indexing contract (identical to ref :40-48): given T-1 actions /
nonterminals and T-1 observation embeddings, outputs are stacked
[T-1, B, ·] for times 1..T-1; the initial belief/state are consumed, not
re-emitted.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_rssm_tpu.models.heads import scale_from_raw
from multimodal_rssm_tpu.models.layers import Dense, GRUCell, act_fn
from multimodal_rssm_tpu.ops import categorical as cat
from multimodal_rssm_tpu.ops import fusion

Dtype = Any

PRIOR_EXPERT = "prior_expert"


class RSSMCell(nn.Module):
    """One RSSM timestep.

    carry: (h [B, belief], s [B, state])
    x:     (a_proj [B, belief], nonterm [B, 1], eps_prior [B, state],
            eps_post [B, state] | None, obs | None)
      obs is
        - None                      -> prior-only step (open loop)
        - [B, hidden] projection    -> unimodal posterior step
        - {name: [B, hidden]}       -> multimodal, expert_dist q(st|ht,ot)
        - {name: {loc, scale}}      -> multimodal, expert_dist q(st|ot)
    """

    belief_size: int
    state_size: int
    hidden_size: int
    observation_names_enc: Tuple[str, ...] = ()
    multimodal: bool = True
    fusion_method: str = "MoPoE"
    expert_dist: str = "q(st|ht,ot)"
    activation_function: str = "elu"
    min_std_dev: float = 0.1
    # latent distribution: "gaussian" (reference) or "categorical"
    # (DreamerV2-style V x K one-hot variables, ops/categorical.py).  For
    # categorical, state_size == latent_variables * latent_classes (the
    # flattened one-hot size the GRU/decoders consume) and the eps_* noise
    # inputs are Gumbel-shaped [B, V, K] (zeros => mode, same det contract
    # as the Gaussian zero-eps rollout).
    latent_dist: str = "gaussian"
    latent_variables: int = 0
    latent_classes: int = 0
    unimix: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, x):
        h, s = carry
        a_proj, nonterm, eps_prior, eps_post, obs = x
        act = act_fn(self.activation_function)
        dtype = self.dtype

        # h_t = GRU(act(W_s s_{t-1} + W_a a_{t-1} + b), h_{t-1}); the W_a
        # part arrives precomputed in a_proj (ref :72-75, :232-235).
        s_masked = (s * nonterm).astype(dtype)
        hidden = act(
            Dense(self.belief_size, dtype=dtype, name="fc_sa_s")(s_masked)
            + a_proj.astype(dtype)
        )
        h_next = GRUCell(self.belief_size, dtype=dtype, name="rnn")(
            h.astype(dtype), hidden
        )
        # Carry and emit the belief in f32: the GRU state accumulates over
        # 49 steps, and all heads/losses re-cast to the compute dtype anyway.
        h_next = h_next.astype(jnp.float32)

        if self.latent_dist == "categorical":
            return self._categorical_step(h_next, eps_prior, eps_post, obs)

        # Prior p(s_t | h_t) (ref :80-85, :240-245).
        prior = self._head("ssm", h_next)
        prior_state = prior["loc"] + prior["scale"] * eps_prior

        if obs is None:
            out = {
                "beliefs": h_next,
                "prior_states": prior_state,
                "prior_means": prior["loc"],
                "prior_std_devs": prior["scale"],
            }
            return (h_next, prior_state.astype(jnp.float32)), out

        if not self.multimodal:
            post = self._obs_head("obs", h_next, obs)
            post_state = post["loc"] + post["scale"] * eps_post
            out = {
                "beliefs": h_next,
                "prior_states": prior_state,
                "prior_means": prior["loc"],
                "prior_std_devs": prior["scale"],
                "posterior_states": post_state,
                "posterior_means": post["loc"],
                "posterior_std_devs": post["scale"],
            }
            return (h_next, post_state.astype(jnp.float32)), out

        # Multimodal: per-expert (mean, std), prior expert first
        # (ref :247-262; expert ordering ref encoder.py:203-211).
        means = [None] * (len(self.observation_names_enc) + 1)
        stds = [None] * (len(self.observation_names_enc) + 1)
        pe = self._head(PRIOR_EXPERT, h_next)
        means[0], stds[0] = pe["loc"], pe["scale"]
        for i, name in enumerate(self.observation_names_enc, start=1):
            if self.expert_dist == "q(st|ht,ot)":
                e = self._obs_head(f"obs_{name}", h_next, obs[name])
            else:  # q(st|ot): experts computed by the stochastic encoder
                e = obs[name]
            means[i], stds[i] = e["loc"], e["scale"]
        expert_means = jnp.stack(means, axis=0)  # [K, B, S]
        expert_stds = jnp.stack(stds, axis=0)

        post_mean, post_std = fusion.fuse(self.fusion_method, expert_means, expert_stds)
        post_state = post_mean + post_std * eps_post
        out = {
            "beliefs": h_next,
            "prior_states": prior_state,
            "prior_means": prior["loc"],
            "prior_std_devs": prior["scale"],
            "posterior_states": post_state,
            "posterior_means": post_mean,
            "posterior_std_devs": post_std,
            "expert_means": expert_means,
            "expert_std_devs": expert_stds,
        }
        return (h_next, post_state.astype(jnp.float32)), out

    # -- categorical latent (DreamerV2-family; no reference counterpart) --
    def _categorical_step(self, h_next, eps_prior, eps_post, obs):
        """The V x K discrete-latent step.  Mirrors the Gaussian branch's
        output contract with ``*_logits`` [B, V, K] in place of std devs and
        ``*_means`` = flattened class probabilities (E[one-hot] — so every
        det-mode consumer of ``posterior_means`` keeps working unchanged)."""
        prior_logits = self._cat_head("ssm", h_next)
        prior_state = cat.flatten_state(cat.st_sample(prior_logits, eps_prior))

        if obs is None:
            out = {
                "beliefs": h_next,
                "prior_states": prior_state,
                "prior_means": cat.flatten_state(jnp.exp(prior_logits)),
                "prior_logits": prior_logits,
            }
            return (h_next, prior_state.astype(jnp.float32)), out

        if not self.multimodal:
            post_logits = self._cat_obs_head("obs", h_next, obs)
        else:
            logits = [None] * (len(self.observation_names_enc) + 1)
            logits[0] = self._cat_head(PRIOR_EXPERT, h_next)
            for i, name in enumerate(self.observation_names_enc, start=1):
                logits[i] = self._cat_obs_head(f"obs_{name}", h_next, obs[name])
            expert_logits = jnp.stack(logits, axis=0)  # [K_experts, B, V, K]
            post_logits = cat.fuse_logits(self.fusion_method, expert_logits)

        post_state = cat.flatten_state(cat.st_sample(post_logits, eps_post))
        out = {
            "beliefs": h_next,
            "prior_states": prior_state,
            "prior_means": cat.flatten_state(jnp.exp(prior_logits)),
            "prior_logits": prior_logits,
            "posterior_states": post_state,
            "posterior_means": cat.flatten_state(jnp.exp(post_logits)),
            "posterior_logits": post_logits,
        }
        if self.multimodal:
            out["expert_logits"] = expert_logits
        return (h_next, post_state.astype(jnp.float32)), out

    def _cat_head(self, name: str, h: jnp.ndarray) -> jnp.ndarray:
        """2-layer head emitting normalized [B, V, K] log-probs (same layer
        naming scheme as the Gaussian ``_head`` so module paths line up)."""
        act = act_fn(self.activation_function)
        hidden = act(Dense(self.hidden_size, dtype=self.dtype, name=f"{name}_fc1")(
            h.astype(self.dtype)))
        raw = Dense(
            self.latent_variables * self.latent_classes,
            dtype=self.dtype, name=f"{name}_fc2",
        )(hidden)
        raw = cat.unflatten_state(
            raw.astype(jnp.float32), self.latent_variables, self.latent_classes
        )
        return cat.normalize_logits(raw, self.unimix)

    def _cat_obs_head(self, name: str, h: jnp.ndarray, obs_proj: jnp.ndarray):
        act = act_fn(self.activation_function)
        hidden = act(
            Dense(self.hidden_size, dtype=self.dtype, name=f"{name}_fc1_h")(
                h.astype(self.dtype))
            + obs_proj.astype(self.dtype)
        )
        raw = Dense(
            self.latent_variables * self.latent_classes,
            dtype=self.dtype, name=f"{name}_fc2",
        )(hidden)
        raw = cat.unflatten_state(
            raw.astype(jnp.float32), self.latent_variables, self.latent_classes
        )
        return cat.normalize_logits(raw, self.unimix)

    # -- heads ------------------------------------------------------------
    def _head(self, name: str, h: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """StochasticStateModel-style 2-layer head (ref encoder.py:126-155)."""
        act = act_fn(self.activation_function)
        hidden = act(Dense(self.hidden_size, dtype=self.dtype, name=f"{name}_fc1")(
            h.astype(self.dtype)))
        out = Dense(2 * self.state_size, dtype=self.dtype, name=f"{name}_fc2")(hidden)
        loc, raw = jnp.split(out.astype(jnp.float32), 2, axis=-1)
        return {"loc": loc, "scale": scale_from_raw(raw, self.min_std_dev)}

    def _obs_head(self, name: str, h: jnp.ndarray, obs_proj: jnp.ndarray):
        """ObsEncoder belief-half (ref encoder.py:157-190); obs half arrives
        precomputed."""
        act = act_fn(self.activation_function)
        hidden = act(
            Dense(self.hidden_size, dtype=self.dtype, name=f"{name}_fc1_h")(
                h.astype(self.dtype))
            + obs_proj.astype(self.dtype)
        )
        out = Dense(2 * self.state_size, dtype=self.dtype, name=f"{name}_fc2")(hidden)
        loc, raw = jnp.split(out.astype(jnp.float32), 2, axis=-1)
        return {"loc": loc, "scale": scale_from_raw(raw, self.min_std_dev)}


class RSSMCore(nn.Module):
    """Scan-driven RSSM with prior-only and posterior rollouts.

    Replaces reference TransitionModel / MultimodalTransitionModel.  The
    same parameters serve both rollout modes (the reference re-uses its
    transition model with obs=None for overshooting and imagination,
    algos/MRSSM/base/algo.py:138-139).
    """

    belief_size: int
    state_size: int
    action_size: int
    hidden_size: int
    embedding_sizes: Mapping[str, int]  # per-modality ("fusion" for unimodal)
    observation_names_enc: Tuple[str, ...] = ()
    multimodal: bool = True
    fusion_method: str = "MoPoE"
    expert_dist: str = "q(st|ht,ot)"
    activation_function: str = "elu"
    min_std_dev: float = 0.1
    latent_dist: str = "gaussian"
    latent_variables: int = 0
    latent_classes: int = 0
    unimix: float = 0.0
    dtype: Dtype = jnp.float32
    # lax.scan unroll factor for the time loop (cfg.rssm.scan_unroll).
    # >1 replicates the cell body inside the compiled while-loop so XLA can
    # schedule/fuse across adjacent timesteps at the cost of program size.
    scan_unroll: int = 1

    def setup(self):
        if self.latent_dist == "categorical" and self.expert_dist != "q(st|ht,ot)":
            raise ValueError(
                "latent_dist=categorical requires expert_dist='q(st|ht,ot)' "
                "(the stochastic-encoder q(st|ot) path emits Gaussian "
                "(loc, scale) experts)"
            )
        scan = nn.scan(
            RSSMCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
            unroll=int(self.scan_unroll),
        )
        self.cell = scan(
            belief_size=self.belief_size,
            state_size=self.state_size,
            hidden_size=self.hidden_size,
            observation_names_enc=tuple(self.observation_names_enc),
            multimodal=self.multimodal,
            fusion_method=self.fusion_method,
            expert_dist=self.expert_dist,
            activation_function=self.activation_function,
            min_std_dev=self.min_std_dev,
            latent_dist=self.latent_dist,
            latent_variables=self.latent_variables,
            latent_classes=self.latent_classes,
            unimix=self.unimix,
            dtype=self.dtype,
        )
        # Action half of fc_embed_state_action (bias lives in fc_sa_s).
        self.fc_sa_a = Dense(self.belief_size, use_bias=False, dtype=self.dtype)
        # Observation halves of the expert heads' first layers, hoisted out
        # of the scan (see module docstring).
        if self.expert_dist == "q(st|ht,ot)":
            if self.multimodal:
                self.obs_proj = {
                    name: Dense(self.hidden_size, use_bias=False, dtype=self.dtype)
                    for name in self.observation_names_enc
                }
            else:
                self.obs_proj_fused = Dense(
                    self.hidden_size, use_bias=False, dtype=self.dtype
                )

    def _project_obs(self, obs_emb):
        """Apply the hoisted observation projections over all timesteps."""
        if obs_emb is None:
            return None
        if not self.multimodal:
            return self.obs_proj_fused(obs_emb.astype(self.dtype))
        if self.expert_dist == "q(st|ht,ot)":
            return {
                name: self.obs_proj[name](obs_emb[name].astype(self.dtype))
                for name in self.observation_names_enc
            }
        # q(st|ot): obs_emb already holds per-modality {loc, scale} experts.
        return {name: obs_emb[name] for name in self.observation_names_enc}

    def __call__(
        self,
        init_belief: jnp.ndarray,
        init_state: jnp.ndarray,
        actions: jnp.ndarray,
        nonterminals: Optional[jnp.ndarray],
        obs_emb,
        eps_prior: jnp.ndarray,
        eps_post: jnp.ndarray,
    ) -> Dict[str, jnp.ndarray]:
        """Posterior rollout (ref forward with observations, :200-285).

        actions [T-1, B, A]; nonterminals [T-1, B, 1] or None; obs_emb as in
        RSSMCell; eps_* [T-1, B, S] (zeros => det rollout, ref ``det=True``).
        Returns time-major stacked state dict.
        """
        T = actions.shape[0]
        if nonterminals is None:
            nonterminals = jnp.ones((T, actions.shape[1], 1), jnp.float32)
        a_proj = self.fc_sa_a(actions.astype(self.dtype))
        obs = self._project_obs(obs_emb)
        xs = (a_proj, nonterminals, eps_prior, eps_post, obs)
        (h, s), out = self.cell((init_belief, init_state), xs)
        return out

    def prior_rollout(
        self,
        init_belief: jnp.ndarray,
        init_state: jnp.ndarray,
        actions: jnp.ndarray,
        nonterminals: Optional[jnp.ndarray],
        eps_prior: jnp.ndarray,
    ) -> Dict[str, jnp.ndarray]:
        """Open-loop prior rollout (ref forward with obs=None — used for
        latent overshooting and imagination)."""
        T = actions.shape[0]
        if nonterminals is None:
            nonterminals = jnp.ones((T, actions.shape[1], 1), jnp.float32)
        a_proj = self.fc_sa_a(actions.astype(self.dtype))
        xs = (a_proj, nonterminals, eps_prior, None, None)
        (h, s), out = self.cell((init_belief, init_state), xs)
        return out


def expert_dict(
    stacked: jnp.ndarray, observation_names_enc: Tuple[str, ...]
) -> Dict[str, jnp.ndarray]:
    """Unstack a [T, K, B, S] expert tensor into the reference's dict keyed
    by 'prior_expert' + modality names (ref transition_model.py:281-284)."""
    names = (PRIOR_EXPERT, *observation_names_enc)
    return {name: stacked[:, i] for i, name in enumerate(names)}
