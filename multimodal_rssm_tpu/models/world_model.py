"""The full MRSSM world model: encoder + scan core + decoders + reward head.

Replaces the reference's four algo classes (RSSM / MRSSM_NN / MRSSM_PoE /
MRSSM_MoPoE, algos/MRSSM/*/algo.py) with ONE flax module parameterised by
static config — the fusion strategies are pure functions, so no class
hierarchy is needed (see ops/fusion.py).  ``from_config`` mirrors the
reference's ``build_RSSM`` dispatch (algos/MRSSM/MRSSM/algo.py:6-18).

State-estimation contract matches ``MRSSM_base.estimate_state``
(algos/MRSSM/base/algo.py:337-366): zero initial belief/state, encoder over
the folded (T·B) batch, posterior rollout, 9-entry state dict (beliefs,
prior/posterior states+means+stds, expert means/stds).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_rssm_tpu.models.decoders import MultimodalObservationModel
from multimodal_rssm_tpu.models.encoders import (
    MultimodalEncoder,
    MultimodalStochasticEncoder,
    modality_embedding_size,
)
from multimodal_rssm_tpu.models.heads import RewardModel
from multimodal_rssm_tpu.rssm.core import RSSMCore, expert_dict

Dtype = Any


def bottle(fn, tree, T: int, B: int):
    """Fold the leading (T, B) dims of every leaf, apply, unfold.

    The TPU-native replacement for the reference's ``bottle_tupele*``
    (utils/models/encoder.py:13-48): one big (T·B) batch keeps the MXU fed.
    """
    from multimodal_rssm_tpu.models.layers import fold_tb, unfold_tb

    folded = jax.tree_util.tree_map(fold_tb, tree)
    out = fn(folded)
    return jax.tree_util.tree_map(lambda y: unfold_tb(y, T, B), out)


class WorldModel(nn.Module):
    """Encoder + RSSM core + observation decoders + reward model."""

    # architecture (mirrors cfg.rssm / cfg.env keys)
    observation_names_enc: Tuple[str, ...]
    observation_names_rec: Tuple[str, ...]
    observation_shapes: Mapping[str, Tuple[int, ...]]
    embedding_size: Mapping[str, int]
    activation_function: Mapping[str, str]
    belief_size: int
    state_size: int
    hidden_size: int
    action_size: int
    normalization: Optional[str] = "BatchNorm"
    multimodal: bool = True
    fusion_method: str = "MoPoE"
    expert_dist: str = "q(st|ht,ot)"
    # Activation of the RSSM core (fc_embed_state_action / prior head /
    # in-core posterior heads).  None -> activation_function["dense"].
    # NOTE reference quirk #11: the multimodal algo classes never pass
    # activation_function to MultimodalTransitionModel
    # (algos/MRSSM/MRSSM_{NN,PoE,MoPoE}/algo.py:20-29), so the REAL
    # multimodal training path always runs the ctor default 'relu'
    # (utils/models/transition_model.py:149) regardless of
    # cfg.rssm.activation_function.dense; only the unimodal algo threads
    # dense through (RSSM/algo.py:18-19).  from_config replicates this.
    core_activation: Optional[str] = None
    min_std_dev: float = 0.1
    # Latent distribution (rssm.latent_dist): "gaussian" (reference
    # semantics) or "categorical" — DreamerV2-style V x K discrete latents
    # (ops/categorical.py; no reference counterpart).  For categorical,
    # state_size MUST equal latent_variables * latent_classes (from_config
    # derives it), so decoders / reward / policy consume the flattened
    # one-hot state through the exact same [h, s] interface.
    latent_dist: str = "gaussian"
    latent_variables: int = 0
    latent_classes: int = 0
    unimix: float = 0.0
    scan_unroll: int = 1
    dtype: Dtype = jnp.float32
    # True: full remat everywhere; False: nowhere; "decoders": decoders
    # only (encoder activations are small enough to keep; the decoder
    # stacks are the HBM hogs); "conv": remat everywhere but SAVE the
    # tagged conv/matmul outputs and recompute only the cheap elementwise
    # tail (norm/GLU/activation) — most of the memory saving at a fraction
    # of the recompute FLOPs (see layers.tag_conv_out)
    remat: Any = True

    def _remat_enc(self):
        if self.remat == "conv":
            return "conv"
        return self.remat is True

    def _remat_dec(self):
        if self.remat in ("conv", "decoders_conv"):
            return "conv"
        return self.remat is True or self.remat == "decoders"

    def setup(self):
        embedding_sizes = {
            name: modality_embedding_size(name, self.embedding_size)
            for name in self.observation_names_enc
        }
        if self.multimodal:
            if self.expert_dist == "q(st|ht,ot)":
                self.encoder = MultimodalEncoder(
                    observation_names_enc=self.observation_names_enc,
                    observation_shapes=self.observation_shapes,
                    embedding_size=self.embedding_size,
                    activation_function=self.activation_function,
                    normalization=self.normalization,
                    dtype=self.dtype,
                    remat=self._remat_enc(),
                )
            else:  # q(st|ot): encoder emits (loc, scale) experts directly
                self.encoder = MultimodalStochasticEncoder(
                    observation_names_enc=self.observation_names_enc,
                    observation_shapes=self.observation_shapes,
                    embedding_size=self.embedding_size,
                    state_size=self.state_size,
                    hidden_size=self.hidden_size,
                    activation_function=self.activation_function,
                    normalization=self.normalization,
                    min_std_dev=self.min_std_dev,
                    dtype=self.dtype,
                    remat=self._remat_enc(),
                )
        else:
            # Unimodal RSSM encodes only the first modality
            # (ref algos/MRSSM/RSSM/algo.py:33-38, base/algo.py:18).
            self.encoder = MultimodalEncoder(
                observation_names_enc=(self.observation_names_enc[0],),
                observation_shapes=self.observation_shapes,
                embedding_size=self.embedding_size,
                activation_function=self.activation_function,
                normalization=self.normalization,
                dtype=self.dtype,
                remat=self._remat_enc(),
            )

        self.core = RSSMCore(
            belief_size=self.belief_size,
            state_size=self.state_size,
            action_size=self.action_size,
            hidden_size=self.hidden_size,
            embedding_sizes=embedding_sizes,
            observation_names_enc=tuple(self.observation_names_enc),
            multimodal=self.multimodal,
            fusion_method=self.fusion_method,
            expert_dist=self.expert_dist,
            activation_function=(self.core_activation
                                 or self.activation_function["dense"]),
            min_std_dev=self.min_std_dev,
            latent_dist=self.latent_dist,
            latent_variables=self.latent_variables,
            latent_classes=self.latent_classes,
            unimix=self.unimix,
            scan_unroll=self.scan_unroll,
            dtype=self.dtype,
        )

        rec_names = (
            tuple(self.observation_names_rec)
            if self.multimodal
            else (self.observation_names_rec[0],)
        )
        self.observation_model = MultimodalObservationModel(
            observation_names_rec=rec_names,
            observation_shapes=self.observation_shapes,
            embedding_size=self.embedding_size,
            belief_size=self.belief_size,
            state_size=self.state_size,
            hidden_size=self.hidden_size,
            activation_function=self.activation_function,
            normalization=self.normalization,
            dtype=self.dtype,
            remat=self._remat_dec(),
        )
        self.reward_model = RewardModel(
            hidden_size=self.hidden_size,
            activation_function=self.activation_function["dense"],
            dtype=self.dtype,
        )

    # -- encoding ---------------------------------------------------------
    def encode(self, observations: Mapping[str, jnp.ndarray], train: bool = True):
        """Encoder over folded (T·B); returns dict of [T, B, E] embeddings
        (or {loc, scale} experts for q(st|ot))."""
        T, B = next(iter(observations.values())).shape[:2]
        if not self.multimodal:
            emb = bottle(lambda o: self.encoder(o, train=train), dict(observations), T, B)
            return emb[self.observation_names_enc[0]]
        return bottle(lambda o: self.encoder(o, train=train), dict(observations), T, B)

    # -- inference --------------------------------------------------------
    def estimate_state(
        self,
        observations: Mapping[str, jnp.ndarray],
        actions: jnp.ndarray,
        nonterminals: Optional[jnp.ndarray],
        key: Optional[jax.Array] = None,
        det: bool = False,
        train: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Posterior state estimation over a chunk (ref base/algo.py:337-366).

        observations: dict of [T-1, B, ...] targets (already clipped from
        t=1); actions/nonterminals: [T-1, B, ·].
        """
        B = actions.shape[1]
        init_h = jnp.zeros((B, self.belief_size), jnp.float32)
        init_s = jnp.zeros((B, self.state_size), jnp.float32)
        return self.estimate_state_from(
            init_h, init_s, observations, actions, nonterminals,
            key=key, det=det, train=train,
        )

    def filter_step(
        self,
        belief: jnp.ndarray,
        state: jnp.ndarray,
        action: jnp.ndarray,
        observations: Mapping[str, jnp.ndarray],
        nonterminal: Optional[jnp.ndarray] = None,
        key: Optional[jax.Array] = None,
        det: bool = True,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """One online posterior update (streaming deployment API).

        The reference can only infer over whole pre-recorded sequences
        (estimate_state, base/algo.py:337-366); a robot controller needs the
        per-frame filter: given the previous (belief, state), the action
        taken, and the new observation frame, produce the next posterior.
        Semantics are identical to one step of ``estimate_state`` — this
        calls the same scan core with T=1, so parameters and numerics are
        shared exactly.

        belief [B, H], state [B, S], action [B, A], observations dict of
        [B, ...] single frames (preprocessed like training inputs).
        Returns the per-step state dict (beliefs/prior/posterior[/experts])
        with the leading time axis squeezed; carry forward ``beliefs`` and
        ``posterior_states``.
        """
        obs_seq = {k: v[None] for k, v in observations.items()}
        nt = None if nonterminal is None else nonterminal[None]
        states = self.estimate_state_from(
            belief, state, obs_seq, action[None], nt, key=key, det=det,
            train=train,
        )
        return jax.tree_util.tree_map(lambda x: x[0], states)

    def estimate_state_from(
        self,
        init_belief: jnp.ndarray,
        init_state: jnp.ndarray,
        observations: Mapping[str, jnp.ndarray],
        actions: jnp.ndarray,
        nonterminals: Optional[jnp.ndarray] = None,
        key: Optional[jax.Array] = None,
        det: bool = False,
        train: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """``estimate_state`` from a caller-supplied initial (belief, state)
        instead of zeros — the building block for streaming inference and
        warm-started evaluation."""
        T, B = actions.shape[:2]
        obs_emb = self.encode(observations, train=train)
        if det or key is None:
            eps_prior = jnp.zeros(self.noise_shape(T, B), jnp.float32)
            eps_post = eps_prior
        else:
            k1, k2 = jax.random.split(key)
            eps_prior = self.draw_state_noise(k1, T, B)
            eps_post = self.draw_state_noise(k2, T, B)
        states = self.core(
            init_belief, init_state, actions, nonterminals, obs_emb,
            eps_prior, eps_post,
        )
        if self.multimodal:
            states = dict(states)
            if self.latent_dist == "categorical":
                states["expert_logits_stacked"] = states["expert_logits"]
                states["expert_logits"] = expert_dict(
                    states["expert_logits_stacked"],
                    tuple(self.observation_names_enc),
                )
            else:
                states["expert_means_stacked"] = states["expert_means"]
                states["expert_std_devs_stacked"] = states["expert_std_devs"]
                states["expert_means"] = expert_dict(
                    states["expert_means_stacked"], tuple(self.observation_names_enc)
                )
                states["expert_std_devs"] = expert_dict(
                    states["expert_std_devs_stacked"], tuple(self.observation_names_enc)
                )
        return states

    # -- state-noise plumbing (branching on the latent distribution) ------
    def noise_shape(self, T: int, B: int):
        """Shape of the pre-drawn reparameterisation noise the scan
        consumes per rollout: standard-normal [T, B, S] for Gaussian,
        Gumbel [T, B, V, K] for categorical (zeros => det/mode in both)."""
        if self.latent_dist == "categorical":
            return (T, B, self.latent_variables, self.latent_classes)
        return (T, B, self.state_size)

    def draw_state_noise(self, key: jax.Array, T: int, B: int) -> jnp.ndarray:
        from multimodal_rssm_tpu.ops import categorical as cat_ops

        shape = self.noise_shape(T, B)
        if self.latent_dist == "categorical":
            return cat_ops.gumbel_noise(key, shape)
        return jax.random.normal(key, shape, jnp.float32)

    def rollout_prior(
        self,
        init_belief: jnp.ndarray,
        init_state: jnp.ndarray,
        actions: jnp.ndarray,
        nonterminals: Optional[jnp.ndarray] = None,
        key: Optional[jax.Array] = None,
        det: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Open-loop prior rollout (imagination / overshooting; ref
        transition model with obs=None)."""
        T, B = actions.shape[:2]
        if det or key is None:
            eps = jnp.zeros(self.noise_shape(T, B), jnp.float32)
        else:
            eps = self.draw_state_noise(key, T, B)
        return self.core.prior_rollout(init_belief, init_state, actions, nonterminals, eps)

    # -- decoding ---------------------------------------------------------
    def decode(self, beliefs, states, train: bool = True):
        """Per-modality reconstructions {name: {loc, scale}}."""
        return self.observation_model(beliefs, states, train=train)

    def observation_mse(self, beliefs, states, targets, train: bool = True):
        return self.observation_model.get_mse(beliefs, states, targets, train=train)

    def observation_log_prob(self, beliefs, states, targets, train: bool = True):
        return self.observation_model.get_log_prob(beliefs, states, targets, train=train)

    def reward(self, beliefs, states):
        return self.reward_model(beliefs, states)

    def train_forward(
        self,
        observations_target: Mapping[str, jnp.ndarray],
        actions: jnp.ndarray,
        nonterminals: Optional[jnp.ndarray],
        key: Optional[jax.Array],
        use_log_prob: bool = False,
        train: bool = True,
    ):
        """One forward pass producing everything the ELBO needs in a single
        ``apply`` (so batch-norm stats mutate once): states, per-element
        reconstruction losses, reward prediction."""
        states = self.estimate_state(
            observations_target, actions, nonterminals, key, train=train
        )
        h, s = states["beliefs"], states["posterior_states"]
        if use_log_prob:
            per_elem = self.observation_log_prob(h, s, observations_target, train=train)
        else:
            per_elem = self.observation_mse(h, s, observations_target, train=train)
        rew = self.reward(h, s)
        return states, per_elem, rew

    # init target: touch every submodule so all params exist
    def __call__(self, observations, actions, nonterminals, key=None, train=True):
        states = self.estimate_state(observations, actions, nonterminals, key, train=train)
        recon = self.decode(states["beliefs"], states["posterior_states"], train=train)
        rew = self.reward(states["beliefs"], states["posterior_states"])
        return states, recon, rew

    # -- factory ----------------------------------------------------------
    @staticmethod
    def from_config(cfg, dtype=jnp.float32) -> "WorldModel":
        """Build from a composed config (mirrors reference ``build_RSSM``,
        algos/MRSSM/MRSSM/algo.py:6-18 — fusion_method/multimodal dispatch
        becomes static module config)."""
        rssm = cfg.rssm
        multimodal = bool(rssm.multimodal)
        fusion_method = (
            rssm.multimodal_params.fusion_method if multimodal else "PoE"
        )
        expert_dist = (
            rssm.multimodal_params.expert_dist if multimodal else "q(st|ht,ot)"
        )
        shapes = {k: tuple(v) for k, v in cfg.env.observation_shapes.items()}
        convt_impl = rssm.get("convt_impl", None)
        if convt_impl:
            from multimodal_rssm_tpu.models import layers

            print(f"convt_impl: {layers.set_convt_impl(str(convt_impl))}")
        latent_dist, latent_v, latent_k, unimix = resolve_latent(rssm)
        return WorldModel(
            observation_names_enc=tuple(rssm.observation_names_enc),
            observation_names_rec=tuple(rssm.observation_names_rec),
            observation_shapes=shapes,
            embedding_size=dict(rssm.embedding_size),
            activation_function=dict(rssm.activation_function),
            belief_size=int(rssm.belief_size),
            state_size=(latent_v * latent_k if latent_dist == "categorical"
                        else int(rssm.state_size)),
            hidden_size=int(rssm.hidden_size),
            action_size=int(cfg.env.action_size),
            normalization=rssm.normalization,
            multimodal=multimodal,
            fusion_method=fusion_method,
            expert_dist=expert_dist,
            # reference quirk #11 (see core_activation field): multimodal
            # transition cores always run relu; unimodal threads dense.
            # rssm.core_activation overrides for users who want dense.
            core_activation=(rssm.get("core_activation")
                             or ("relu" if multimodal else None)),
            latent_dist=latent_dist,
            latent_variables=latent_v,
            latent_classes=latent_k,
            unimix=unimix,
            scan_unroll=int(rssm.get("scan_unroll", 1) or 1),
            dtype=dtype,
            remat=_check_remat(rssm.get("remat", True)),
        )


def resolve_latent(rssm) -> Tuple[str, int, int, float]:
    """Parse ``rssm.latent_dist`` (+ ``rssm.categorical_params``) ->
    (latent_dist, variables, classes, unimix).  Gaussian (the reference
    semantics and default) returns zeros for the categorical fields."""
    latent_dist = str(rssm.get("latent_dist", "gaussian") or "gaussian")
    if latent_dist == "gaussian":
        return latent_dist, 0, 0, 0.0
    if latent_dist != "categorical":
        raise ValueError(
            f"rssm.latent_dist={latent_dist!r} not in ('gaussian', 'categorical')")
    cp = rssm.get("categorical_params", None) or {}
    variables = int(cp.get("variables", 32))
    classes = int(cp.get("classes", 32))
    unimix = float(cp.get("unimix", 0.01))
    if variables < 1 or classes < 2:
        raise ValueError(
            f"categorical_params needs variables >= 1 and classes >= 2, got "
            f"{variables} x {classes}")
    if not (0.0 <= unimix < 1.0):
        raise ValueError(f"categorical_params.unimix={unimix} not in [0, 1)")
    return latent_dist, variables, classes, unimix


def effective_state_size(cfg) -> int:
    """The flattened latent-state width consumers see ([h, s] concat inputs,
    zero-init carries): ``rssm.state_size`` for Gaussian, V*K for
    categorical.  Use this instead of reading cfg.rssm.state_size directly.
    """
    latent_dist, v, k, _ = resolve_latent(cfg.rssm)
    return v * k if latent_dist == "categorical" else int(cfg.rssm.state_size)


_REMAT_VALUES = (True, False, "decoders", "conv", "decoders_conv")


def _check_remat(value):
    if value not in _REMAT_VALUES:
        raise ValueError(
            f"rssm.remat={value!r} is not one of {_REMAT_VALUES}")
    return value
