"""Dreamer-style behavior learning: actor-critic trained in imagination.

The reference ships complete actor/value networks (utils/models/policy.py —
``ActorModel``/``ValueModel``) that its training path never touches (SURVEY
§2: "never imported by the training path"; the active config runs with
``predict_reward: False``).  This module makes that dormant capability
surface live: given a trained world model, it trains the reference's policy
heads on latent trajectories imagined with the model's own prior rollout —
the PlaNet→Dreamer upgrade path the reference's model zoo was clearly built
for.

Algorithm (Dreamer, Hafner et al. 2020 — "Dream to Control"):

1. posterior states from a replay batch are the imagination starts
   (stop-gradient: behavior learning never updates the world model);
2. the actor acts in latent space for ``horizon`` steps through the frozen
   transition prior (``WorldModel.rollout_prior`` with T=1 per step — the
   exact open-loop mode the reference reuses for overshooting/imagination,
   base/algo.py:138-139);
3. rewards come from the world model's reward head, values from
   ``ValueModel``; TD(lambda) returns are computed over the imagined
   trajectory;
4. actor loss = -mean(discounted lambda-returns), backpropagated THROUGH
   the learned dynamics (pure function composition — free in JAX, no
   reparameterisation gymnastics); value loss = Gaussian NLL of the
   stop-gradiented returns (scale-1 head, matching the reference's
   ``ValueModel.get_log_prob`` convention, policy.py:36-43).

Everything is one donated jit step; the world-model variables enter as a
constant argument so the same compiled step serves any checkpoint.

DreamerV3 robustness options (ops/returns.py; off by default so the
Dreamer-v1 semantics above stay the reference behaviour):
``behavior.value_head=twohot_symlog`` swaps the Gaussian critic for
discrete regression over symlog two-hot bins, and
``behavior.return_norm=true`` normalizes the actor objective by an EMA of
the 5-95th percentile imagined-return range (the ``return_scale`` carried
in ``BehaviorState``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from multimodal_rssm_tpu.models.policy import (ActorModel, TwoHotValueModel,
                                               ValueModel)
from multimodal_rssm_tpu.models.world_model import WorldModel
from multimodal_rssm_tpu.ops import gaussian
from multimodal_rssm_tpu.ops import returns as rt
from multimodal_rssm_tpu.train import trainer as tr


class BehaviorState(struct.PyTreeNode):
    step: jnp.ndarray
    actor_params: Any
    value_params: Any
    actor_opt_state: Any
    value_opt_state: Any
    # EMA of the imagined-return percentile range (DreamerV3 normalizer
    # statistic S, ops/returns.py); carried even when return_norm is off so
    # the checkpoint schema does not depend on the flag.
    return_scale: jnp.ndarray = struct.field(default_factory=lambda: jnp.ones(()))


BEHAVIOR_DEFAULTS = {
    # imagination horizon H (Dreamer: 15)
    "horizon": 15,
    # imagination starts per step: None = every posterior state of the
    # batch rollout (Dreamer's choice, (L-1)*B = 2450 at reference scale);
    # an int subsamples that many starts uniformly per step — cheaper
    # behavior updates at the cost of gradient variance (A/B in DESIGN.md)
    "imag_batch": None,
    "discount": 0.99,
    # TD(lambda) mixing for the value targets (Dreamer: 0.95)
    "disclam": 0.95,
    "actor_learning_rate": 8.0e-5,
    "value_learning_rate": 8.0e-5,
    "adam_epsilon": 1.0e-7,
    "grad_clip_norm": 100.0,
    "train_iteration": 2000,
    "checkpoint_interval": 500,
    "log_interval": 10,
    # -- DreamerV3 robustness options (ops/returns.py) --
    # value head: "gaussian" (the reference's scale-1 NLL critic) or
    # "twohot_symlog" (discrete regression over symlog bins — gradient
    # scale independent of return scale)
    "value_head": "gaussian",
    "twohot_bins": 255,
    # actor-advantage normalization by an EMA of the 5-95th percentile
    # imagined-return range, clipped below 1 (DreamerV3 eq. 11)
    "return_norm": False,
    "return_norm_decay": 0.99,
    "return_norm_percentile": 5.0,
}


def behavior_cfg(cfg):
    """Inject ``cfg.behavior`` defaults (overridable via dotted CLI
    overrides, recorded in the saved run config like every other group)."""
    section = dict(BEHAVIOR_DEFAULTS)
    section.update(dict(cfg.get("behavior", {}) or {}))
    cfg["behavior"] = section
    return cfg


def build_policy_models(cfg) -> Tuple[ActorModel, Any]:
    """The reference's policy heads at the reference's sizes (policy.py:
    11-43, 103-138): hidden = cfg.rssm.hidden_size, action size from env.
    ``behavior.value_head`` selects the critic: the reference's Gaussian
    head or the DreamerV3 two-hot symlog head (same output contract)."""
    actor = ActorModel(
        hidden_size=int(cfg.rssm.hidden_size),
        action_size=int(cfg.env.action_size),
        activation_function=cfg.rssm.activation_function["dense"],
    )
    head = str(cfg.behavior.get("value_head", "gaussian"))
    if head == "twohot_symlog":
        value = TwoHotValueModel(
            hidden_size=int(cfg.rssm.hidden_size),
            num_bins=int(cfg.behavior.get("twohot_bins", 255)),
            activation_function=cfg.rssm.activation_function["dense"],
        )
    elif head == "gaussian":
        value = ValueModel(
            hidden_size=int(cfg.rssm.hidden_size),
            activation_function=cfg.rssm.activation_function["dense"],
        )
    else:
        raise ValueError(
            f"behavior.value_head={head!r} not in ('gaussian', 'twohot_symlog')")
    return actor, value


def build_behavior_optimizers(cfg):
    b = cfg.behavior
    def make(lr):
        return optax.chain(
            optax.clip_by_global_norm(float(b.grad_clip_norm)),
            optax.adam(float(lr), eps=float(b.adam_epsilon)),
        )
    return make(b.actor_learning_rate), make(b.value_learning_rate)


def init_behavior_state(cfg, actor: ActorModel, value: ValueModel,
                        actor_opt, value_opt, key) -> BehaviorState:
    B = 2  # init shapes are size-independent
    h = jnp.zeros((B, int(cfg.rssm.belief_size)), jnp.float32)
    from multimodal_rssm_tpu.models.world_model import effective_state_size
    s = jnp.zeros((B, effective_state_size(cfg)), jnp.float32)
    k1, k2, k3 = jax.random.split(key, 3)
    actor_params = actor.init(k1, h, s, k2)["params"]
    value_params = value.init(k3, h[None], s[None])["params"]
    return BehaviorState(
        step=jnp.zeros((), jnp.int32),
        actor_params=actor_params,
        value_params=value_params,
        actor_opt_state=actor_opt.init(actor_params),
        value_opt_state=value_opt.init(value_params),
        return_scale=jnp.ones((), jnp.float32),
    )


def lambda_returns(rewards: jnp.ndarray, values: jnp.ndarray,
                   bootstrap: jnp.ndarray, discount: float,
                   lam: float) -> jnp.ndarray:
    """TD(lambda) returns over an imagined trajectory (Dreamer eq. 6).

    rewards/values: [H, B] for steps 1..H; bootstrap: [B] = V at step H+1
    (in practice the last imagined value).  Computed by a reverse scan of
    R_t = r_t + discount * ((1 - lam) * V_{t+1} + lam * R_{t+1}),
    with R_{H+1} = bootstrap.
    """
    next_values = jnp.concatenate([values[1:], bootstrap[None]], axis=0)
    inputs = rewards + discount * (1.0 - lam) * next_values

    def step(carry, x):
        ret = x + discount * lam * carry
        return ret, ret

    _, returns = jax.lax.scan(step, bootstrap, inputs, reverse=True)
    return returns


def imagine_policy(model: WorldModel, wm_variables, actor: ActorModel,
                   actor_params, h0: jnp.ndarray, s0: jnp.ndarray,
                   horizon: int, key: jax.Array,
                   det_action: bool = False) -> Dict[str, jnp.ndarray]:
    """Roll the actor through the frozen latent dynamics for ``horizon``
    steps from starts (h0, s0) [N, ·].  Returns [H, N, ·] stacked beliefs,
    states and actions.  Differentiable w.r.t. ``actor_params`` (gradients
    flow through the dynamics; ``wm_variables`` are constants)."""

    def step(carry, k):
        h, s = carry
        k_act, k_state = jax.random.split(k)
        a = actor.apply({"params": actor_params}, h, s, k_act,
                        det=det_action)
        out = model.apply(
            wm_variables, h, s, a[None], None,
            key=None if det_action else k_state, det=det_action,
            method=model.rollout_prior,
        )
        h2 = out["beliefs"][0]
        s2 = out["prior_states"][0]
        return (h2, s2), (h2, s2, a)

    keys = jax.random.split(key, horizon)
    _, (hs, ss, acts) = jax.lax.scan(step, (h0, s0), keys)
    return {"beliefs": hs, "states": ss, "actions": acts}


def make_behavior_step(model: WorldModel, cfg, actor: ActorModel,
                       value: ValueModel, actor_opt, value_opt,
                       aug_spec: tr.AugSpec):
    """The jitted behavior update:
    ``(bstate, wm_variables, raw_batch, aug_draws, key) -> (bstate, metrics)``.

    ``raw_batch`` is the same (observations, actions, rewards, nonterminals)
    tuple the world-model trainer consumes; the posterior rollout that seeds
    imagination uses identical input preparation, so behavior training can
    share the replay pipeline (and the HBM-resident feed) unchanged.
    """
    b = cfg.behavior
    horizon = int(b.horizon)
    discount = float(b.discount)
    lam = float(b.disclam)
    imag_batch = None if b.imag_batch is None else int(b.imag_batch)
    bit_depth = int(cfg.env.bit_depth)
    use_pallas = tr.pallas_normalize_enabled(cfg)
    xla_opts = tr.resolve_xla_options(cfg)
    use_twohot = str(b.get("value_head", "gaussian")) == "twohot_symlog"
    twohot_bins = rt.bin_centers(int(b.get("twohot_bins", 255)))
    use_return_norm = bool(b.get("return_norm", False))
    rn_decay = float(b.get("return_norm_decay", 0.99))
    rn_pct = float(b.get("return_norm_percentile", 5.0))

    def imagined_values_and_returns(actor_params, value_params, wm_variables,
                                    h0, s0, key):
        traj = imagine_policy(model, wm_variables, actor, actor_params,
                              h0, s0, horizon, key)
        hs, ss = traj["beliefs"], traj["states"]
        rew = model.apply(wm_variables, hs, ss, method=model.reward)
        rewards = rew["loc"]                                   # [H, N]
        vals = value.apply({"params": value_params}, hs, ss)["loc"]
        returns = lambda_returns(rewards[:-1], vals[:-1], vals[-1],
                                 discount, lam)                # [H-1, N]
        return traj, rewards, vals, returns

    def actor_loss_fn(actor_params, value_params, wm_variables, h0, s0, key,
                      return_scale, step):
        traj, rewards, vals, returns = imagined_values_and_returns(
            actor_params, value_params, wm_variables, h0, s0, key)
        # Discount weighting: step t of the imagined trajectory is t model
        # steps in the future (Dreamer applies cumprod of the discount
        # predictor; with no terminal predictor it is discount**t).
        weights = discount ** jnp.arange(horizon - 1, dtype=jnp.float32)
        if use_return_norm:
            # DreamerV3 percentile normalization: advance the EMA range
            # statistic on this batch's returns (seeded from the first
            # batch's spread at step 0 — warmup debias, ADVICE r3), scale
            # the maximized objective by max(1, S) (ops/returns.py).
            new_scale = rt.update_return_scale(
                return_scale, returns, rn_decay, rn_pct, step=step)
            objective = rt.normalize_returns(returns, new_scale)
        else:
            new_scale = return_scale
            objective = returns
        actor_loss = -jnp.mean(weights[:, None] * objective)
        return actor_loss, (traj, rewards, vals, returns, weights, new_scale)

    def value_loss_fn(value_params, traj, targets, weights):
        hs = jax.lax.stop_gradient(traj["beliefs"][:-1])
        ss = jax.lax.stop_gradient(traj["states"][:-1])
        out = value.apply({"params": value_params}, hs, ss)
        if use_twohot:
            # DreamerV3 discrete regression: cross-entropy against the
            # two-hot encoding of symlog(target) over fixed bins.
            target_probs = rt.twohot(rt.symlog(targets), twohot_bins)
            logp = jnp.sum(
                target_probs * jax.nn.log_softmax(out["logits"], -1), -1)
        else:
            # Gaussian NLL at scale 1 (== 0.5*MSE + const), the reference
            # ValueModel's own likelihood convention (policy.py:36-43).
            logp = gaussian.log_prob(out["loc"], out["scale"], targets)
        return -jnp.mean(weights[:, None] * logp), out["loc"]

    @functools.partial(jax.jit, donate_argnums=(0,), compiler_options=xla_opts)
    def behavior_step(bstate: BehaviorState, wm_variables, raw_batch,
                      aug_draws, key):
        observations, actions, rewards_b, nonterminals = raw_batch
        key_prep, key_post, key_img, key_sub = jax.random.split(key, 4)
        observations = tr.prepare_observations(
            observations, aug_spec, aug_draws, bit_depth, key_prep,
            pallas_normalize=use_pallas,
        )
        obs_target = {k: v[1:] for k, v in observations.items()}

        # Imagination starts: every posterior (h, s) of the batch rollout
        # (Dreamer uses all T*B posterior states as starts).  train=False:
        # BatchNorm in eval mode, no mutated stats — the world model is
        # frozen here.
        states = model.apply(
            wm_variables, obs_target, actions[:-1], nonterminals[:-1],
            key_post, train=False, method=model.estimate_state,
        )
        h0 = jax.lax.stop_gradient(
            states["beliefs"].reshape(-1, states["beliefs"].shape[-1]))
        s0 = jax.lax.stop_gradient(
            states["posterior_states"].reshape(
                -1, states["posterior_states"].shape[-1]))
        if imag_batch is not None and imag_batch < h0.shape[0]:
            idx = jax.random.permutation(key_sub, h0.shape[0])[:imag_batch]
            h0, s0 = h0[idx], s0[idx]

        (actor_loss, aux), actor_grads = jax.value_and_grad(
            actor_loss_fn, has_aux=True)(
                bstate.actor_params, bstate.value_params, wm_variables,
                h0, s0, key_img, bstate.return_scale, bstate.step)
        traj, rewards, vals, returns, weights, new_scale = aux

        targets = jax.lax.stop_gradient(returns)
        (value_loss, v_pred), value_grads = jax.value_and_grad(
            value_loss_fn, has_aux=True)(
                bstate.value_params, traj, targets, weights)

        actor_updates, new_actor_opt = actor_opt.update(
            actor_grads, bstate.actor_opt_state, bstate.actor_params)
        value_updates, new_value_opt = value_opt.update(
            value_grads, bstate.value_opt_state, bstate.value_params)

        new_state = BehaviorState(
            step=bstate.step + 1,
            actor_params=optax.apply_updates(bstate.actor_params,
                                             actor_updates),
            value_params=optax.apply_updates(bstate.value_params,
                                             value_updates),
            actor_opt_state=new_actor_opt,
            value_opt_state=new_value_opt,
            return_scale=new_scale,
        )
        metrics = {
            "actor_loss": actor_loss,
            "value_loss": value_loss,
            "imag_return": jnp.mean(returns),
            "imag_reward": jnp.mean(rewards),
            "imag_value": jnp.mean(vals),
            "value_pred": jnp.mean(v_pred),
        }
        if use_return_norm:
            metrics["return_scale"] = new_scale
        return new_state, metrics

    return behavior_step
