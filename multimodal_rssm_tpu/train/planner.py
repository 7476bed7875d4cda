"""PlaNet-style CEM planner: model-predictive control in latent space.

The reference is a PlaNet/Dreamer-family world model (SURVEY §0) that
ships actor/value heads but no way to *act* through the learned model —
its training pipeline never reads them, and control would require training
a policy first (our train/behavior.py makes that path live).  The planner
closes the remaining gap from the family's original recipe (PlaNet,
Hafner et al. 2019): zero-shot control from a trained world model alone by
optimizing an action sequence against the model's own reward head with the
cross-entropy method (CEM) — no policy network, no extra training.

TPU shape: the J candidate rollouts ARE the batch axis of one
``rollout_prior`` scan (rssm/core.py), so each CEM iteration is a single
[H, J, ·] batched program on the MXU — no Python loop over candidates; the
optimisation iterations are a ``lax.scan``, so the whole plan is one XLA
program.  The recurrence reuses the exact training cell, so planning is
numerically consistent with training and imagination.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rssm_tpu.models.world_model import WorldModel
from multimodal_rssm_tpu.train import trainer as tr
from multimodal_rssm_tpu.train.agent import LatentAgent

# PlaNet's published hyperparameters (horizon/iters/candidates/elites);
# injected as cfg.planner (overridable via dotted CLI overrides, recorded
# in the saved run config like every other group — behavior.py pattern).
PLANNER_DEFAULTS = {
    "planning_horizon": 12,
    "optimisation_iters": 10,
    "candidates": 1000,
    "top_candidates": 100,
    # sample latent-state noise during candidate rollouts (PlaNet's choice;
    # False scores candidates on the prior means)
    "stochastic_rollout": True,
}


def planner_cfg(cfg):
    """Inject ``cfg.planner`` defaults (see PLANNER_DEFAULTS)."""
    section = dict(PLANNER_DEFAULTS)
    section.update(dict(cfg.get("planner", {}) or {}))
    cfg["planner"] = section
    return cfg


def check_reward_head_trained(cfg, what: str = "CEM planning"):
    """Fail loudly when the run's reward head was never trained.

    The planner maximizes the model's reward predictions, but the shipped
    offline configs set ``rssm.predict_reward: False`` (the reference's
    default — its loss zeroes the reward term, so the head's parameters
    stay at their random init).  Planning against that head returns
    meaningless actions with healthy-looking statistics; the saved run
    config records the truth, so refuse instead.  Escape hatch: pass
    ``rssm.predict_reward=true`` as an explicit CLI override.
    """
    if not cfg.rssm.predict_reward:
        raise ValueError(
            f"{what} optimizes the model's reward head, but this run was "
            "trained with rssm.predict_reward=False (the reward loss was "
            "zeroed, so the head is untrained random init) — its plans "
            "would be meaningless.  Train with rssm.predict_reward=True "
            "(train_online.py enables it automatically), or override "
            "rssm.predict_reward=true explicitly if you know the head is "
            "trained."
        )


def make_cem_planner(model: WorldModel, cfg, full_sequence: bool = False):
    """Build ``plan(wm_variables, h, s, key) -> action [B, A]``.

    ``h``/``s`` are the current posterior (belief, state) from the
    streaming filter, batch size B (planning vmaps over B x J candidate
    rollouts in one program; B is 1 for a single robot).  Returns the first
    action of the CEM-refined mean sequence, clipped to the tanh range
    (``full_sequence=True``: the whole [H, B, A] mean plan, for MPC
    diagnostics and tests).
    """
    planner_cfg(cfg)
    p = cfg.planner
    H = int(p.planning_horizon)
    iters = int(p.optimisation_iters)
    J = int(p.candidates)
    K = int(p.top_candidates)
    stochastic = bool(p.stochastic_rollout)
    if K > J:
        raise ValueError(f"planner.top_candidates ({K}) > candidates ({J})")
    A = int(cfg.env.action_size)

    def _score(module, h0, s0, actions, key):
        """Predicted return of each candidate: sum_t E[r_t] over the
        open-loop prior rollout (the imagination path, world_model.py
        rollout_prior -> reward)."""
        roll = module.rollout_prior(h0, s0, actions, None, key,
                                    det=not stochastic)
        r = module.reward(roll["beliefs"], roll["prior_states"])
        return r["loc"].sum(0)  # [B*J]

    def plan(wm_variables, h, s, key):
        B = h.shape[0]
        # tile (h, s) to B*J rows: candidate j of batch row b at index b*J+j
        h_rep = jnp.repeat(h, J, axis=0)
        s_rep = jnp.repeat(s, J, axis=0)

        def iter_body(carry, _):
            mean, std, key = carry  # mean/std [H, B, A]
            key, k_act, k_roll = jax.random.split(key, 3)
            eps = jax.random.normal(k_act, (H, B, J, A), jnp.float32)
            actions = jnp.clip(mean[:, :, None] + std[:, :, None] * eps,
                               -1.0, 1.0)
            flat = actions.reshape(H, B * J, A)
            returns = model.apply(wm_variables, h_rep, s_rep, flat,
                                  k_roll, method=_score)
            returns = returns.reshape(B, J)
            _, idx = jax.lax.top_k(returns, K)           # [B, K]
            # elites: [H, B, K, A]
            elite = jnp.take_along_axis(
                actions, idx[None, :, :, None], axis=2)
            mean = elite.mean(axis=2)
            std = elite.std(axis=2) + 1e-6  # keep the next draw non-degenerate
            return (mean, std, key), None

        init = (jnp.zeros((H, B, A), jnp.float32),
                jnp.ones((H, B, A), jnp.float32), key)
        (mean, _, _), _ = jax.lax.scan(iter_body, init, None, length=iters)
        mean = jnp.clip(mean, -1.0, 1.0)
        return mean if full_sequence else mean[0]  # [H, B, A] | [B, A]

    return plan


class CEMAgent(LatentAgent):
    """LatentAgent with CEM planning in place of the actor head.

    Same streaming posterior filter and eval-pipeline frame normalization;
    the action comes from :func:`make_cem_planner`, so a trained world
    model is sufficient — no behavior checkpoint needed.  The
    ``actor_params`` call argument is accepted (LatentAgent calling
    convention) and ignored; pass ``None``.
    """

    def __init__(self, cfg, model: WorldModel, buffer):
        planner_cfg(cfg)
        super().__init__(cfg, model, actor=None, buffer=buffer)

    def _build_step(self):
        spec, draws, bit_depth = self.spec, self.draws, self.bit_depth
        model = self.model
        noise_scale = self.action_noise
        plan = make_cem_planner(model, self.cfg)

        def step(wm_variables, actor_params, h, s, prev_action, obs, key,
                 explore: bool, det: bool):
            del actor_params, det  # planning is already the greedy policy
            k_prep, k_plan, k_noise = jax.random.split(key, 3)
            obs = {k: v[None, None] for k, v in obs.items()}
            prepared = tr.prepare_observations(obs, spec, draws, bit_depth,
                                               k_prep)
            frame = {k: v[0] for k, v in prepared.items()}
            states = model.apply(
                wm_variables, h, s, prev_action, frame,
                det=True, train=False, method=model.filter_step,
            )
            h2 = states["beliefs"]
            s2 = states["posterior_means"]
            action = plan(wm_variables, h2, s2, k_plan)
            if explore and noise_scale > 0.0:
                action = action + noise_scale * jax.random.normal(
                    k_noise, action.shape, jnp.float32
                )
                action = jnp.clip(action, -1.0, 1.0)
            return h2, s2, action

        return jax.jit(step, static_argnames=("explore", "det"))

    def __call__(self, wm_variables, actor_params=None,
                 obs: Optional[dict] = None, key=None,
                 explore: bool = False, det: bool = True) -> np.ndarray:
        return super().__call__(wm_variables, actor_params, obs, key,
                                explore=explore, det=det)
