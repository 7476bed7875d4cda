"""Deployment-time latent-space agent.

Pairs the world model's streaming posterior filter
(``WorldModel.filter_step`` — the per-frame form of the reference's
whole-sequence ``estimate_state``, base/algo.py:337-366) with the
reference's ``ActorModel`` head (utils/models/policy.py:103-138) to act in
a real environment: each step normalizes the incoming frame exactly like
the eval pipeline (center crop, no noise — eval/state_estimation.fixed_draws),
folds it into the carried (belief, state) posterior, and samples an action.

One jitted function serves the whole episode; world-model variables and
actor parameters are call arguments, so updated parameters (online
training) never trigger a recompile.
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rssm_tpu.eval.state_estimation import fixed_draws
from multimodal_rssm_tpu.models.policy import ActorModel
from multimodal_rssm_tpu.models.world_model import WorldModel, effective_state_size
from multimodal_rssm_tpu.train import trainer as tr


class LatentAgent:
    """Carries (belief, state, prev_action) across env steps.

    ``explore`` adds Gaussian action noise of scale
    ``cfg.train.action_noise`` (the reference config key, train.yaml:20,
    that its offline pipeline never reads) and clips to the tanh range.
    """

    def __init__(self, cfg, model: WorldModel, actor: ActorModel, buffer):
        self.cfg = cfg
        self.model = model
        self.actor = actor
        self.spec = tr.build_aug_spec(buffer)
        self.draws = fixed_draws(buffer, self.spec)
        self.bit_depth = int(cfg.env.bit_depth)
        self.action_noise = float(cfg.train.action_noise or 0.0)
        self.belief_size = int(cfg.rssm.belief_size)
        self.state_size = effective_state_size(cfg)
        self.action_size = int(cfg.env.action_size)
        self._step = self._build_step()
        self.reset()

    def reset(self):
        self.h = jnp.zeros((1, self.belief_size), jnp.float32)
        self.s = jnp.zeros((1, self.state_size), jnp.float32)
        self.prev_action = jnp.zeros((1, self.action_size), jnp.float32)

    def _build_step(self):
        spec, draws, bit_depth = self.spec, self.draws, self.bit_depth
        model, actor = self.model, self.actor
        noise_scale = self.action_noise

        def step(wm_variables, actor_params, h, s, prev_action, obs, key,
                 explore: bool, det: bool):
            k_prep, k_act, k_noise = jax.random.split(key, 3)
            obs = {k: v[None, None] for k, v in obs.items()}  # [T=1, B=1,…]
            prepared = tr.prepare_observations(obs, spec, draws, bit_depth,
                                               k_prep)
            frame = {k: v[0] for k, v in prepared.items()}    # [B=1, …]
            states = model.apply(
                wm_variables, h, s, prev_action, frame,
                det=True, train=False, method=model.filter_step,
            )
            h2 = states["beliefs"]
            s2 = states["posterior_means"]
            # det=True: the reference ActorModel's 100-sample mode-seeking
            # action (policy.py:103-138) — the greedy evaluation policy
            action = actor.apply({"params": actor_params}, h2, s2, k_act,
                                 det=det)
            if explore and noise_scale > 0.0:
                action = action + noise_scale * jax.random.normal(
                    k_noise, action.shape, jnp.float32
                )
                action = jnp.clip(action, -1.0, 1.0)
            return h2, s2, action

        return jax.jit(step, static_argnames=("explore", "det"))

    def __call__(self, wm_variables, actor_params,
                 obs: Dict[str, np.ndarray], key,
                 explore: bool = False, det: bool = False) -> np.ndarray:
        """Incorporate one observation frame and return the action [A].

        Extra modalities the model does not encode are tolerated (the
        encoder selects by ``observation_names_enc``)."""
        obs = {k: jnp.asarray(np.asarray(v)) for k, v in obs.items()}
        self.h, self.s, action = self._step(
            wm_variables, actor_params, self.h, self.s, self.prev_action,
            obs, key, explore, det,
        )
        self.prev_action = action
        return np.asarray(jax.device_get(action))[0]
