"""Policy evaluation: greedy rollouts of a trained actor in an environment.

The eval counterpart of online/behavior training: run the latent-space
agent (train/agent.py — streaming ``filter_step`` posterior + the
reference's ``ActorModel``) without exploration noise for N episodes and
report the return statistics.  ``det=True`` uses the reference actor's
100-sample mode-seeking action (policy.py:103-138) — the "greedy" policy
its code defines but never exercises.
"""

from typing import Dict, List

import jax
import numpy as np

from multimodal_rssm_tpu.data.buffer import build_buffer
from multimodal_rssm_tpu.train.agent import LatentAgent


def evaluate_policy(cfg, env, model, wm_variables, actor, actor_params,
                    episodes: int = 5, seed: int = 0,
                    det: bool = True, agent=None) -> Dict[str, object]:
    """Returns {"returns": [...], "mean_return", "std_return",
    "mean_steps"} over ``episodes`` greedy episodes.

    ``agent``: a pre-built LatentAgent-compatible agent (e.g.
    planner.CEMAgent, which ignores ``actor``/``actor_params``); default
    builds the actor-head agent."""
    if agent is None:
        agent = LatentAgent(cfg, model, actor, build_buffer(cfg))
    key = jax.random.PRNGKey(seed)
    returns: List[float] = []
    steps_list: List[float] = []
    final_rewards: List[float] = []
    best_rewards: List[float] = []
    for ep in range(episodes):
        obs = env.reset(seed=seed * 10_000 + ep)
        agent.reset()
        total, steps, done = 0.0, 0, False
        last_r, best_r = 0.0, -np.inf
        while not done:
            key, k = jax.random.split(key)
            action = agent(wm_variables, actor_params, obs, k, det=det)
            obs, reward, done = env.step(action)
            total += float(reward)
            last_r = float(reward)
            best_r = max(best_r, last_r)
            steps += 1
        returns.append(total)
        steps_list.append(float(steps))
        final_rewards.append(last_r)
        best_rewards.append(best_r)
    return {
        "returns": returns,
        "mean_return": float(np.mean(returns)),
        "std_return": float(np.std(returns)),
        "mean_steps": float(np.mean(steps_list)),
        # per-episode terminal / best per-step reward: for distance-shaped
        # envs (envs/peg.py: reward = -tip-to-hole distance) these give a
        # success proxy — e.g. best_reward > -0.08 means the tip entered
        # the hole mouth at some point
        "final_rewards": final_rewards,
        "best_rewards": best_rewards,
    }
