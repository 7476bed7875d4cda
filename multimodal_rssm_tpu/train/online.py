"""Online Dreamer training: environment interaction in the loop.

The reference trains only from pre-collected episodes (SURVEY §1: "trains
a GRU-based recurrent state-space model from pre-collected demonstration
episodes"); its replay buffer nevertheless ships an online ``append``
(memory.py:225-238) and its model zoo ships actor/value heads — the
pieces of the Dreamer agent it never assembled.  This module assembles
them: alternate (a) world-model updates on replayed chunks, (b) behavior
(actor-critic-in-imagination) updates through the frozen current world
model (train/behavior.py), and (c) episode collection in a real
environment (multimodal_rssm_tpu/envs/) with the latent-space agent
(train/agent.py), appending experience back into the ring buffer.

Layout of one outer iteration (Dreamer, Hafner et al. 2020):

    for _ in range(collect_interval):        # learn
        world-model step on D.sample(B, L)
        behavior step through the updated world model
    collect one episode with the actor (+ exploration noise) -> D.append

Seeding uses ``seed_episodes`` random-policy episodes so the first
samples exist.  ``rssm.predict_reward`` is forcibly enabled: imagination
returns come from the learned reward head, so it must be trained (the
reference's offline configs ship ``predict_reward: False``).

``online.collect_policy="cem"`` switches the loop to the family's other
canonical agent, PlaNet (Hafner et al. 2019): collection plans through
the world model's reward head every step (train/planner.py) and behavior
(actor-critic) training is skipped entirely.
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rssm_tpu.data.buffer import build_buffer
from multimodal_rssm_tpu.io import checkpoint as ckpt
from multimodal_rssm_tpu.models.world_model import WorldModel
from multimodal_rssm_tpu.train import behavior as bh
from multimodal_rssm_tpu.train import trainer as tr
from multimodal_rssm_tpu.train.agent import LatentAgent
from multimodal_rssm_tpu.train.loop import _device_batch
from multimodal_rssm_tpu.train.prefetch import Prefetcher


ONLINE_DEFAULTS = {
    # random-policy episodes before learning starts
    "seed_episodes": 5,
    # actor-driven episodes to collect (the outer loop length)
    "episodes": 50,
    # (world-model + behavior) update steps per collected episode
    # (Dreamer: 100)
    "collect_interval": 100,
    # exploration noise scale; None -> cfg.train.action_noise (the
    # reference config key its offline path never reads, train.yaml:20)
    "expl_noise": None,
    "checkpoint_interval": 10,  # episodes
    # "actor": Dreamer (actor-critic in imagination drives collection);
    # "cem": PlaNet (collection by CEM planning through the model's reward
    # head, train/planner.py — no behavior training at all)
    "collect_policy": "actor",
}


def online_cfg(cfg):
    """Inject ``cfg.online`` + ``cfg.behavior`` defaults and enable the
    reward head (imagination returns need it)."""
    section = dict(ONLINE_DEFAULTS)
    section.update(dict(cfg.get("online", {}) or {}))
    cfg["online"] = section
    if section["collect_policy"] not in ("actor", "cem"):
        raise ValueError(
            f"online.collect_policy must be 'actor' or 'cem', got "
            f"{section['collect_policy']!r}")
    bh.behavior_cfg(cfg)
    if not cfg.rssm.predict_reward:
        print("online training: enabling rssm.predict_reward "
              "(imagination returns use the learned reward head)")
        cfg.rssm.predict_reward = True
    if section["expl_noise"] is not None:
        cfg.train.action_noise = float(section["expl_noise"])
    return cfg


def collect_episode(env, D, agent: Optional[LatentAgent], wm_variables,
                    actor_params, key, rng, seed: int,
                    explore: bool = True) -> Dict[str, float]:
    """One episode into the buffer.  ``agent=None``: uniform random policy
    (the seed phase).  Observations are appended raw (uint8 frames).

    Row convention matches the reference datasets: row t = (o_t, a_t, r_t)
    where a_t is the action taken FROM o_t (the COBOTTA ``d_pose`` channels
    are forward differences, pose_processing.py — data/pose.py:116-121),
    which is exactly the (actions[:-1], obs[1:]) pairing the trainer scans
    (ref base/algo.py:234-242).  The terminal observation is dropped, like
    the dataset builder's episodes.
    """
    obs = env.reset(seed=seed)
    if agent is not None:
        agent.reset()
    total_reward, steps, done = 0.0, 0, False
    while not done:
        if agent is None:
            action = rng.uniform(-1.0, 1.0, env.action_size).astype(
                np.float32)
        else:
            key, k = jax.random.split(key)
            action = agent(wm_variables, actor_params, obs, k,
                           explore=explore)
        next_obs, reward, done = env.step(action)
        D.append(obs, action, reward, done, raw=True)
        obs = next_obs
        total_reward += float(reward)
        steps += 1
    return {"episode_reward": total_reward, "episode_steps": float(steps)}


def run_online(cfg, env, results_dir: str, logger, key,
               progress: bool = True):
    """The full online loop; returns (train_state, behavior_state)."""
    o = cfg.online
    seed = int(cfg.main.seed or 0)
    rng = np.random.default_rng(seed)
    B, L = int(cfg.train.batch_size), int(cfg.train.chunk_size)

    D = build_buffer(cfg, seed=seed)
    for ep in range(int(o.seed_episodes)):
        m = collect_episode(env, D, None, None, None, None, rng,
                            seed=seed * 10_000 + ep)
        logger.log(m, ep, "seed")
    if D.idx <= L and not D.full:
        raise ValueError(
            f"seed data too short: {D.idx} steps buffered, chunk_size={L}; "
            f"raise online.seed_episodes or the env episode length"
        )

    model = WorldModel.from_config(cfg, dtype=tr.compute_dtype(cfg))
    optimizer = tr.build_optimizer(cfg)
    aug_spec = tr.build_aug_spec(D)
    draws = tr.HostAugmentDraws(D, aug_spec, seed=seed)
    train_step, _ = tr.make_train_step(model, cfg, optimizer, aug_spec)

    key, init_key, prep_key = jax.random.split(key, 3)
    sample = D.sample(B, L)
    prep = tr.prepare_observations(
        {k: jnp.asarray(v) for k, v in sample[0].items()},
        aug_spec, draws.draw(), int(cfg.env.bit_depth), prep_key,
    )
    state = tr.init_train_state(
        model, cfg, optimizer, init_key,
        (prep, jnp.asarray(sample[1]), jnp.asarray(sample[2]),
         jnp.asarray(sample[3])),
    )

    planning = str(o.collect_policy) == "cem"
    if planning:
        # PlaNet: no behavior training — collection plans through the
        # world model's reward head every step
        from multimodal_rssm_tpu.train.planner import CEMAgent

        bstate = None
        behavior_step = None
        agent = CEMAgent(cfg, model, D)
    else:
        actor, value = bh.build_policy_models(cfg)
        actor_opt, value_opt = bh.build_behavior_optimizers(cfg)
        key, bh_key = jax.random.split(key)
        bstate = bh.init_behavior_state(cfg, actor, value, actor_opt,
                                        value_opt, bh_key)
        behavior_step = bh.make_behavior_step(model, cfg, actor, value,
                                              actor_opt, value_opt, aug_spec)
        agent = LatentAgent(cfg, model, actor, D)

    episodes = int(o.episodes)
    updates = int(o.collect_interval)
    wm_metrics = bh_metrics = {}
    for episode in range(1, episodes + 1):
        # Overlap host gather + upload with device compute during the
        # update block (same pattern as train/loop.py:138); the prefetcher
        # is closed before collection so no sampler thread races the
        # buffer's append-time ring writes.
        prefetcher = Prefetcher(lambda: _device_batch(D.sample(B, L)),
                                depth=2)
        try:
            for _ in range(updates):
                key, k1, k2 = jax.random.split(key, 3)
                state, wm_metrics = train_step(
                    state, prefetcher.get(), draws.draw(), k1)
                if behavior_step is not None:
                    wm_variables = {"params": state.params,
                                    "batch_stats": state.batch_stats}
                    bstate, bh_metrics = behavior_step(
                        bstate, wm_variables, prefetcher.get(),
                        draws.draw(), k2)
        finally:
            prefetcher.close()

        key, k = jax.random.split(key)
        wm_variables = {"params": state.params,
                        "batch_stats": state.batch_stats}
        ep_metrics = collect_episode(
            env, D, agent, wm_variables,
            None if bstate is None else bstate.actor_params, k, rng,
            seed=seed * 10_000 + 7_000 + episode,
        )
        host = {**ep_metrics,
                **{f"wm_{k2}": float(v)
                   for k2, v in jax.device_get(wm_metrics).items()},
                **{k2: float(v)
                   for k2, v in jax.device_get(bh_metrics).items()}}
        logger.log(host, episode, "online")
        if progress:
            line = (f"[episode {episode}/{episodes}] "
                    f"reward {host['episode_reward']:.3f} "
                    f"wm_loss {host.get('wm_loss', float('nan')):.2f}")
            if not planning:
                line += f" actor {host.get('actor_loss', float('nan')):.3f}"
            print(line, flush=True)
        if episode % int(o.checkpoint_interval) == 0 or episode == episodes:
            ckpt.save_checkpoint(results_dir, episode, state)
            if bstate is not None:
                ckpt.save_checkpoint(
                    _subdir(results_dir, "behavior"), episode, bstate)
    return state, bstate


def _subdir(results_dir: str, name: str) -> str:
    import os

    path = os.path.join(results_dir, name)
    os.makedirs(path, exist_ok=True)
    return path
