"""Online Dreamer loop (train/online.py + train/agent.py + envs/):
environment contract, latent-agent step, and a micro end-to-end run that
collects with the learned actor and appends into the ring buffer.  The
reference has no online loop (SURVEY §1: offline-only); the oracle is the
subsystem's own contracts."""

import copy

import jax
import numpy as np
import pytest

from multimodal_rssm_tpu.envs import SyntheticEnv, make_env


def test_synthetic_env_contract():
    env = SyntheticEnv(length=5, seed=3)
    obs = env.reset(seed=3)
    assert obs["image_horizon"].shape == (64, 64, 3)
    assert obs["image_horizon"].dtype == np.uint8
    assert obs["sound"].shape == (128, 20)
    assert obs["sound"].dtype == np.float32
    total = 0
    done = False
    while not done:
        obs, reward, done = env.step(np.array([1.0, 0.0, 0.0]))
        assert np.isfinite(reward)
        total += 1
    assert total == 5
    # same seed -> same initial observation
    o1 = env.reset(seed=11)
    o2 = SyntheticEnv(length=5, seed=11).reset(seed=11)
    np.testing.assert_array_equal(o1["image_horizon"], o2["image_horizon"])
    np.testing.assert_array_equal(o1["sound"], o2["sound"])


def test_synthetic_env_observations_carry_state():
    """Moving the agent must change both modalities (otherwise the world
    model has nothing to learn from them)."""
    env = SyntheticEnv(length=10, seed=0)
    o0 = env.reset(seed=0)
    for _ in range(4):
        o1, _, _ = env.step(np.array([1.0, 1.0, 0.0]))
    assert not np.array_equal(o0["image_horizon"], o1["image_horizon"])
    assert not np.allclose(o0["sound"], o1["sound"])


def test_make_env_dispatch():
    assert isinstance(make_env("synthetic", length=3), SyntheticEnv)
    with pytest.raises(ValueError):
        make_env("nope")


@pytest.fixture(scope="module")
def online_cfg_tiny(tiny_cfg):
    from multimodal_rssm_tpu.train.online import online_cfg

    cfg = copy.deepcopy(tiny_cfg)
    cfg.online = {
        "seed_episodes": 2,
        "episodes": 2,
        "collect_interval": 1,
        "checkpoint_interval": 2,
    }
    cfg.behavior = {"horizon": 4}
    online_cfg(cfg)
    assert cfg.rssm.predict_reward  # forcibly enabled
    return cfg


@pytest.mark.slow
def test_run_online_micro(online_cfg_tiny, tmp_path):
    """Two seed episodes -> two online episodes with 1 update each: the
    buffer grows by every collected step, losses stay finite, both
    checkpoints land."""
    from multimodal_rssm_tpu.io.metrics import MetricLogger
    from multimodal_rssm_tpu.train.online import run_online

    cfg = online_cfg_tiny
    env = SyntheticEnv(length=12, seed=0)
    logger = MetricLogger(str(tmp_path))
    state, bstate = run_online(cfg, env, str(tmp_path), logger,
                               jax.random.PRNGKey(0), progress=False)
    logger.finish()

    import json
    import os

    rows = [json.loads(l) for l in open(os.path.join(tmp_path,
                                                     "metrics.jsonl"))]
    seed_rows = [r for r in rows if "episode_reward/seed" in r]
    online_rows = [r for r in rows if "episode_reward/online" in r]
    assert len(seed_rows) == 2 and len(online_rows) == 2
    for r in online_rows:
        assert np.isfinite(r["wm_loss/online"])
        assert np.isfinite(r["actor_loss/online"])
        assert np.isfinite(r["value_loss/online"])
        assert r["episode_steps/online"] == 12.0
    # world-model checkpoint at top level, behavior checkpoint nested
    assert os.path.exists(os.path.join(tmp_path, "models_2.msgpack"))
    assert os.path.exists(os.path.join(tmp_path, "behavior",
                                       "models_2.msgpack"))
    assert int(state.step) == 2  # collect_interval * episodes
    assert int(bstate.step) == 2


def test_latent_agent_carries_state(online_cfg_tiny):
    """The agent's (belief, state) must evolve across frames and its
    actions stay in the tanh range."""
    from multimodal_rssm_tpu.data.buffer import build_buffer
    from multimodal_rssm_tpu.models.world_model import WorldModel
    from multimodal_rssm_tpu.train import behavior as bh
    from multimodal_rssm_tpu.train import trainer as tr
    from multimodal_rssm_tpu.train.agent import LatentAgent

    cfg = online_cfg_tiny
    env = SyntheticEnv(length=4, seed=1)
    D = build_buffer(cfg)
    model = WorldModel.from_config(cfg)

    # variables via init on a tiny chunk
    key = jax.random.PRNGKey(0)
    obs = env.reset(seed=1)
    chunk = {k: np.stack([v, v])[:, None] for k, v in obs.items()}
    spec = tr.build_aug_spec(D)
    from multimodal_rssm_tpu.eval.state_estimation import fixed_draws

    prep = tr.prepare_observations(
        {k: jax.numpy.asarray(v) for k, v in chunk.items()},
        spec, fixed_draws(D, spec), int(cfg.env.bit_depth), key)
    actions = np.zeros((2, 1, int(cfg.env.action_size)), np.float32)
    nt = np.ones((2, 1, 1), np.float32)
    variables = model.init(key, prep, jax.numpy.asarray(actions),
                           jax.numpy.asarray(nt), key)

    actor, _ = bh.build_policy_models(cfg)
    h = np.zeros((1, int(cfg.rssm.belief_size)), np.float32)
    s = np.zeros((1, int(cfg.rssm.state_size)), np.float32)
    actor_params = actor.init(key, jax.numpy.asarray(h),
                              jax.numpy.asarray(s), key)["params"]

    agent = LatentAgent(cfg, model, actor, D)
    agent.reset()
    h_before = np.asarray(agent.h)
    a1 = agent(variables, actor_params, obs, jax.random.PRNGKey(1),
               explore=True)
    h_after = np.asarray(agent.h)
    assert a1.shape == (int(cfg.env.action_size),)
    assert np.all(np.abs(a1) <= 1.0)
    assert not np.allclose(h_before, h_after)
    obs2, _, _ = env.step(a1)
    a2 = agent(variables, actor_params, obs2, jax.random.PRNGKey(2))
    assert np.all(np.abs(a2) <= 1.0)
    h_third = np.asarray(agent.h)
    assert not np.allclose(h_after, h_third)


class _CounterEnv:
    """Probe env: sound[0, 0] encodes the frame index so the buffer row
    convention is directly observable."""

    observation_names = ("image_horizon", "sound")
    action_size = 3

    def __init__(self, length=6):
        self.length = length

    def reset(self, seed=None):
        self.t = 0
        return self._obs()

    def step(self, action):
        self.t += 1
        return self._obs(), float(self.t), self.t >= self.length

    def _obs(self):
        sound = np.zeros((128, 20), np.float32)
        sound[0, 0] = float(self.t)
        return {"image_horizon": np.zeros((64, 64, 3), np.uint8),
                "sound": sound}


def test_collect_episode_row_convention(online_cfg_tiny):
    """Row t must hold the PRE-step observation with the action taken from
    it (the reference d_pose channels are forward differences,
    data/pose.py:116-121) — the (actions[:-1], obs[1:]) pairing the
    trainer scans.  The terminal observation is dropped."""
    from multimodal_rssm_tpu.data.buffer import build_buffer
    from multimodal_rssm_tpu.train.online import collect_episode

    cfg = online_cfg_tiny
    D = build_buffer(cfg)
    env = _CounterEnv(length=6)
    m = collect_episode(env, D, None, None, None, None,
                        np.random.default_rng(0), seed=0)
    assert m["episode_steps"] == 6.0
    counters = D.observations["sound"][:6, 0, 0]
    np.testing.assert_array_equal(counters, np.arange(6, dtype=np.float32))
    # rewards align with the transition taken from row t
    np.testing.assert_array_equal(D.rewards[:6],
                                  np.arange(1, 7, dtype=np.float32))
    # terminal flag on the last row only
    np.testing.assert_array_equal(D.nonterminals[:6, 0],
                                  [1, 1, 1, 1, 1, 0])


def test_evaluate_policy(online_cfg_tiny):
    """Greedy policy eval: N episodes, finite returns, det actions in the
    tanh range (exercises the reference actor's mode-seeking det path)."""
    from multimodal_rssm_tpu.data.buffer import build_buffer
    from multimodal_rssm_tpu.eval.policy import evaluate_policy
    from multimodal_rssm_tpu.eval.state_estimation import fixed_draws
    from multimodal_rssm_tpu.models.world_model import WorldModel
    from multimodal_rssm_tpu.train import behavior as bh
    from multimodal_rssm_tpu.train import trainer as tr

    cfg = online_cfg_tiny
    env = SyntheticEnv(length=3, seed=0)
    D = build_buffer(cfg)
    model = WorldModel.from_config(cfg)
    key = jax.random.PRNGKey(0)
    obs = env.reset(seed=0)
    chunk = {k: np.stack([v, v])[:, None] for k, v in obs.items()}
    spec = tr.build_aug_spec(D)
    prep = tr.prepare_observations(
        {k: jax.numpy.asarray(v) for k, v in chunk.items()},
        spec, fixed_draws(D, spec), int(cfg.env.bit_depth), key)
    actions = np.zeros((2, 1, int(cfg.env.action_size)), np.float32)
    nt = np.ones((2, 1, 1), np.float32)
    variables = model.init(key, prep, jax.numpy.asarray(actions),
                           jax.numpy.asarray(nt), key)

    actor, _ = bh.build_policy_models(cfg)
    h = jax.numpy.zeros((1, int(cfg.rssm.belief_size)))
    s = jax.numpy.zeros((1, int(cfg.rssm.state_size)))
    actor_params = actor.init(key, h, s, key)["params"]

    stats = evaluate_policy(cfg, env, model, variables, actor,
                            actor_params, episodes=2, seed=1, det=True)
    assert len(stats["returns"]) == 2
    assert np.isfinite(stats["mean_return"])
    assert stats["mean_steps"] == 3.0
