"""CEM planner (train/planner.py): config injection, optimizer efficacy
against the model's own reward head, and the planning agent's env contract.

The reference ships no planner (control through its learned model is
unreachable without training a policy); the oracle here is CEM's defining
property — the refined plan must outscore random action sequences under
the exact scoring function it optimizes (rollout_prior -> reward)."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_rssm_tpu.envs import SyntheticEnv
from multimodal_rssm_tpu.models.world_model import WorldModel
from multimodal_rssm_tpu.train import trainer as tr
from multimodal_rssm_tpu.train.planner import (
    PLANNER_DEFAULTS,
    CEMAgent,
    make_cem_planner,
    planner_cfg,
)


def test_planner_cfg_defaults_and_overrides(tiny_cfg):
    cfg = copy.deepcopy(tiny_cfg)
    planner_cfg(cfg)
    assert dict(cfg.planner) == PLANNER_DEFAULTS
    cfg2 = copy.deepcopy(tiny_cfg)
    cfg2["planner"] = {"candidates": 7}
    planner_cfg(cfg2)
    assert cfg2.planner.candidates == 7
    assert cfg2.planner.planning_horizon == PLANNER_DEFAULTS["planning_horizon"]


def test_planner_rejects_more_elites_than_candidates(tiny_cfg):
    cfg = copy.deepcopy(tiny_cfg)
    cfg["planner"] = {"candidates": 8, "top_candidates": 9}
    model = WorldModel.from_config(cfg)
    with pytest.raises(ValueError, match="top_candidates"):
        make_cem_planner(model, cfg)


@pytest.fixture(scope="module")
def planner_setup(tiny_cfg, tiny_buffer):
    """Tiny world model with random-init weights + a filtered (h, s)."""
    cfg = copy.deepcopy(tiny_cfg)
    cfg["planner"] = {
        "planning_horizon": 4,
        "optimisation_iters": 4,
        "candidates": 64,
        "top_candidates": 8,
        "stochastic_rollout": False,  # deterministic scoring for the test
    }
    model = WorldModel.from_config(cfg)
    key = jax.random.PRNGKey(0)
    obs, actions, rewards, nonterminals = tiny_buffer.sample(2, 4)
    spec = tr.build_aug_spec(tiny_buffer)
    from multimodal_rssm_tpu.eval.state_estimation import fixed_draws

    prep = tr.prepare_observations(
        {k: jnp.asarray(v) for k, v in obs.items()}, spec,
        fixed_draws(tiny_buffer, spec), int(cfg.env.bit_depth), key)
    variables = model.init(key, prep, jnp.asarray(actions),
                           jnp.asarray(nonterminals), key)
    h = jnp.zeros((1, int(cfg.rssm.belief_size)), jnp.float32)
    s = jnp.zeros((1, int(cfg.rssm.state_size)), jnp.float32)
    return cfg, model, variables, h, s


def _score_sequences(model, variables, h, s, actions):
    """Deterministic predicted return of [H, N, A] action sequences from
    (h, s) tiled to N — the same objective the planner optimizes."""
    N = actions.shape[1]
    h_rep = jnp.repeat(h, N, axis=0)
    s_rep = jnp.repeat(s, N, axis=0)

    def fn(module, h0, s0, acts):
        roll = module.rollout_prior(h0, s0, acts, None, None, det=True)
        return module.reward(roll["beliefs"], roll["prior_states"])["loc"].sum(0)

    return model.apply(variables, h_rep, s_rep, actions, method=fn)


def test_cem_beats_random_sequences(planner_setup):
    """The refined plan must outscore the bulk of random action sequences
    under the scoring function it optimizes (CEM's defining property)."""
    cfg, model, variables, h, s = planner_setup
    plan = make_cem_planner(model, cfg, full_sequence=True)
    seq = plan(variables, h, s, jax.random.PRNGKey(3))  # [H, 1, A]
    assert seq.shape == (4, 1, int(cfg.env.action_size))
    assert np.all(np.abs(np.asarray(seq)) <= 1.0)

    planned_return = float(_score_sequences(model, variables, h, s, seq)[0])
    rand = jax.random.uniform(
        jax.random.PRNGKey(9), (4, 256, int(cfg.env.action_size)),
        minval=-1.0, maxval=1.0)
    random_returns = np.asarray(
        _score_sequences(model, variables, h, s, rand))
    # beat >= 95% of random sequences (4 iters x 64 candidates explored)
    assert planned_return >= np.quantile(random_returns, 0.95), (
        planned_return, np.quantile(random_returns, 0.95),
        random_returns.max())


def test_cem_planner_deterministic_given_key(planner_setup):
    cfg, model, variables, h, s = planner_setup
    plan = make_cem_planner(model, cfg)
    a1 = plan(variables, h, s, jax.random.PRNGKey(5))
    a2 = plan(variables, h, s, jax.random.PRNGKey(5))
    a3 = plan(variables, h, s, jax.random.PRNGKey(6))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert a1.shape == (1, int(cfg.env.action_size))
    assert not np.allclose(np.asarray(a1), np.asarray(a3))


@pytest.mark.slow
def test_run_online_planet_mode(tiny_cfg, tmp_path):
    """online.collect_policy=cem is the PlaNet loop: world-model updates +
    planned collection, no behavior training or checkpoint at all."""
    import json
    import os

    from multimodal_rssm_tpu.io.metrics import MetricLogger
    from multimodal_rssm_tpu.train.online import online_cfg, run_online

    cfg = copy.deepcopy(tiny_cfg)
    cfg.online = {
        "seed_episodes": 2,
        "episodes": 2,
        "collect_interval": 1,
        "checkpoint_interval": 2,
        "collect_policy": "cem",
    }
    cfg["planner"] = {
        "planning_horizon": 3,
        "optimisation_iters": 2,
        "candidates": 16,
        "top_candidates": 4,
    }
    online_cfg(cfg)
    env = SyntheticEnv(length=12, seed=0)
    logger = MetricLogger(str(tmp_path))
    state, bstate = run_online(cfg, env, str(tmp_path), logger,
                               jax.random.PRNGKey(0), progress=False)
    logger.finish()
    assert bstate is None
    rows = [json.loads(l) for l in open(os.path.join(tmp_path,
                                                     "metrics.jsonl"))]
    online_rows = [r for r in rows if "episode_reward/online" in r]
    assert len(online_rows) == 2
    for r in online_rows:
        assert np.isfinite(r["wm_loss/online"])
        assert "actor_loss/online" not in r
    assert os.path.exists(os.path.join(tmp_path, "models_2.msgpack"))
    assert not os.path.exists(os.path.join(tmp_path, "behavior"))
    assert int(state.step) == 2


def test_reward_head_guard(tiny_cfg):
    """The CLI surfaces (--policy cem, export --plan) must refuse a run
    trained with predict_reward=False: the reward head is random init and
    plans against it are meaningless."""
    from multimodal_rssm_tpu.train.planner import check_reward_head_trained

    cfg = copy.deepcopy(tiny_cfg)
    cfg.rssm.predict_reward = False
    with pytest.raises(ValueError, match="predict_reward"):
        check_reward_head_trained(cfg)
    cfg.rssm.predict_reward = True
    check_reward_head_trained(cfg)  # no raise


def test_online_cfg_rejects_unknown_collect_policy(tiny_cfg):
    from multimodal_rssm_tpu.train.online import online_cfg

    cfg = copy.deepcopy(tiny_cfg)
    cfg.online = {"collect_policy": "nope"}
    with pytest.raises(ValueError, match="collect_policy"):
        online_cfg(cfg)


def test_cem_agent_env_contract(planner_setup, tiny_buffer):
    """CEMAgent: bounded actions, belief carried across frames, no
    behavior checkpoint involved."""
    cfg, model, variables, _, _ = planner_setup
    env = SyntheticEnv(length=4, seed=0)
    agent = CEMAgent(cfg, model, tiny_buffer)
    obs = env.reset(seed=1)
    h_before = np.asarray(agent.h)
    a1 = agent(variables, None, obs, jax.random.PRNGKey(1))
    assert a1.shape == (int(cfg.env.action_size),)
    assert np.all(np.abs(a1) <= 1.0)
    assert not np.allclose(h_before, np.asarray(agent.h))
    obs2, _, _ = env.step(a1)
    a2 = agent(variables, None, obs2, jax.random.PRNGKey(2))
    assert np.all(np.abs(a2) <= 1.0)
