"""Dreamer-style behavior learning (train/behavior.py): TD(lambda) golden
values, imagination rollout contract, and the actor-critic step improving a
fixed objective — the reference ships these policy heads untrained
(utils/models/policy.py; SURVEY §2 "never imported by the training path"),
so the oracle here is the algorithm's own math, not reference code."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def naive_lambda_returns(rewards, values, bootstrap, discount, lam):
    """Reference implementation: the recursive definition, computed
    backwards in plain Python (Dreamer eq. 6)."""
    H = rewards.shape[0]
    next_values = np.concatenate([values[1:], bootstrap[None]], axis=0)
    ret = bootstrap.copy()
    out = np.zeros_like(rewards)
    for t in reversed(range(H)):
        ret = rewards[t] + discount * (
            (1.0 - lam) * next_values[t] + lam * ret
        )
        out[t] = ret
    return out


def test_lambda_returns_matches_naive():
    from multimodal_rssm_tpu.train.behavior import lambda_returns

    rng = np.random.default_rng(0)
    H, B = 14, 5
    rewards = rng.normal(size=(H, B)).astype(np.float32)
    values = rng.normal(size=(H, B)).astype(np.float32)
    bootstrap = rng.normal(size=(B,)).astype(np.float32)
    got = np.asarray(lambda_returns(jnp.asarray(rewards), jnp.asarray(values),
                                    jnp.asarray(bootstrap), 0.99, 0.95))
    want = naive_lambda_returns(rewards, values, bootstrap, 0.99, 0.95)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_lambda_returns_limits():
    """lam=0 -> one-step TD target; lam=1 -> discounted Monte-Carlo sum with
    bootstrap tail."""
    from multimodal_rssm_tpu.train.behavior import lambda_returns

    rng = np.random.default_rng(1)
    H, B = 6, 3
    rewards = rng.normal(size=(H, B)).astype(np.float32)
    values = rng.normal(size=(H, B)).astype(np.float32)
    bootstrap = rng.normal(size=(B,)).astype(np.float32)
    g = 0.9

    td = np.asarray(lambda_returns(jnp.asarray(rewards), jnp.asarray(values),
                                   jnp.asarray(bootstrap), g, 0.0))
    next_values = np.concatenate([values[1:], bootstrap[None]], axis=0)
    np.testing.assert_allclose(td, rewards + g * next_values, rtol=1e-5,
                               atol=1e-6)

    mc = np.asarray(lambda_returns(jnp.asarray(rewards), jnp.asarray(values),
                                   jnp.asarray(bootstrap), g, 1.0))
    want = np.zeros_like(rewards)
    acc = bootstrap.copy()
    for t in reversed(range(H)):
        acc = rewards[t] + g * acc
        want[t] = acc
    np.testing.assert_allclose(mc, want, rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def behavior_setup(tiny_cfg, tiny_buffer):
    from multimodal_rssm_tpu.models.world_model import WorldModel
    from multimodal_rssm_tpu.train import behavior as bh
    from multimodal_rssm_tpu.train import trainer as tr

    cfg = copy.deepcopy(tiny_cfg)
    bh.behavior_cfg(cfg)
    cfg.behavior.horizon = 5

    model = WorldModel.from_config(cfg)
    D = tiny_buffer
    spec = tr.build_aug_spec(D)
    draws = tr.HostAugmentDraws(D, spec)
    B, L = int(cfg.train.batch_size), int(cfg.train.chunk_size)

    key = jax.random.PRNGKey(0)
    obs, act, rew, nt = D.sample(B, L)
    raw = ({k: jnp.asarray(v) for k, v in obs.items()}, jnp.asarray(act),
           jnp.asarray(rew), jnp.asarray(nt))
    prep = tr.prepare_observations(raw[0], spec, draws.draw(),
                                   int(cfg.env.bit_depth), key)
    wm_state = tr.init_train_state(model, cfg, tr.build_optimizer(cfg), key,
                                   (prep, raw[1], raw[2], raw[3]))
    wm_variables = {"params": wm_state.params,
                    "batch_stats": wm_state.batch_stats}

    actor, value = bh.build_policy_models(cfg)
    actor_opt, value_opt = bh.build_behavior_optimizers(cfg)
    bstate = bh.init_behavior_state(cfg, actor, value, actor_opt, value_opt,
                                    jax.random.PRNGKey(1))
    return dict(cfg=cfg, model=model, wm_variables=wm_variables, actor=actor,
                value=value, actor_opt=actor_opt, value_opt=value_opt,
                bstate=bstate, spec=spec, draws=draws, raw=raw, D=D)


def test_imagine_policy_contract(behavior_setup):
    """[H, N, ·] outputs; actions tanh-bounded; deterministic under the same
    key; trajectories continue (not frozen at the start state)."""
    from multimodal_rssm_tpu.train import behavior as bh

    s = behavior_setup
    cfg = s["cfg"]
    N = 6
    h0 = jnp.zeros((N, int(cfg.rssm.belief_size)), jnp.float32)
    s0 = 0.1 * jnp.ones((N, int(cfg.rssm.state_size)), jnp.float32)
    key = jax.random.PRNGKey(3)
    traj = bh.imagine_policy(s["model"], s["wm_variables"], s["actor"],
                             s["bstate"].actor_params, h0, s0, 5, key)
    H = 5
    assert traj["beliefs"].shape == (H, N, int(cfg.rssm.belief_size))
    assert traj["states"].shape == (H, N, int(cfg.rssm.state_size))
    assert traj["actions"].shape == (H, N, int(cfg.env.action_size))
    acts = np.asarray(traj["actions"])
    assert np.all(np.abs(acts) <= 1.0)
    # same key -> identical rollout
    traj2 = bh.imagine_policy(s["model"], s["wm_variables"], s["actor"],
                              s["bstate"].actor_params, h0, s0, 5, key)
    np.testing.assert_array_equal(np.asarray(traj["states"]),
                                  np.asarray(traj2["states"]))
    # the dynamics actually move: consecutive beliefs differ
    assert not np.allclose(np.asarray(traj["beliefs"][0]),
                           np.asarray(traj["beliefs"][-1]))


def test_behavior_step_updates_and_is_finite(behavior_setup):
    from multimodal_rssm_tpu.train import behavior as bh

    s = behavior_setup
    step_fn = bh.make_behavior_step(s["model"], s["cfg"], s["actor"],
                                    s["value"], s["actor_opt"],
                                    s["value_opt"], s["spec"])
    # the step donates its input state; keep host copies for comparison and
    # leave the fixture's bstate untouched
    before = jax.device_get(s["bstate"])
    bstate = jax.tree_util.tree_map(jnp.array, s["bstate"])
    key = jax.random.PRNGKey(7)
    new_state, metrics = step_fn(bstate, s["wm_variables"], s["raw"],
                                 s["draws"].draw(), key)
    metrics = jax.device_get(metrics)
    for k, v in metrics.items():
        assert np.isfinite(v), (k, v)
    assert int(new_state.step) == int(before.step) + 1
    # both networks actually moved
    a0 = jax.tree_util.tree_leaves(before.actor_params)[0]
    a1 = jax.tree_util.tree_leaves(new_state.actor_params)[0]
    assert not np.allclose(np.asarray(a0), np.asarray(a1))
    v0 = jax.tree_util.tree_leaves(before.value_params)[0]
    v1 = jax.tree_util.tree_leaves(new_state.value_params)[0]
    assert not np.allclose(np.asarray(v0), np.asarray(v1))


@pytest.mark.slow
def test_value_learns_imagined_returns(behavior_setup):
    """The bootstrapped value fit must converge: fixed batch, fixed augment
    draw, fixed imagination key, near-frozen actor (lr 1e-8), and a strongly
    contracting target operator (discount 0.3, lam 0 -> targets r + 0.3 V',
    modulus 0.3) so the TD transient can't outrun the value head (with the
    default discount 0.99 the targets move ahead of V for far longer than a
    12-step test -- verified: loss climbs monotonically during that
    transient, which is correct TD behavior, not a regression)."""
    from multimodal_rssm_tpu.train import behavior as bh

    s = behavior_setup
    cfg = copy.deepcopy(s["cfg"])
    cfg.behavior.actor_learning_rate = 1e-8
    cfg.behavior.value_learning_rate = 3e-3
    cfg.behavior.discount = 0.3
    cfg.behavior.disclam = 0.0
    actor_opt, value_opt = bh.build_behavior_optimizers(cfg)
    bstate = bh.init_behavior_state(cfg, s["actor"], s["value"], actor_opt,
                                    value_opt, jax.random.PRNGKey(2))
    step_fn = bh.make_behavior_step(s["model"], cfg, s["actor"], s["value"],
                                    actor_opt, value_opt, s["spec"])
    key = jax.random.PRNGKey(11)
    draw = s["draws"].draw()
    losses = []
    for _ in range(12):
        bstate, metrics = step_fn(bstate, s["wm_variables"], s["raw"],
                                  draw, key)
        losses.append(float(jax.device_get(metrics["value_loss"])))
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


def test_behavior_checkpoint_roundtrip(behavior_setup, tmp_path):
    from multimodal_rssm_tpu.io import checkpoint as ckpt

    s = behavior_setup
    path = ckpt.save_checkpoint(str(tmp_path), 3, s["bstate"])
    restored, step, _ = ckpt.load_checkpoint(path, s["bstate"])
    assert step == 3
    for a, b in zip(jax.tree_util.tree_leaves(s["bstate"]),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_behavior_checkpoint_pre_return_scale_loads(behavior_setup,
                                                    tmp_path):
    """A behavior checkpoint written BEFORE BehaviorState.return_scale
    existed (pre-round-3 schema) must still restore: the missing field is
    filled from the template's init value (ADVICE r3 schema-forward
    restore in io/checkpoint.load_checkpoint)."""
    from flax import serialization

    from multimodal_rssm_tpu.io import checkpoint as ckpt

    s = behavior_setup
    path = ckpt.save_checkpoint(str(tmp_path), 3, s["bstate"])
    # rewrite the file with the return_scale entry dropped, simulating the
    # old schema
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    assert "return_scale" in payload["state"]
    del payload["state"]["return_scale"]
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))

    restored, step, _ = ckpt.load_checkpoint(path, s["bstate"])
    assert step == 3
    np.testing.assert_array_equal(np.asarray(restored.return_scale),
                                  np.asarray(s["bstate"].return_scale))
    for a, b in zip(jax.tree_util.tree_leaves(s["bstate"].actor_params),
                    jax.tree_util.tree_leaves(restored.actor_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_imag_batch_subsampling(behavior_setup):
    """behavior.imag_batch subsamples the imagination starts; the step
    still runs and both networks move."""
    import copy as _copy

    from multimodal_rssm_tpu.train import behavior as bh

    s = behavior_setup
    cfg = _copy.deepcopy(s["cfg"])
    cfg.behavior.imag_batch = 8  # < (L-1)*B starts
    step_fn = bh.make_behavior_step(s["model"], cfg, s["actor"], s["value"],
                                    s["actor_opt"], s["value_opt"],
                                    s["spec"])
    bstate = jax.tree_util.tree_map(jnp.array, s["bstate"])
    new_state, metrics = step_fn(bstate, s["wm_variables"], s["raw"],
                                 s["draws"].draw(), jax.random.PRNGKey(5))
    for k, v in jax.device_get(metrics).items():
        assert np.isfinite(v), (k, v)
    a0 = jax.tree_util.tree_leaves(s["bstate"])[1]
    a1 = jax.tree_util.tree_leaves(new_state)[1]
    assert not np.allclose(np.asarray(a0), np.asarray(a1))
