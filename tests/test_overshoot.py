"""Latent-overshooting: the vectorised single-rollout implementation must
match a naive per-start-index loop computing the reference's padded-batch
semantics (algos/MRSSM/base/algo.py:111-148)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_rssm_tpu.losses.overshoot import overshooting_losses
from multimodal_rssm_tpu.models.world_model import WorldModel
from multimodal_rssm_tpu.ops import gaussian
from multimodal_rssm_tpu.rssm.core import RSSMCore

L, B, S, A, H = 8, 3, 6, 2, 12
D_OS = 3
FREE_NATS = 3.0


@pytest.fixture(scope="module")
def setup():
    core = RSSMCore(
        belief_size=H, state_size=S, action_size=A, hidden_size=H,
        embedding_sizes={"m": 8}, observation_names_enc=("m",),
        multimodal=True, fusion_method="PoE",
    )
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    obs_emb = {"m": jnp.asarray(rng.normal(size=(L - 1, B, 8)).astype(np.float32))}
    actions = jnp.asarray(rng.normal(size=(L, B, A)).astype(np.float32))
    nonterm = jnp.asarray(np.ones((L, B, 1), np.float32))
    rewards = jnp.asarray(rng.normal(size=(L, B)).astype(np.float32))
    eps = jnp.zeros((L - 1, B, S))
    variables = core.init(key, jnp.zeros((B, H)), jnp.zeros((B, S)),
                          actions[:-1], nonterm[:-1], obs_emb, eps, eps)
    states = core.apply(variables, jnp.zeros((B, H)), jnp.zeros((B, S)),
                        actions[:-1], nonterm[:-1], obs_emb, eps, eps)
    states = dict(states)
    states["expert_means_stacked"] = states["expert_means"]
    states["expert_std_devs_stacked"] = states["expert_std_devs"]

    def prior_rollout_fn(init_h, init_s, acts, nonterms, eps_):
        return core.apply(variables, init_h, init_s, acts, nonterms, eps_,
                          method=core.prior_rollout)

    return core, variables, states, actions, rewards, nonterm, prior_rollout_fn


def _naive_overshoot_kl(states, actions, nonterm, prior_rollout_fn):
    """Per-t loop mirroring the reference's padded-batch computation with
    det rollouts (free-nats max AFTER masked state-dim sum; masked rows
    clamp to free_nats and are included in the mean)."""
    total_rows = []
    for t in range(1, L - 1):
        d = min(t + D_OS, L - 1)
        init_h = states["beliefs"][t - 1]
        init_s = states["prior_states"][t - 1]
        acts = jnp.zeros((D_OS, B, A))
        acts = acts.at[: d - t].set(actions[t:d])
        nts = jnp.zeros((D_OS, B, 1))
        nts = nts.at[: d - t].set(nonterm[t:d])
        roll = prior_rollout_fn(init_h, init_s, acts, nts,
                                jnp.zeros((D_OS, B, S)))
        tm = jnp.zeros((D_OS, B, S))
        tm = tm.at[: d - t].set(states["posterior_means"][t:d])
        tstd = jnp.ones((D_OS, B, S))
        tstd = tstd.at[: d - t].set(states["posterior_std_devs"][t:d])
        mask = jnp.zeros((D_OS, B, 1))
        mask = mask.at[: d - t].set(1.0)
        div = (gaussian.kl_normal(tm, tstd, roll["prior_means"],
                                  roll["prior_std_devs"]) * mask).sum(-1)
        total_rows.append(jnp.maximum(div, FREE_NATS))
    return float(jnp.concatenate([r.reshape(D_OS, -1) for r in total_rows],
                                 axis=1).mean())


def test_vectorised_overshoot_matches_naive(setup):
    core, variables, states, actions, rewards, nonterm, prior_rollout_fn = setup
    kl, _ = overshooting_losses(
        prior_rollout_fn, None, states, actions, rewards, nonterm,
        chunk_size=L, distance=D_OS, free_nats=FREE_NATS,
        overshooting_reward_scale=0.0, key=jax.random.PRNGKey(0),
        fusion_method="PoE", det=True,
    )
    naive = _naive_overshoot_kl(states, actions, nonterm, prior_rollout_fn)
    np.testing.assert_allclose(float(kl), naive, rtol=1e-5)


def test_mopoe_overshoot_runs(setup):
    core, variables, states, actions, rewards, nonterm, prior_rollout_fn = setup
    kl, _ = overshooting_losses(
        prior_rollout_fn, None, states, actions, rewards, nonterm,
        chunk_size=L, distance=D_OS, free_nats=FREE_NATS,
        overshooting_reward_scale=0.0, key=jax.random.PRNGKey(0),
        fusion_method="MoPoE", det=True,
    )
    assert np.isfinite(float(kl))
    assert float(kl) >= FREE_NATS - 1e-6  # free-nats floor


def test_overshoot_gradients_flow(setup):
    """Overshoot loss must backprop into core params (it trains the prior)."""
    core, variables, states, actions, rewards, nonterm, _ = setup

    def loss(params):
        def prf(init_h, init_s, acts, nonterms, eps_):
            return core.apply({"params": params}, init_h, init_s, acts,
                              nonterms, eps_, method=core.prior_rollout)

        kl, _ = overshooting_losses(
            prf, None, states, actions, rewards, nonterm,
            chunk_size=L, distance=D_OS, free_nats=0.0,
            overshooting_reward_scale=0.0, key=jax.random.PRNGKey(0),
            fusion_method="PoE", det=True,
        )
        return kl

    grads = jax.grad(loss)(variables["params"])
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0
