"""Tests for the evaluation library: episode state estimation,
reconstruction, open-loop imagination, cross-modal inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_rssm_tpu.eval import imagination, state_estimation, visualize
from multimodal_rssm_tpu.models.world_model import WorldModel
from multimodal_rssm_tpu.train import trainer as tr


@pytest.fixture(scope="module")
def small_model_and_vars(tiny_cfg, tiny_buffer):
    model = WorldModel.from_config(tiny_cfg)
    spec = tr.build_aug_spec(tiny_buffer)
    key = jax.random.PRNGKey(0)
    obs, act, rew, nt = tiny_buffer.sample(2, 6)
    prep = tr.prepare_observations(
        {k: jnp.asarray(v) for k, v in obs.items()}, spec,
        tr.HostAugmentDraws(tiny_buffer, spec).draw(),
        int(tiny_cfg.env.bit_depth), key,
    )
    obs_target = {k: v[1:] for k, v in prep.items()}
    variables = model.init(key, obs_target, jnp.asarray(act)[:-1],
                           jnp.asarray(nt)[:-1], key, train=False)
    return model, variables


def test_episode_bounds(tiny_buffer):
    bounds = state_estimation.episode_bounds(tiny_buffer)
    # 3 synthetic episodes of length 40
    assert list(bounds) == [0, 40, 80, 120]


def test_estimate_episode(small_model_and_vars, tiny_buffer):
    model, variables = small_model_and_vars
    states = state_estimation.estimate_episode(
        model, variables, tiny_buffer, epi_idx=1, det=True
    )
    # batch-1, T-1=39 outputs
    assert states["beliefs"].shape == (39, 1, model.belief_size)
    assert states["posterior_means"].shape == (39, 1, model.state_size)
    assert np.isfinite(np.asarray(states["posterior_means"])).all()


def test_get_states_keys(small_model_and_vars, tiny_buffer):
    model, variables = small_model_and_vars
    states = state_estimation.get_states(model, variables, tiny_buffer)
    assert len(states) == 3
    first = next(iter(states.values()))
    assert isinstance(first["beliefs"], np.ndarray)
    assert isinstance(first["expert_means"], dict)


def test_reconstruct_and_imagine(small_model_and_vars, tiny_buffer, tiny_cfg):
    model, variables = small_model_and_vars
    spec = tr.build_aug_spec(tiny_buffer)
    key = jax.random.PRNGKey(1)
    obs, act, rew, nt = tiny_buffer.sample(2, 8)
    prep = tr.prepare_observations(
        {k: jnp.asarray(v) for k, v in obs.items()}, spec,
        state_estimation.fixed_draws(tiny_buffer, spec),
        int(tiny_cfg.env.bit_depth), key,
    )
    obs_target = {k: v[1:] for k, v in prep.items()}
    actions = jnp.asarray(act)[:-1]
    states = model.apply(variables, obs_target, actions, jnp.asarray(nt)[:-1],
                         None, True, False, method=model.estimate_state)

    recon = imagination.reconstruct(model, variables, states)
    assert recon["image_horizon"]["loc"].shape == (7, 2, 64, 64, 3)

    t_start, horizon = 2, 4
    roll, preds = imagination.imagine(model, variables, states, actions,
                                      t_start, horizon, det=True)
    assert roll["beliefs"].shape == (horizon, 2, model.belief_size)
    assert preds["sound"]["loc"].shape == (horizon, 2, 128, 20)

    mse = imagination.video_prediction_mse(preds, obs_target, t_start, horizon)
    assert set(mse) == {"image_horizon", "sound"}
    assert all(np.isfinite(v) for v in mse.values())


def test_cross_modal_inference(small_model_and_vars, tiny_buffer, tiny_cfg):
    """Posterior from a single modality's expert (+ prior expert), using the
    full model's parameters."""
    model, variables = small_model_and_vars
    sub = imagination.cross_modal_model(model, ("sound",))
    spec = tr.build_aug_spec(tiny_buffer)
    key = jax.random.PRNGKey(2)
    obs, act, rew, nt = tiny_buffer.sample(2, 6)
    prep = tr.prepare_observations(
        {k: jnp.asarray(v) for k, v in obs.items()}, spec,
        state_estimation.fixed_draws(tiny_buffer, spec),
        int(tiny_cfg.env.bit_depth), key,
    )
    obs_target = {k: v[1:] for k, v in prep.items()}
    states = sub.apply(variables, obs_target, jnp.asarray(act)[:-1],
                       jnp.asarray(nt)[:-1], None, True, False,
                       method=sub.estimate_state)
    assert states["posterior_means"].shape == (5, 2, model.state_size)
    assert set(states["expert_means"].keys()) == {"prior_expert", "sound"}


def test_pca_utils(rng):
    feats = [rng.normal(size=(20, 8)).astype(np.float32) for _ in range(3)]
    pca, proj = visualize.pca_trajectories(feats, n_components=2)
    assert proj[0].shape == (20, 2)


def test_reverse_image_roundtrip(rng):
    img = rng.uniform(-0.5, 0.5, size=(4, 4, 3)).astype(np.float32)
    out = visualize.reverse_image_observation(img)
    assert out.dtype == np.uint8


def test_streaming_filter_matches_sequence(small_model_and_vars, tiny_cfg,
                                           tiny_buffer):
    """The OnlineFilter (per-frame streaming posterior) must reproduce the
    full-sequence estimate_state exactly in det mode — it is the same scan
    with T=1 steps chained through the carried (belief, state)."""
    from multimodal_rssm_tpu.eval.streaming import OnlineFilter

    model, variables = small_model_and_vars
    spec = tr.build_aug_spec(tiny_buffer)
    key = jax.random.PRNGKey(3)
    obs, act, rew, nt = tiny_buffer.sample(2, 6)
    prep = tr.prepare_observations(
        {k: jnp.asarray(v) for k, v in obs.items()}, spec,
        tr.HostAugmentDraws(tiny_buffer, spec).draw(),
        int(tiny_cfg.env.bit_depth), key,
    )
    obs_target = {k: v[1:] for k, v in prep.items()}
    actions = jnp.asarray(act)[:-1]
    nonterms = jnp.asarray(nt)[:-1]

    seq = model.apply(variables, obs_target, actions, nonterms, None, True,
                      False, method=model.estimate_state)

    filt = OnlineFilter(model, variables, det=True)
    filt.reset(batch_size=2)
    beliefs, posts = [], []
    for t in range(actions.shape[0]):
        frame = {k: v[t] for k, v in obs_target.items()}
        out = filt.step(actions[t], frame, nonterminal=nonterms[t])
        beliefs.append(out["beliefs"])
        posts.append(out["posterior_means"])

    np.testing.assert_allclose(np.stack(beliefs), np.asarray(seq["beliefs"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.stack(posts),
                               np.asarray(seq["posterior_means"]),
                               rtol=1e-4, atol=1e-4)

    recon = filt.decode()
    for name, out in recon.items():
        assert np.all(np.isfinite(np.asarray(out["loc"])))


def test_check_model_artifact_helpers(rng, tmp_path):
    """The analysis-script artifact writers (scripts/check_model.py):
    multi-episode PCA plot + per-expert distribution artifacts render from
    synthetic state dicts (notebook cells 25-29 / 39-48 surface)."""
    import os

    from multimodal_rssm_tpu.cli import check_model

    out = str(tmp_path)
    # 3 episodes of 3-D PCA projections
    projs = [rng.normal(size=(20, 3)).astype(np.float32) for _ in range(3)]
    check_model._plot_pca(out, projs, projs)
    assert os.path.exists(os.path.join(out, "pca_latents.png"))

    T, B, S, K = 12, 1, 6, 3  # K = prior_expert + 2 modalities
    names = ("prior_expert", "image_horizon", "sound")
    means = rng.normal(size=(T, K, B, S)).astype(np.float32)
    stds = rng.uniform(0.1, 1.0, size=(T, K, B, S)).astype(np.float32)
    states = {
        "expert_means": {n: means[:, i] for i, n in enumerate(names)},
        "expert_std_devs": {n: stds[:, i] for i, n in enumerate(names)},
        "expert_means_stacked": means,
        "expert_std_devs_stacked": stds,
    }
    check_model._save_expert_artifacts(out, states)
    assert os.path.exists(os.path.join(out, "expert_distributions.png"))
    blob = np.load(os.path.join(out, "expert_distributions.npy"),
                   allow_pickle=True).item()
    assert set(blob["expert_means"]) == set(names)
    assert len(blob["subset_means"]) == 2 ** (K - 1)  # subsets of modalities
    assert blob["subset_means"][0].shape == (T, S)
