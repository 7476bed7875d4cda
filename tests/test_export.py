"""Serving-export tests (io/export.py): jax.export artifacts round-trip
through serialize/deserialize and reproduce the live model exactly.

The reference has no deployment path at all (inference happens in
check_model.ipynb against the live torch modules); these artifacts are the
TPU-native serving story — frozen StableHLO with weights baked in, callable
from any JAX runtime with no model code.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_rssm_tpu.io import export as ex
from multimodal_rssm_tpu.models.world_model import WorldModel
from multimodal_rssm_tpu.ops.image import normalize_image_deterministic
from multimodal_rssm_tpu.train import trainer as tr


def _keydata(key):
    """Raw uint32[2] key data (the artifact's key input contract) from
    either a legacy raw key or a typed PRNG key."""
    if key.dtype == jnp.uint32:
        return key
    return jax.random.key_data(key)


@pytest.fixture(scope="module")
def exported_setup(tiny_cfg, tiny_buffer):
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
    return tiny_cfg, model, variables


def _raw_frame(cfg, batch_size, seed=0):
    """One raw observation frame per modality, matching the artifact's
    input contract (uint8 HWC images, float32 otherwise)."""
    rng = np.random.default_rng(seed)
    obs = {}
    for name in cfg.rssm.observation_names_enc:
        c, h, w = (tuple(cfg.env.observation_shapes[name]) + (None, None))[:3]
        if "image" in name:
            obs[name] = rng.integers(
                0, 256, (batch_size, h, w, c), dtype=np.uint8)
        else:
            shape = tuple(cfg.env.observation_shapes[name])
            obs[name] = rng.normal(size=(batch_size, *shape)).astype(
                np.float32)
    return obs


def test_export_filter_step_roundtrip(exported_setup, tmp_path):
    """serialize -> deserialize -> call reproduces the live filter_step
    bit-for-bit on the same inputs (weights are baked into the artifact)."""
    cfg, model, variables = exported_setup
    B = 1
    art = ex.export_filter_step(cfg, model, variables, batch_size=B)
    path = ex.save_exported(art, str(tmp_path / "filter_step.jaxexport"))
    assert os.path.getsize(path) > 0

    exp = ex.load_exported(path)
    obs = _raw_frame(cfg, B)
    h = jnp.zeros((B, model.belief_size), jnp.float32)
    s = jnp.zeros((B, model.state_size), jnp.float32)
    action = jnp.zeros((B, int(cfg.env.action_size)), jnp.float32)
    nt = jnp.ones((B, 1), jnp.float32)
    key = jax.random.PRNGKey(3)

    out = exp.call(h, s, action, {k: jnp.asarray(v) for k, v in obs.items()},
                   nt, _keydata(key))

    # oracle: the live module on deterministically-normalised inputs
    bit_depth = int(cfg.env.bit_depth)
    norm = {
        k: (normalize_image_deterministic(jnp.asarray(v), bit_depth)
            if "image" in k else jnp.asarray(v, jnp.float32))
        for k, v in obs.items()
    }
    ref = model.apply(variables, h, s, action, norm, nt, key, True, False,
                      method=model.filter_step)

    assert out["beliefs"].shape == (B, model.belief_size)
    assert out["posterior_states"].shape == (B, model.state_size)
    np.testing.assert_allclose(np.asarray(out["beliefs"]),
                               np.asarray(ref["beliefs"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["posterior_means"]),
                               np.asarray(ref["posterior_means"]), atol=1e-6)


def test_export_filter_step_carries(exported_setup, tmp_path):
    """The artifact is self-consistent as a streaming filter: feeding its
    own outputs back in advances the posterior (finite, changing state)."""
    cfg, model, variables = exported_setup
    B = 1
    art = ex.export_filter_step(cfg, model, variables, batch_size=B)
    exp = ex.load_exported(
        ex.save_exported(art, str(tmp_path / "f.jaxexport")))

    h = jnp.zeros((B, model.belief_size), jnp.float32)
    s = jnp.zeros((B, model.state_size), jnp.float32)
    action = jnp.zeros((B, int(cfg.env.action_size)), jnp.float32)
    nt = jnp.ones((B, 1), jnp.float32)
    key = jax.random.PRNGKey(0)
    states = []
    for t in range(3):
        obs = {k: jnp.asarray(v)
               for k, v in _raw_frame(cfg, B, seed=t).items()}
        out = exp.call(h, s, action, obs, nt,
                       _keydata(jax.random.fold_in(key, t)))
        h, s = out["beliefs"], out["posterior_states"]
        states.append(np.asarray(s))
    assert all(np.isfinite(x).all() for x in states)
    assert not np.allclose(states[0], states[2])


def test_export_from_numpy_variables(exported_setup, tmp_path):
    """Checkpoint-loaded weight trees are numpy leaves (msgpack restore);
    export must coerce them — numpy kernels indexed with traced index
    arrays inside the trace (PackedWidthConv's packed kernel) raise
    TracerArrayConversionError otherwise.  Regression: found driving
    scripts/export_model.py on a real run dir."""
    cfg, model, variables = exported_setup
    np_vars = jax.tree_util.tree_map(np.asarray, variables)
    art = ex.export_filter_step(cfg, model, np_vars, batch_size=1)
    exp = ex.load_exported(
        ex.save_exported(art, str(tmp_path / "np.jaxexport")))
    obs = {k: jnp.asarray(v) for k, v in _raw_frame(cfg, 1).items()}
    out = exp.call(
        jnp.zeros((1, model.belief_size), jnp.float32),
        jnp.zeros((1, model.state_size), jnp.float32),
        jnp.zeros((1, int(cfg.env.action_size)), jnp.float32),
        obs, jnp.ones((1, 1), jnp.float32),
        _keydata(jax.random.PRNGKey(0)))
    assert np.isfinite(np.asarray(out["beliefs"])).all()


def test_export_decode_shapes(exported_setup, tmp_path):
    cfg, model, variables = exported_setup
    art = ex.export_decode(cfg, model, variables, batch_size=1)
    exp = ex.load_exported(
        ex.save_exported(art, str(tmp_path / "d.jaxexport")))
    h = jnp.zeros((1, model.belief_size), jnp.float32)
    s = jnp.zeros((1, model.state_size), jnp.float32)
    out = exp.call(h, s)
    for name in cfg.rssm.observation_names_rec:
        assert name in out
        assert np.isfinite(np.asarray(out[name]["loc"])).all()


def test_export_agent_step(exported_setup, tmp_path):
    """Full controller artifact: raw frame -> posterior -> greedy action;
    matches the live filter+actor composition exactly."""
    from multimodal_rssm_tpu.train import behavior as bh

    cfg, model, variables = exported_setup
    bh.behavior_cfg(cfg)
    actor, _ = bh.build_policy_models(cfg)
    B = 1
    h = jnp.zeros((B, model.belief_size), jnp.float32)
    s = jnp.zeros((B, model.state_size), jnp.float32)
    actor_params = actor.init(jax.random.PRNGKey(1), h, s,
                              jax.random.PRNGKey(2))["params"]

    art = ex.export_agent_step(cfg, model, actor, variables, actor_params,
                               batch_size=B)
    exp = ex.load_exported(
        ex.save_exported(art, str(tmp_path / "a.jaxexport")))

    obs = {k: jnp.asarray(v) for k, v in _raw_frame(cfg, B).items()}
    action0 = jnp.zeros((B, int(cfg.env.action_size)), jnp.float32)
    nt = jnp.ones((B, 1), jnp.float32)
    key = jax.random.PRNGKey(7)
    h2, s2, act_out = exp.call(h, s, action0, obs, nt, _keydata(key))
    assert act_out.shape == (B, int(cfg.env.action_size))

    bit_depth = int(cfg.env.bit_depth)
    norm = {
        k: (normalize_image_deterministic(v, bit_depth) if "image" in k
            else v.astype(jnp.float32))
        for k, v in obs.items()
    }
    states = model.apply(variables, h, s, action0, norm, nt, None, True,
                         False, method=model.filter_step)
    ref_act = actor.apply({"params": actor_params}, states["beliefs"],
                          states["posterior_means"], key, det=True)
    np.testing.assert_allclose(np.asarray(act_out), np.asarray(ref_act),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(h2),
                               np.asarray(states["beliefs"]), atol=1e-6)


def test_export_plan_step(exported_setup, tmp_path):
    """Zero-shot MPC artifact: raw frame -> posterior -> CEM-planned
    action; matches the live filter+planner composition exactly (the whole
    candidate search is baked into the artifact)."""
    import copy

    from multimodal_rssm_tpu.train.planner import make_cem_planner

    cfg, model, variables = exported_setup
    cfg = copy.deepcopy(cfg)
    cfg["planner"] = {
        "planning_horizon": 3,
        "optimisation_iters": 2,
        "candidates": 16,
        "top_candidates": 4,
    }
    B = 1
    art = ex.export_plan_step(cfg, model, variables, batch_size=B)
    exp = ex.load_exported(
        ex.save_exported(art, str(tmp_path / "p.jaxexport")))

    h = jnp.zeros((B, model.belief_size), jnp.float32)
    s = jnp.zeros((B, model.state_size), jnp.float32)
    obs = {k: jnp.asarray(v) for k, v in _raw_frame(cfg, B).items()}
    action0 = jnp.zeros((B, int(cfg.env.action_size)), jnp.float32)
    nt = jnp.ones((B, 1), jnp.float32)
    key = jax.random.PRNGKey(11)
    h2, s2, act_out = exp.call(h, s, action0, obs, nt, _keydata(key))
    assert act_out.shape == (B, int(cfg.env.action_size))
    assert np.all(np.abs(np.asarray(act_out)) <= 1.0)

    bit_depth = int(cfg.env.bit_depth)
    norm = {
        k: (normalize_image_deterministic(v, bit_depth) if "image" in k
            else v.astype(jnp.float32))
        for k, v in obs.items()
    }
    states = model.apply(variables, h, s, action0, norm, nt, None, True,
                         False, method=model.filter_step)
    plan = make_cem_planner(model, cfg)
    ref_act = plan(variables, states["beliefs"], states["posterior_means"],
                   key)
    np.testing.assert_allclose(np.asarray(act_out), np.asarray(ref_act),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(h2),
                               np.asarray(states["beliefs"]), atol=1e-6)
