"""Categorical (DreamerV2-style discrete) latent variant.

The reference is Gaussian-only (utils/models/encoder.py:126-155); this
capability is new (rssm.latent_dist=categorical, ops/categorical.py).  Tests
cover: the pure primitives (normalized logits / unimix / Gumbel-max ST
sampling / KLs, cross-checked against torch.distributions), logit-space
fusion (PoE product / MoPoE variable partition), the scan-core contract,
loss assembly + gradient flow (straight-through), overshooting, and a
loss-decreases train-step run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rssm_tpu.core.config import compose
from multimodal_rssm_tpu.ops import categorical as cat

from tests.conftest import TINY_OVERRIDES


CAT_OVERRIDES = TINY_OVERRIDES + [
    "rssm.latent_dist=categorical",
    "rssm.categorical_params.variables=4",
    "rssm.categorical_params.classes=6",
    "rssm.categorical_params.unimix=0.01",
]


def make_cfg(*extra):
    import os

    cfg_dir = os.path.join(os.path.dirname(__file__), "..",
                           "multimodal_rssm_tpu", "configs")
    return compose(cfg_dir, overrides=CAT_OVERRIDES + list(extra))


# -- primitives ------------------------------------------------------------


def test_normalize_logits_is_log_softmax():
    raw = jnp.asarray(np.random.default_rng(0).normal(size=(3, 4, 5)))
    logp = cat.normalize_logits(raw, unimix=0.0)
    np.testing.assert_allclose(
        np.exp(np.asarray(logp)).sum(-1), 1.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(logp), np.asarray(jax.nn.log_softmax(raw, axis=-1)),
        atol=1e-6)


def test_unimix_floors_probabilities():
    # A hugely peaked raw logit row: without unimix the losing classes get
    # ~0 probability; with unimix u they are floored at >= u/K * (tiny slack)
    raw = jnp.asarray([[0.0, 50.0, 0.0, 0.0]])
    u = 0.01
    probs = np.exp(np.asarray(cat.normalize_logits(raw, unimix=u)))
    assert probs.min() >= u / 4 * 0.999
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-6)


def test_st_sample_forward_is_onehot_of_argmax():
    rng = np.random.default_rng(1)
    logits = cat.normalize_logits(jnp.asarray(rng.normal(size=(7, 3, 5))))
    noise = cat.gumbel_noise(jax.random.PRNGKey(0), (7, 3, 5))
    s = np.asarray(cat.st_sample(logits, noise))
    idx = np.argmax(np.asarray(logits + noise), axis=-1)
    onehot = np.eye(5)[idx]
    # forward value is onehot + p - p: exact up to one ulp of p
    np.testing.assert_allclose(s, onehot, atol=1e-6)
    # zero noise => mode
    s0 = np.asarray(cat.st_sample(logits, jnp.zeros_like(noise)))
    np.testing.assert_allclose(
        s0, np.eye(5)[np.argmax(np.asarray(logits), -1)], atol=1e-6)


def test_st_sample_gradient_flows_through_probs():
    # d/draw sum(w * st_sample) must equal d/draw sum(w * softmax(raw)):
    # the straight-through estimator routes gradients through the probs.
    raw = jnp.asarray(np.random.default_rng(2).normal(size=(2, 3, 4)))
    w = jnp.asarray(np.random.default_rng(3).normal(size=(2, 3, 4)))
    noise = cat.gumbel_noise(jax.random.PRNGKey(1), raw.shape)

    def through_sample(r):
        return jnp.sum(w * cat.st_sample(cat.normalize_logits(r), noise))

    def through_probs(r):
        return jnp.sum(w * jnp.exp(cat.normalize_logits(r)))

    g1 = jax.grad(through_sample)(raw)
    g2 = jax.grad(through_probs)(raw)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)
    assert float(jnp.abs(g1).max()) > 0


def test_kl_categorical_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    q_raw = rng.normal(size=(5, 3, 4)).astype(np.float32)
    p_raw = rng.normal(size=(5, 3, 4)).astype(np.float32)
    lq = cat.normalize_logits(jnp.asarray(q_raw))
    lp = cat.normalize_logits(jnp.asarray(p_raw))
    ours = np.asarray(cat.kl_categorical(lq, lp))  # [5, 3]
    tq = torch.distributions.Categorical(logits=torch.from_numpy(q_raw))
    tp = torch.distributions.Categorical(logits=torch.from_numpy(p_raw))
    theirs = torch.distributions.kl.kl_divergence(tq, tp).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_kl_uniform_is_logk_minus_entropy():
    rng = np.random.default_rng(5)
    lq = cat.normalize_logits(jnp.asarray(rng.normal(size=(6, 2, 8))))
    ours = np.asarray(cat.kl_uniform(lq))
    q = np.exp(np.asarray(lq))
    ent = -(q * np.asarray(lq)).sum(-1)
    np.testing.assert_allclose(ours, np.log(8.0) - ent, atol=1e-5)
    # uniform q => exactly 0
    uni = cat.normalize_logits(jnp.zeros((1, 1, 8)))
    np.testing.assert_allclose(np.asarray(cat.kl_uniform(uni)), 0.0, atol=1e-6)


# -- fusion ----------------------------------------------------------------


def test_poe_logits_is_normalized_product():
    rng = np.random.default_rng(6)
    experts = cat.normalize_logits(jnp.asarray(rng.normal(size=(3, 2, 4, 5))))
    fused = np.asarray(cat.poe_logits(experts))
    # product of probs renormalized
    prod = np.prod(np.exp(np.asarray(experts)), axis=0)
    prod = prod / prod.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.exp(fused), prod, atol=1e-5)


def test_subset_poe_logits_enumeration():
    # M=2 modalities -> 4 subsets, each including the prior expert (index 0)
    rng = np.random.default_rng(7)
    experts = cat.normalize_logits(jnp.asarray(rng.normal(size=(3, 2, 4, 5))))
    subsets = cat.subset_poe_logits(experts)
    assert len(subsets) == 4
    # first subset is the prior expert alone
    np.testing.assert_allclose(
        np.asarray(subsets[0]), np.asarray(experts[0]), atol=1e-6)
    # last subset is the full product
    np.testing.assert_allclose(
        np.asarray(subsets[-1]), np.asarray(cat.poe_logits(experts)),
        atol=1e-5)


def test_mopoe_logits_variable_partition():
    # V=8 variables, 4 subsets -> slices of 2 variables each, matching the
    # reference's equal latent partition (utils/models/encoder.py:107-120)
    # applied to whole variables.
    rng = np.random.default_rng(8)
    experts = cat.normalize_logits(jnp.asarray(rng.normal(size=(3, 2, 8, 5))))
    fused = np.asarray(cat.mopoe_logits(experts))
    subsets = [np.asarray(s) for s in cat.subset_poe_logits(experts)]
    for k in range(4):
        np.testing.assert_allclose(
            fused[..., 2 * k:2 * k + 2, :], subsets[k][..., 2 * k:2 * k + 2, :],
            atol=1e-6)


# -- model integration -----------------------------------------------------


@pytest.fixture(scope="module")
def cat_setup(tmp_path_factory):
    from multimodal_rssm_tpu.data.buffer import build_buffer
    from multimodal_rssm_tpu.data.synthetic import write_synthetic_dataset
    from multimodal_rssm_tpu.models.world_model import WorldModel

    cfg = make_cfg()
    out = tmp_path_factory.mktemp("cat_episodes")
    shapes = {
        "image_horizon": cfg.env.observation_shapes["image_horizon"],
        "sound": cfg.env.observation_shapes["sound"],
    }
    write_synthetic_dataset(str(out), 2, 30, shapes)
    D = build_buffer(cfg)
    D.load_dataset(str(out))
    model = WorldModel.from_config(cfg)
    return cfg, model, D


def _example_batch(cfg, D):
    return D.sample(int(cfg.train.batch_size), int(cfg.train.chunk_size))


def test_world_model_contract(cat_setup):
    cfg, model, D = cat_setup
    V, K = 4, 6
    T, B = 5, 2
    key = jax.random.PRNGKey(0)
    obs = {
        "image_horizon": jnp.zeros((T, B, 64, 64, 3)),
        "sound": jnp.zeros((T, B, 128, 20)),
    }
    acts = jnp.zeros((T, B, 3))
    nt = jnp.ones((T, B, 1))
    variables = model.init(key, obs, acts, nt, key, train=False)
    states = model.apply(variables, obs, acts, nt, key, train=False,
                         method=model.estimate_state)
    assert states["posterior_states"].shape == (T, B, V * K)
    assert states["posterior_logits"].shape == (T, B, V, K)
    assert states["expert_logits_stacked"].shape == (T, 3, B, V, K)
    assert set(states["expert_logits"].keys()) == {
        "prior_expert", "image_horizon", "sound"}
    # posterior_means are the class probabilities (sum to 1 per variable)
    pm = np.asarray(states["posterior_means"]).reshape(T, B, V, K)
    np.testing.assert_allclose(pm.sum(-1), 1.0, atol=1e-5)
    # forward samples are (ulp-exact) one-hot rows
    ps = np.asarray(states["posterior_states"]).reshape(T, B, V, K)
    np.testing.assert_allclose(ps.sum(-1), 1.0, atol=1e-5)
    assert np.all(ps.max(-1) > 0.99)
    # det rollout: states == mode of the logits
    det_states = model.apply(variables, obs, acts, nt, None, train=False,
                             method=model.estimate_state)
    ds = np.asarray(det_states["posterior_states"]).reshape(T, B, V, K)
    idx = np.argmax(np.asarray(det_states["posterior_logits"]), -1)
    np.testing.assert_allclose(ds, np.eye(K)[idx], atol=1e-5)
    # prior-only rollout carries the same contract
    roll = model.apply(
        variables, jnp.zeros((B, model.belief_size)),
        jnp.zeros((B, V * K)), acts, nt, key,
        method=model.rollout_prior)
    assert roll["prior_states"].shape == (T, B, V * K)
    assert roll["prior_logits"].shape == (T, B, V, K)


@pytest.mark.parametrize("fusion_method", ["PoE", "MoPoE"])
@pytest.mark.slow
def test_loss_and_gradients(cat_setup, fusion_method):
    from multimodal_rssm_tpu.train import trainer as tr

    cfg, _, D = cat_setup
    cfg2 = make_cfg(
        f"rssm.multimodal_params.fusion_method={fusion_method}")
    from multimodal_rssm_tpu.models.world_model import WorldModel

    model = WorldModel.from_config(cfg2)
    batch = _example_batch(cfg2, D)
    key = jax.random.PRNGKey(0)
    state = tr.init_train_state(
        model, cfg2, tr.build_optimizer(cfg2), key, batch)
    loss_fn = tr.make_loss_fn(model, cfg2)
    (loss, (_, metrics)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params, state.batch_stats, batch, key,
                               True)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(metrics["kl_loss"]))
    # straight-through keeps every module trainable: no all-zero gradients
    for mod, sub in grads.items():
        norm = float(jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.square(x)), sub, 0.0))
        if mod == "reward_model":  # loss zeroed under predict_reward: False
            continue
        assert norm > 0, f"zero gradient for {mod}"


@pytest.mark.slow
def test_overshooting_finite(cat_setup):
    from multimodal_rssm_tpu.models.world_model import WorldModel
    from multimodal_rssm_tpu.train import trainer as tr

    cfg, _, D = cat_setup
    cfg2 = make_cfg("rssm.overshooting_distance=4",
                    "rssm.overshooting_kl_beta=0.5")
    model = WorldModel.from_config(cfg2)
    batch = _example_batch(cfg2, D)
    key = jax.random.PRNGKey(1)
    state = tr.init_train_state(
        model, cfg2, tr.build_optimizer(cfg2), key, batch)
    loss_fn = tr.make_loss_fn(model, cfg2)
    (loss, (_, metrics)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params, state.batch_stats, batch, key,
                               True)
    assert np.isfinite(float(loss))
    gn = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.square(x)), grads, 0.0))
    assert np.isfinite(gn) and gn > 0


@pytest.mark.slow
def test_train_step_loss_decreases(cat_setup):
    from multimodal_rssm_tpu.train import trainer as tr

    cfg, model, D = cat_setup
    optimizer = tr.build_optimizer(cfg)
    spec = tr.build_aug_spec(D)
    draws_src = tr.HostAugmentDraws(D, spec, seed=0)
    train_step, _ = tr.make_train_step(model, cfg, optimizer, spec)
    key = jax.random.PRNGKey(2)
    batch = _example_batch(cfg, D)
    # init on a prepared batch (same as train/loop.py)
    prep = tr.prepare_observations(
        batch[0], spec, draws_src.draw(), int(cfg.env.bit_depth), key)
    state = tr.init_train_state(
        model, cfg, optimizer, key, (prep, *batch[1:]))
    losses = []
    for i in range(12):
        key, k = jax.random.split(key)
        state, metrics = train_step(state, D.sample(4, 8), draws_src.draw(), k)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert np.mean(losses[-3:]) < losses[0] * 0.9


def test_unimodal_categorical(cat_setup):
    from multimodal_rssm_tpu.models.world_model import WorldModel
    from multimodal_rssm_tpu.train import trainer as tr

    _, _, D = cat_setup
    cfg2 = make_cfg("rssm.multimodal=False")
    model = WorldModel.from_config(cfg2)
    batch = _example_batch(cfg2, D)
    key = jax.random.PRNGKey(3)
    state = tr.init_train_state(
        model, cfg2, tr.build_optimizer(cfg2), key, batch)
    loss_fn = tr.make_loss_fn(model, cfg2)
    loss, (_, metrics) = loss_fn(state.params, state.batch_stats, batch, key,
                                 True)
    assert np.isfinite(float(loss))


# -- guards ----------------------------------------------------------------


def test_config_validation():
    from multimodal_rssm_tpu.models.world_model import resolve_latent

    with pytest.raises(ValueError, match="latent_dist"):
        resolve_latent(make_cfg("rssm.latent_dist=discrete").rssm)
    with pytest.raises(ValueError, match="unimix"):
        resolve_latent(make_cfg("rssm.categorical_params.unimix=1.5").rssm)
    with pytest.raises(ValueError, match="classes"):
        resolve_latent(make_cfg("rssm.categorical_params.classes=1").rssm)


def test_stochastic_encoder_rejected():
    from multimodal_rssm_tpu.models.world_model import WorldModel

    cfg = make_cfg('rssm.multimodal_params.expert_dist=q(st|ot)')
    model = WorldModel.from_config(cfg)
    with pytest.raises(ValueError, match="q\\(st\\|ht,ot\\)"):
        model.init(
            jax.random.PRNGKey(0),
            {"image_horizon": jnp.zeros((2, 1, 64, 64, 3)),
             "sound": jnp.zeros((2, 1, 128, 20))},
            jnp.zeros((2, 1, 3)), jnp.ones((2, 1, 1)), None, train=False)


def test_torch_interop_guarded(cat_setup):
    from multimodal_rssm_tpu.io import torch_export, torch_import

    cfg, model, _ = cat_setup
    with pytest.raises(ValueError, match="Gaussian"):
        torch_import.import_world_model({}, model)
    with pytest.raises(ValueError, match="Gaussian"):
        torch_export.export_world_model(model, {"params": {}})


# -- cross-subsystem integration ------------------------------------------


def test_behavior_step_categorical(cat_setup):
    """Dreamer-style behavior learning trains through the straight-through
    discrete latent: actor/value update step finite, both networks move."""
    import copy

    from multimodal_rssm_tpu.train import behavior as bh
    from multimodal_rssm_tpu.train import trainer as tr

    cfg, model, D = cat_setup
    cfg = copy.deepcopy(cfg)
    bh.behavior_cfg(cfg)
    cfg.behavior.horizon = 4
    spec = tr.build_aug_spec(D)
    draws = tr.HostAugmentDraws(D, spec)
    key = jax.random.PRNGKey(0)
    obs, act, rew, nt = D.sample(4, 8)
    raw = ({k: jnp.asarray(v) for k, v in obs.items()}, jnp.asarray(act),
           jnp.asarray(rew), jnp.asarray(nt))
    prep = tr.prepare_observations(raw[0], spec, draws.draw(),
                                   int(cfg.env.bit_depth), key)
    wm_state = tr.init_train_state(model, cfg, tr.build_optimizer(cfg), key,
                                   (prep, *raw[1:]))
    wm_variables = {"params": wm_state.params,
                    "batch_stats": wm_state.batch_stats}
    actor, value = bh.build_policy_models(cfg)
    actor_opt, value_opt = bh.build_behavior_optimizers(cfg)
    bstate = bh.init_behavior_state(cfg, actor, value, actor_opt, value_opt,
                                    jax.random.PRNGKey(1))
    before = jax.device_get(bstate)
    step_fn = bh.make_behavior_step(model, cfg, actor, value, actor_opt,
                                    value_opt, spec)
    new_state, metrics = step_fn(
        jax.tree_util.tree_map(jnp.array, bstate), wm_variables, raw,
        draws.draw(), jax.random.PRNGKey(7))
    for k, v in jax.device_get(metrics).items():
        assert np.isfinite(v), (k, v)
    a0 = jax.tree_util.tree_leaves(before.actor_params)[0]
    a1 = jax.tree_util.tree_leaves(new_state.actor_params)[0]
    assert not np.allclose(np.asarray(a0), np.asarray(a1))


@pytest.mark.slow
def test_export_filter_step_categorical(cat_setup, tmp_path):
    """The serving artifact (jax.export) round-trips for the discrete
    latent: the flattened one-hot state travels through the same [h, s]
    calling convention."""
    import os

    from multimodal_rssm_tpu.io import export as ex
    from multimodal_rssm_tpu.ops.image import normalize_image_deterministic

    cfg, model, _ = cat_setup
    B = 1
    key = jax.random.PRNGKey(0)
    T = 3
    obs_seq = {
        "image_horizon": jnp.zeros((T, B, 64, 64, 3)),
        "sound": jnp.zeros((T, B, 128, 20)),
    }
    variables = model.init(key, obs_seq, jnp.zeros((T, B, 3)),
                           jnp.ones((T, B, 1)), key, train=False)
    art = ex.export_filter_step(cfg, model, variables, batch_size=B)
    path = ex.save_exported(art, str(tmp_path / "filter_step.jaxexport"))
    assert os.path.getsize(path) > 0
    exp = ex.load_exported(path)

    rng = np.random.default_rng(0)
    obs = {
        "image_horizon": rng.integers(0, 256, (B, 64, 64, 3), dtype=np.uint8),
        "sound": rng.normal(size=(B, 128, 20)).astype(np.float32),
    }
    h = jnp.zeros((B, model.belief_size), jnp.float32)
    s = jnp.zeros((B, model.state_size), jnp.float32)
    action = jnp.zeros((B, 3), jnp.float32)
    nt = jnp.ones((B, 1), jnp.float32)
    key2 = jax.random.PRNGKey(3)
    keydata = (key2 if key2.dtype == jnp.uint32
               else jax.random.key_data(key2))
    out = exp.call(h, s, action, {k: jnp.asarray(v) for k, v in obs.items()},
                   nt, keydata)
    bit_depth = int(cfg.env.bit_depth)
    norm = {
        k: (normalize_image_deterministic(jnp.asarray(v), bit_depth)
            if "image" in k else jnp.asarray(v, jnp.float32))
        for k, v in obs.items()
    }
    ref = model.apply(variables, h, s, action, norm, nt, key2, True, False,
                      method=model.filter_step)
    assert out["posterior_states"].shape == (B, model.state_size)
    np.testing.assert_allclose(np.asarray(out["posterior_states"]),
                               np.asarray(ref["posterior_states"]),
                               atol=1e-6)
    # det filter state is an (ulp-exact) one-hot per variable
    ps = np.asarray(out["posterior_states"]).reshape(B, 4, 6)
    np.testing.assert_allclose(ps.sum(-1), 1.0, atol=1e-5)


@pytest.mark.slow
def test_det_imagination_uses_mode_onehots(cat_setup):
    """Det-mode imagination for categorical latents seeds and decodes with
    the MODE one-hot states (DreamerV2/V3 convention), never with the
    probability vectors posterior_means/prior_means flatten — the dynamics
    carry is the one-hot, and the decoder never saw probability-vector
    inputs in training (ADVICE r3)."""
    from multimodal_rssm_tpu.eval import imagination
    from multimodal_rssm_tpu.train import trainer as tr

    cfg, model, D = cat_setup
    spec = tr.build_aug_spec(D)
    key = jax.random.PRNGKey(5)
    obs, act, rew, nt = D.sample(2, 8)
    from multimodal_rssm_tpu.eval import state_estimation

    prep = tr.prepare_observations(
        {k: jnp.asarray(v) for k, v in obs.items()}, spec,
        state_estimation.fixed_draws(D, spec), int(cfg.env.bit_depth), key)
    obs_target = {k: v[1:] for k, v in prep.items()}
    actions = jnp.asarray(act)[:-1]
    # default __call__ init builds every module (incl. the decoders)
    variables = model.init(key, obs_target, actions, jnp.asarray(nt)[:-1],
                           key, train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    states = model.apply(variables, obs_target, actions,
                         jnp.asarray(nt)[:-1], None, True, False,
                         method=model.estimate_state)

    t_start, horizon = 2, 4
    roll, preds = imagination.imagine(model, variables, states, actions,
                                      t_start, horizon, det=True)
    V, K = 4, 6
    # the rollout carry states are exact one-hots per latent variable
    ps = np.asarray(roll["prior_states"]).reshape(horizon, 2, V, K)
    np.testing.assert_array_equal(np.sort(ps, axis=-1)[..., :-1], 0.0)
    np.testing.assert_allclose(ps.sum(-1), 1.0, atol=1e-6)
    # and the decoded predictions are conditioned on those one-hots
    expect = model.apply(variables, roll["beliefs"], roll["prior_states"],
                         False, method=model.decode)
    for name in preds:
        np.testing.assert_array_equal(np.asarray(preds[name]["loc"]),
                                      np.asarray(expect[name]["loc"]))


@pytest.mark.slow
def test_dp_sharded_step_matches_single_device_categorical():
    """The categorical train step under a data-parallel mesh reproduces the
    single-device step (the ST one-hot sample is a per-element function of
    pre-drawn noise, so sharding is exact up to the gradient all-reduce
    order).  Subprocess-isolated like every sharded-EXECUTION test — see
    tests/sharded_cases.py for the case body and the wedge diagnosis."""
    from tests._subproc import run_case

    run_case("categorical_dp")
