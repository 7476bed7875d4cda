"""DreamerV3 return/value transforms (ops/returns.py) and their behavior
integration (behavior.value_head=twohot_symlog, behavior.return_norm).

No reference counterpart — the reference's critic is a scale-1 Gaussian it
never trains; these are the robustness techniques the Dreamer lineage
standardised after it.
"""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rssm_tpu.ops import returns as rt


def test_symlog_roundtrip():
    x = jnp.asarray([-1e6, -42.0, -1.0, -1e-4, 0.0, 1e-4, 1.0, 42.0, 1e6])
    np.testing.assert_allclose(np.asarray(rt.symexp(rt.symlog(x))),
                               np.asarray(x), rtol=1e-5)
    # squashing: |symlog| grows logarithmically
    assert float(rt.symlog(jnp.asarray(1e6))) < 15.0


def test_twohot_encode_decode_inverse():
    bins = rt.bin_centers(255)
    x = jnp.asarray(np.random.default_rng(0).uniform(-19.9, 19.9, size=(7, 5)))
    enc = rt.twohot(x, bins)
    # rows are distributions with at most two support points
    np.testing.assert_allclose(np.asarray(enc.sum(-1)), 1.0, atol=1e-6)
    assert int((np.asarray(enc) > 0).sum(-1).max()) <= 2
    np.testing.assert_allclose(np.asarray(rt.twohot_decode(enc, bins)),
                               np.asarray(x), atol=1e-4)


def test_twohot_clips_out_of_range():
    bins = rt.bin_centers(11, -1.0, 1.0)
    enc = rt.twohot(jnp.asarray([-5.0, 5.0]), bins)
    np.testing.assert_allclose(np.asarray(enc[0, 0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(enc[1, -1]), 1.0, atol=1e-6)


def test_twohot_exact_bin_hit():
    bins = rt.bin_centers(5, 0.0, 4.0)  # [0, 1, 2, 3, 4]
    enc = np.asarray(rt.twohot(jnp.asarray([2.0]), bins))
    np.testing.assert_allclose(enc[0, 2], 1.0, atol=1e-6)
    np.testing.assert_allclose(enc[0].sum(), 1.0, atol=1e-6)


def test_return_scale_ema_and_normalization():
    # constant return spread 10 -> EMA converges toward 10
    rng = np.random.default_rng(1)
    scale = jnp.ones(())
    r = jnp.asarray(rng.uniform(0.0, 10.0, size=(1000,)))
    for _ in range(300):
        scale = rt.update_return_scale(scale, r, decay=0.97)
    spread = float(jnp.percentile(r, 95.0) - jnp.percentile(r, 5.0))
    assert abs(float(scale) - spread) < 0.5
    normed = rt.normalize_returns(r, scale)
    assert float(normed.max()) < 1.2
    # small spreads divide by 1, not by the tiny spread
    small = jnp.asarray(rng.uniform(0.0, 0.01, size=(100,)))
    np.testing.assert_allclose(np.asarray(rt.normalize_returns(small, jnp.asarray(0.01))),
                               np.asarray(small), atol=1e-7)


def test_return_scale_warmup_debias():
    """With ``step`` supplied, the statistic jumps to the first batch's
    spread at step 0 instead of crawling from the 1.0 seed (ADVICE r3 —
    DreamerV3 debiases its normalizer EMA for exactly this warmup)."""
    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.uniform(0.0, 1000.0, size=(1000,)))
    spread = float(jnp.percentile(r, 95.0) - jnp.percentile(r, 5.0))

    s0 = rt.update_return_scale(jnp.ones(()), r, decay=0.99, step=0)
    assert abs(float(s0) - spread) < 1e-3  # immediate, not ~1% of the way
    # later steps: the standard EMA from the carried value
    s1 = rt.update_return_scale(s0, r, decay=0.99, step=1)
    np.testing.assert_allclose(
        float(s1), 0.99 * float(s0) + 0.01 * spread, rtol=1e-6)
    # step traced (as inside the jitted behavior step) works too
    s0j = jax.jit(lambda st: rt.update_return_scale(
        jnp.ones(()), r, decay=0.99, step=st))(jnp.zeros((), jnp.int32))
    np.testing.assert_allclose(float(s0j), float(s0), rtol=1e-6)


def test_twohot_value_model_fits_large_scale_targets():
    """The discrete-regression critic regresses targets spanning orders of
    magnitude (1 to 1e4) — the exact failure mode of the scale-1 Gaussian
    head the reference ships."""
    import optax

    from multimodal_rssm_tpu.models.policy import TwoHotValueModel

    value = TwoHotValueModel(hidden_size=32, num_bins=255)
    rng = np.random.default_rng(2)
    T, B = 3, 8
    h = jnp.asarray(rng.normal(size=(T, B, 16)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(T, B, 8)).astype(np.float32))
    targets = jnp.asarray(
        10.0 ** rng.uniform(0, 4, size=(T, B)).astype(np.float32))
    params = value.init(jax.random.PRNGKey(0), h, s)["params"]
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    bins = rt.bin_centers(255)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = value.apply({"params": p}, h, s)
            tp = rt.twohot(rt.symlog(targets), bins)
            return -jnp.mean(
                jnp.sum(tp * jax.nn.log_softmax(out["logits"], -1), -1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(400):
        params, opt_state, loss = step(params, opt_state)
    pred = value.apply({"params": params}, h, s)["loc"]
    # symlog-space agreement (value-scale-free accuracy criterion)
    err = np.abs(np.asarray(rt.symlog(pred) - rt.symlog(targets)))
    assert err.mean() < 0.2, err.mean()


def test_behavior_step_v3_options(tiny_cfg, tiny_buffer):
    """One behavior update with twohot critic + return normalization:
    finite metrics, both nets move, the EMA scale leaves its init."""
    from multimodal_rssm_tpu.models.world_model import WorldModel
    from multimodal_rssm_tpu.train import behavior as bh
    from multimodal_rssm_tpu.train import trainer as tr

    cfg = copy.deepcopy(tiny_cfg)
    bh.behavior_cfg(cfg)
    cfg.behavior.horizon = 5
    cfg.behavior.value_head = "twohot_symlog"
    cfg.behavior.twohot_bins = 63
    cfg.behavior.return_norm = True
    cfg.behavior.return_norm_decay = 0.5

    model = WorldModel.from_config(cfg)
    D = tiny_buffer
    spec = tr.build_aug_spec(D)
    draws = tr.HostAugmentDraws(D, spec)
    key = jax.random.PRNGKey(0)
    obs, act, rew, nt = D.sample(int(cfg.train.batch_size),
                                 int(cfg.train.chunk_size))
    raw = ({k: jnp.asarray(v) for k, v in obs.items()}, jnp.asarray(act),
           jnp.asarray(rew), jnp.asarray(nt))
    prep = tr.prepare_observations(raw[0], spec, draws.draw(),
                                   int(cfg.env.bit_depth), key)
    wm_state = tr.init_train_state(model, cfg, tr.build_optimizer(cfg), key,
                                   (prep, *raw[1:]))
    wm_variables = {"params": wm_state.params,
                    "batch_stats": wm_state.batch_stats}
    actor, value = bh.build_policy_models(cfg)
    from multimodal_rssm_tpu.models.policy import TwoHotValueModel

    assert isinstance(value, TwoHotValueModel)
    actor_opt, value_opt = bh.build_behavior_optimizers(cfg)
    bstate = bh.init_behavior_state(cfg, actor, value, actor_opt, value_opt,
                                    jax.random.PRNGKey(1))
    before = jax.device_get(bstate)
    step_fn = bh.make_behavior_step(model, cfg, actor, value, actor_opt,
                                    value_opt, spec)
    new_state, metrics = step_fn(
        jax.tree_util.tree_map(jnp.array, bstate), wm_variables, raw,
        draws.draw(), jax.random.PRNGKey(7))
    metrics = jax.device_get(metrics)
    for k, v in metrics.items():
        assert np.isfinite(v), (k, v)
    assert "return_scale" in metrics
    assert float(new_state.return_scale) != float(before.return_scale)
    a0 = jax.tree_util.tree_leaves(before.actor_params)[0]
    a1 = jax.tree_util.tree_leaves(new_state.actor_params)[0]
    assert not np.allclose(np.asarray(a0), np.asarray(a1))
    v0 = jax.tree_util.tree_leaves(before.value_params)[0]
    v1 = jax.tree_util.tree_leaves(new_state.value_params)[0]
    assert not np.allclose(np.asarray(v0), np.asarray(v1))


def test_value_head_validation(tiny_cfg):
    from multimodal_rssm_tpu.train import behavior as bh

    cfg = copy.deepcopy(tiny_cfg)
    bh.behavior_cfg(cfg)
    cfg.behavior.value_head = "quantile"
    with pytest.raises(ValueError, match="value_head"):
        bh.build_policy_models(cfg)
