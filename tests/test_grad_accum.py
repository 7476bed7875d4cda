"""Gradient accumulation (train.grad_accum): exactness and integration.

The accumulated gradient must EQUAL the full-batch gradient (not merely
approximate it): every loss term reduces as a mean over (T, B) with
batch-independent masks (losses/elbo.py, losses/overshoot.py), so the
average of equal-size microbatch gradients is the full-batch gradient up
to float rounding — PROVIDED activations are not coupled across the batch.
That holds for InstanceNorm/GroupNorm/None normalization (per-sample);
train-mode BatchNorm normalises with the (micro)batch's own statistics, so
under accumulation it sees microbatch statistics — the standard BatchNorm
accumulation semantics every framework has (measured here: ~1e-4 relative
loss shift on the tiny model).  Exactness is proven on the deterministic
(key=None) path with InstanceNorm; the keyed lax.scan path is exercised
through a real train step on the default (BatchNorm) config.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_rssm_tpu.models.world_model import WorldModel
from multimodal_rssm_tpu.train import trainer as tr


def _assert_grads_close(g_full, g_acc, rtol=2e-4):
    """Leaf-wise comparison with atol scaled to each tensor's magnitude:
    splitting a batch reduction reorders f32 accumulation, so near-zero
    elements of a tensor whose largest gradients are O(1) carry O(1e-4)
    absolute rounding noise — per-element rtol is the wrong yardstick."""
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_full)
    flat_a = jax.tree_util.tree_leaves(g_acc)
    for (path, gf), ga in zip(flat_f, flat_a):
        gf = np.asarray(gf)
        atol = max(float(np.abs(gf).max()), 1e-2) * rtol
        np.testing.assert_allclose(
            np.asarray(ga), gf, rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(path))


@pytest.fixture(scope="module")
def prepared(tiny_cfg, tiny_buffer):
    """Tiny model (per-sample InstanceNorm, so accumulation is exact) + a
    fully prepared (normalised) batch + init params."""
    cfg = copy.deepcopy(tiny_cfg)
    cfg.rssm.normalization = "InstanceNorm"
    model = WorldModel.from_config(cfg)
    optimizer = tr.build_optimizer(cfg)
    spec = tr.build_aug_spec(tiny_buffer)
    draws = tr.HostAugmentDraws(tiny_buffer, spec)
    key = jax.random.PRNGKey(7)
    B, L = int(cfg.train.batch_size), int(cfg.train.chunk_size)
    # Pin the sampler: tiny_buffer is session-scoped and its numpy RNG
    # advances with every earlier test that samples from it, so without
    # this the batch (and hence the f32 rounding noise the exactness
    # assertions ride on) is suite-order-dependent — observed as a rare
    # in-suite-only tolerance flake.  Restore the state afterwards so
    # other tests' sampling is unaffected.
    saved_rng = tiny_buffer.rng.bit_generator.state
    tiny_buffer.rng = np.random.default_rng(123)
    obs, act, rew, nt = tiny_buffer.sample(B, L)
    tiny_buffer.rng = np.random.default_rng()
    tiny_buffer.rng.bit_generator.state = saved_rng
    raw_obs = {k: jnp.asarray(v) for k, v in obs.items()}
    prep = tr.prepare_observations(
        raw_obs, spec, draws.draw(), int(cfg.env.bit_depth), key
    )
    batch = (prep, jnp.asarray(act), jnp.asarray(rew), jnp.asarray(nt))
    state = tr.init_train_state(model, cfg, optimizer, key, batch)
    return cfg, model, state, batch


@pytest.mark.slow
def test_accumulated_grads_exact(prepared):
    """accum=2 deterministic grads == full-batch deterministic grads."""
    cfg, model, state, batch = prepared
    loss_fn = tr.make_loss_fn(model, cfg)

    (loss_full, (_, m_full)), g_full = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params, state.batch_stats, batch, None, True)

    (loss_acc, (_, m_acc)), g_acc = tr.accumulated_value_and_grad(
        loss_fn, state.params, state.batch_stats, batch, None, accum=2
    )

    np.testing.assert_allclose(
        float(loss_acc), float(loss_full), rtol=1e-5)
    for k in m_full:
        np.testing.assert_allclose(
            float(m_acc[k]), float(m_full[k]), rtol=1e-4, atol=1e-6,
            err_msg=k)
    _assert_grads_close(g_full, g_acc, rtol=2e-4)


@pytest.mark.slow
def test_accumulated_grads_exact_with_overshoot(tiny_cfg, tiny_buffer,
                                                prepared):
    """Exactness holds with the vectorised overshooting term in the loss
    (its mask structure is per-(start, sample), independent of batch
    content)."""
    cfg = copy.deepcopy(tiny_cfg)
    cfg.rssm.overshooting_kl_beta = 1.0
    cfg.rssm.overshooting_distance = 3
    _, model, state, batch = prepared
    loss_fn = tr.make_loss_fn(model, cfg)
    (_, (_, m_full)), g_full = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, state.batch_stats, batch, None, True)
    (_, (_, m_acc)), g_acc = tr.accumulated_value_and_grad(
        loss_fn, state.params, state.batch_stats, batch, None, accum=4)
    np.testing.assert_allclose(
        float(m_acc["kl_loss_sum"]), float(m_full["kl_loss_sum"]), rtol=1e-5)
    _assert_grads_close(g_full, g_acc, rtol=5e-4)


def test_train_step_with_grad_accum(tiny_cfg, tiny_buffer):
    """The keyed lax.scan path through a real (jitted) train step: runs,
    finite, and the parameters move."""
    cfg = copy.deepcopy(tiny_cfg)
    cfg.train.grad_accum = 2
    model = WorldModel.from_config(cfg)
    optimizer = tr.build_optimizer(cfg)
    spec = tr.build_aug_spec(tiny_buffer)
    draws = tr.HostAugmentDraws(tiny_buffer, spec)
    train_step, _ = tr.make_train_step(model, cfg, optimizer, spec)
    key = jax.random.PRNGKey(3)
    B, L = int(cfg.train.batch_size), int(cfg.train.chunk_size)
    obs, act, rew, nt = tiny_buffer.sample(B, L)
    raw = ({k: jnp.asarray(v) for k, v in obs.items()},
           jnp.asarray(act), jnp.asarray(rew), jnp.asarray(nt))
    prep = tr.prepare_observations(raw[0], spec, draws.draw(),
                                   int(cfg.env.bit_depth), key)
    state = tr.init_train_state(model, cfg, optimizer, key,
                                (prep, raw[1], raw[2], raw[3]))
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    for _ in range(2):
        key, k = jax.random.split(key)
        state, metrics = train_step(state, raw, draws.draw(), k)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), state.params, p0)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_grad_accum_validation(tiny_cfg, prepared):
    """batch size not divisible by accum fails loudly; accum<1 rejected."""
    cfg, model, state, batch = prepared
    loss_fn = tr.make_loss_fn(model, cfg)
    with pytest.raises(ValueError, match="not divisible"):
        tr.accumulated_value_and_grad(
            loss_fn, state.params, state.batch_stats, batch, None, accum=3)
    bad = copy.deepcopy(tiny_cfg)
    bad.train.grad_accum = 0
    with pytest.raises(ValueError, match="grad_accum"):
        tr.resolve_grad_accum(bad)
