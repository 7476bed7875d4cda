"""Config-variant coverage: expert_dist q(st|ot), latent overshooting
enabled, predict_reward on, LogProb observation loss, draw_target
discriminator modality — each runs a real train step and stays finite."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_rssm_tpu.models.world_model import WorldModel
from multimodal_rssm_tpu.train import trainer as tr


def _steps(cfg, tiny_buffer, n=2):
    model = WorldModel.from_config(cfg)
    optimizer = tr.build_optimizer(cfg)
    spec = tr.build_aug_spec(tiny_buffer)
    draws = tr.HostAugmentDraws(tiny_buffer, spec)
    train_step, _ = tr.make_train_step(model, cfg, optimizer, spec)
    key = jax.random.PRNGKey(0)
    B, L = int(cfg.train.batch_size), int(cfg.train.chunk_size)
    obs, act, rew, nt = tiny_buffer.sample(B, L)
    raw = ({k: jnp.asarray(v) for k, v in obs.items()},
           jnp.asarray(act), jnp.asarray(rew), jnp.asarray(nt))
    prep = tr.prepare_observations(raw[0], spec, draws.draw(),
                                   int(cfg.env.bit_depth), key)
    state = tr.init_train_state(model, cfg, optimizer, key,
                                (prep, raw[1], raw[2], raw[3]))
    metrics = None
    for i in range(n):
        key, k = jax.random.split(key)
        state, metrics = train_step(state, raw, draws.draw(), k)
    return state, {k: float(v) for k, v in metrics.items()}


@pytest.mark.slow
def test_expert_dist_q_st_ot(tiny_cfg, tiny_buffer):
    """q(st|ot): experts come straight from the stochastic encoder
    (ref MRSSM_PoE expert_dist dispatch, MRSSM_PoE/algo.py:44-61)."""
    cfg = copy.deepcopy(tiny_cfg)
    cfg.rssm.multimodal_params.expert_dist = "q(st|ot)"
    cfg.rssm.multimodal_params.fusion_method = "PoE"
    state, metrics = _steps(cfg, tiny_buffer)
    assert np.isfinite(metrics["loss"])
    # no per-modality obs-head projections exist in this mode
    assert "obs_proj_image_horizon" not in state.params["core"]
    assert "image_horizon_head" in state.params["encoder"]


@pytest.mark.slow
def test_overshooting_enabled(tiny_cfg, tiny_buffer):
    """overshooting_kl_beta != 0 wires the vectorised prior re-rollout into
    the loss (ref base/algo.py:190-193)."""
    cfg = copy.deepcopy(tiny_cfg)
    cfg.rssm.overshooting_kl_beta = 1.0
    cfg.rssm.overshooting_distance = 3
    base_cfg = copy.deepcopy(tiny_cfg)
    _, m_base = _steps(base_cfg, tiny_buffer, n=1)
    _, m_os = _steps(cfg, tiny_buffer, n=1)
    assert np.isfinite(m_os["kl_loss_sum"])
    # overshoot KL adds at least the free-nats floor on top of the base sum
    assert m_os["kl_loss_sum"] > m_base["kl_loss_sum"]


@pytest.mark.slow
def test_predict_reward_and_logprob_loss(tiny_cfg, tiny_buffer):
    cfg = copy.deepcopy(tiny_cfg)
    cfg.rssm.predict_reward = True
    cfg.rssm.worldmodel_LogProbLoss = True
    _, metrics = _steps(cfg, tiny_buffer)
    assert metrics["reward_loss"] != 0.0
    assert np.isfinite(metrics["loss"])


@pytest.mark.slow
def test_mopoe_overshooting_variant(tiny_cfg, tiny_buffer):
    cfg = copy.deepcopy(tiny_cfg)
    cfg.rssm.multimodal_params.fusion_method = "MoPoE"
    cfg.rssm.overshooting_kl_beta = 0.5
    cfg.rssm.overshooting_distance = 2
    _, metrics = _steps(cfg, tiny_buffer, n=1)
    assert np.isfinite(metrics["loss"])


def test_draw_target_discriminator(rng):
    """The draw_target label modality uses the Discriminator head with
    cross-entropy (ref observation_model.py:515-533)."""
    from multimodal_rssm_tpu.models.decoders import build_observation_model

    dec = build_observation_model(
        "draw_target", {"draw_target": (4,)}, belief_size=16, state_size=8,
        hidden_size=16, embedding_size={"other": 8, "image": 8, "sound": 8},
        activation_function={"cnn": "relu", "dense": "elu"},
        normalization=None, dtype=jnp.float32,
    )
    h = jnp.asarray(rng.normal(size=(3, 2, 16)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(3, 2, 8)).astype(np.float32))
    onehot = jnp.zeros((3, 2, 4)).at[..., 1].set(1.0)
    v = dec.init(jax.random.PRNGKey(0), h, s)
    out = dec.apply(v, h, s)
    assert out["loc"].shape == (3, 2, 4)
    ce = dec.apply(v, h, s, onehot, method=dec.get_log_prob)
    assert ce.shape == (3, 2, 4)
    assert np.isfinite(np.asarray(ce)).all()


@pytest.mark.slow
def test_scan_unroll_equivalent(tiny_cfg, tiny_buffer):
    """rssm.scan_unroll only changes how XLA schedules the time loop
    (lax.scan unroll=k replicates the cell body); same seeds must give the
    same training trajectory.  Measured perf-neutral on v5e at reference
    scale (DESIGN.md negative results) but kept plumbed; this pins the
    exactness contract so the knob can never drift the math."""
    key = jax.random.PRNGKey(0)
    B, L = int(tiny_cfg.train.batch_size), int(tiny_cfg.train.chunk_size)
    obs, act, rew, nt = tiny_buffer.sample(B, L)
    raw = ({k: jnp.asarray(v) for k, v in obs.items()},
           jnp.asarray(act), jnp.asarray(rew), jnp.asarray(nt))
    spec = tr.build_aug_spec(tiny_buffer)
    draw = tr.HostAugmentDraws(tiny_buffer, spec).draw()

    def run(cfg):
        model = WorldModel.from_config(cfg)
        optimizer = tr.build_optimizer(cfg)
        train_step, _ = tr.make_train_step(model, cfg, optimizer, spec)
        prep = tr.prepare_observations(raw[0], spec, draw,
                                       int(cfg.env.bit_depth), key)
        state = tr.init_train_state(model, cfg, optimizer, key,
                                    (prep, raw[1], raw[2], raw[3]))
        metrics = None
        for i in range(2):
            state, metrics = train_step(state, raw, draw,
                                        jax.random.fold_in(key, i))
        return {k: float(v) for k, v in metrics.items()}

    unrolled = copy.deepcopy(tiny_cfg)
    unrolled.rssm.scan_unroll = 7  # chunk 8 -> T-1 = 7: full unroll
    m_base = run(copy.deepcopy(tiny_cfg))
    m_unroll = run(unrolled)
    for k in m_base:
        np.testing.assert_allclose(m_unroll[k], m_base[k], rtol=1e-4,
                                   atol=1e-5, err_msg=k)
