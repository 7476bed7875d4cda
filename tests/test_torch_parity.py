"""Numerical parity against the PyTorch reference implementation.

Loads the reference package (read-only, mounted at /root/reference) as the
golden oracle: builds its torch modules, exports their state_dicts in the
reference checkpoint schema (algos/MRSSM/base/algo.py:328-335), converts
them with io/torch_import.py, and asserts this framework's forward passes
match to float32 tolerance.  This is the SURVEY §4(f) parity harness.

Skipped automatically when the reference checkout or torch is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)
torch = pytest.importorskip("torch")

if os.path.isdir(REFERENCE) and REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_rssm_tpu.io import torch_import  # noqa: E402
from multimodal_rssm_tpu.models.world_model import WorldModel  # noqa: E402

# tiny-but-real sizes (conv channel widths are fixed by the architecture)
BELIEF, STATE, HIDDEN = 32, 8, 16
EMB = {"fusion": 40, "image": 40, "sound": 32, "other": 12}
ACT = {"cnn": "relu", "dense": "elu", "fusion": "relu"}
SHAPES = {"image_horizon": (3, 64, 64), "sound": (128, 20), "pose_quat_v2": (3,)}
NAMES = ("image_horizon", "sound")
ACTION_SIZE = 3
T, B = 5, 2


def _torch_models(normalization="BatchNorm", fusion_method="PoE"):
    from utils.models.encoder import MultimodalEncoder
    from utils.models.observation_model import MultimodalObservationModel
    from utils.models.reward_model import RewardModel
    from utils.models.transition_model import MultimodalTransitionModel

    torch.manual_seed(0)
    device = torch.device("cpu")
    transition = MultimodalTransitionModel(
        belief_size=BELIEF, state_size=STATE, action_size=ACTION_SIZE,
        hidden_size=HIDDEN, observation_names_enc=list(NAMES),
        embedding_size=dict(EMB), activation_function="elu",
        device=device, fusion_method=fusion_method, expert_dist="q(st|ht,ot)",
    )
    encoder = MultimodalEncoder(
        observation_names_enc=list(NAMES),
        observation_shapes={k: list(v) for k, v in SHAPES.items()},
        embedding_size=dict(EMB), activation_function=dict(ACT),
        normalization=normalization, device=device,
    )
    observation_model = MultimodalObservationModel(
        observation_names_rec=list(NAMES),
        observation_shapes={k: list(v) for k, v in SHAPES.items()},
        embedding_size=dict(EMB), belief_size=BELIEF, state_size=STATE,
        hidden_size=HIDDEN, activation_function=dict(ACT),
        normalization=normalization, device=device,
    )
    reward = RewardModel(h_size=BELIEF, s_size=STATE, hidden_size=HIDDEN,
                         activation="elu")
    return transition, encoder, observation_model, reward


def _state_dicts(transition, encoder, observation_model, reward):
    """Reference checkpoint schema (base/algo.py:328-335)."""
    return {
        "transition_model": transition.get_state_dict(),
        "observation_model": observation_model.get_state_dict(),
        "reward_model": reward.state_dict(),
        "encoder": encoder.get_state_dict(),
    }


def _jax_model(normalization="BatchNorm", fusion_method="PoE",
               core_activation=None, multimodal=True, names=NAMES):
    # core_activation=None -> dense ('elu'), matching the torch modules
    # built by _torch_models with an explicit activation; the oracle tests
    # pass "relu" because the reference MULTIMODAL algo classes leave the
    # transition ctor default (quirk #11, see WorldModel.core_activation) —
    # the unimodal RSSM threads dense through (RSSM/algo.py:18-19), so the
    # unimodal oracle test passes None.
    return WorldModel(
        observation_names_enc=tuple(names),
        observation_names_rec=tuple(names),
        observation_shapes=SHAPES,
        embedding_size=EMB,
        activation_function=ACT,
        belief_size=BELIEF, state_size=STATE, hidden_size=HIDDEN,
        action_size=ACTION_SIZE,
        normalization=normalization,
        multimodal=multimodal,
        fusion_method=fusion_method,
        expert_dist="q(st|ht,ot)",
        core_activation=core_activation,
    )


def _set_eval(*mods):
    for m in mods:
        if hasattr(m, "_eval"):
            m._eval()
        elif hasattr(m, "eval"):
            m.eval()


@pytest.fixture(scope="module")
def parity_setup(rng):
    transition, encoder, obs_model, reward = _torch_models()
    _set_eval(transition, encoder, obs_model, reward)
    model = _jax_model()
    variables = torch_import.import_world_model(
        _state_dicts(transition, encoder, obs_model, reward), model
    )
    obs_np = {
        "image_horizon": rng.normal(size=(T, B, 3, 64, 64)).astype(np.float32) * 0.3,
        "sound": rng.normal(size=(T, B, 128, 20)).astype(np.float32) * 0.3,
    }
    actions = rng.normal(size=(T, B, ACTION_SIZE)).astype(np.float32)
    nonterm = np.ones((T, B, 1), np.float32)
    nonterm[2, 0, 0] = 0.0  # exercise the mask path
    return transition, encoder, obs_model, reward, model, variables, obs_np, actions, nonterm


def test_encoder_parity(parity_setup):
    _, encoder, _, _, model, variables, obs_np, _, _ = parity_setup
    with torch.no_grad():
        flat = {k: torch.tensor(v.reshape(T * B, *v.shape[2:])) for k, v in obs_np.items()}
        ref = encoder(flat)
    obs_hwc = {
        "image_horizon": jnp.asarray(obs_np["image_horizon"].transpose(0, 1, 3, 4, 2)),
        "sound": jnp.asarray(obs_np["sound"]),
    }
    got = model.apply(variables, obs_hwc, False, method=model.encode)
    for name in NAMES:
        np.testing.assert_allclose(
            np.asarray(got[name]).reshape(T * B, -1),
            ref[name].numpy(),
            rtol=1e-4, atol=1e-4,
        )


def test_estimate_state_parity(parity_setup):
    transition, encoder, _, _, model, variables, obs_np, actions, nonterm = parity_setup
    from utils.models.encoder import bottle_tupele_multimodal

    with torch.no_grad():
        obs_t = {k: torch.tensor(v) for k, v in obs_np.items()}
        emb = bottle_tupele_multimodal(encoder, obs_t)
        outs = transition(
            torch.zeros(B, STATE), torch.tensor(actions),
            torch.zeros(B, BELIEF), emb, torch.tensor(nonterm), det=True,
        )
    (beliefs, prior_states, prior_means, prior_stds,
     post_states, post_means, post_stds, expert_means, expert_stds) = outs

    obs_hwc = {
        "image_horizon": jnp.asarray(obs_np["image_horizon"].transpose(0, 1, 3, 4, 2)),
        "sound": jnp.asarray(obs_np["sound"]),
    }
    states = model.apply(
        variables, obs_hwc, jnp.asarray(actions), jnp.asarray(nonterm),
        None, True, False, method=model.estimate_state,
    )
    np.testing.assert_allclose(np.asarray(states["beliefs"]), beliefs.numpy(),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(states["prior_means"]), prior_means.numpy(),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(states["prior_std_devs"]), prior_stds.numpy(),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(states["posterior_means"]), post_means.numpy(),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(states["posterior_std_devs"]), post_stds.numpy(),
                               rtol=1e-4, atol=2e-4)
    for name in ("prior_expert", *NAMES):
        np.testing.assert_allclose(
            np.asarray(states["expert_means"][name]), expert_means[name].numpy(),
            rtol=1e-4, atol=2e-4, err_msg=name,
        )
        np.testing.assert_allclose(
            np.asarray(states["expert_std_devs"][name]), expert_stds[name].numpy(),
            rtol=1e-4, atol=2e-4, err_msg=name,
        )


def test_decoder_and_reward_parity(parity_setup, rng):
    _, _, obs_model, reward, model, variables, _, _, _ = parity_setup
    h = rng.normal(size=(T, B, BELIEF)).astype(np.float32)
    s = rng.normal(size=(T, B, STATE)).astype(np.float32)
    with torch.no_grad():
        ref = obs_model(torch.tensor(h), torch.tensor(s))
        ref_r = reward(torch.tensor(h), torch.tensor(s))
    got = model.apply(variables, jnp.asarray(h), jnp.asarray(s), False,
                      method=model.decode)
    img = np.asarray(got["image_horizon"]["loc"]).transpose(0, 1, 4, 2, 3)  # -> NCHW
    np.testing.assert_allclose(img, ref["image_horizon"]["loc"].numpy(),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got["sound"]["loc"]),
                               ref["sound"]["loc"].numpy(), rtol=1e-4, atol=2e-4)
    got_r = model.apply(variables, jnp.asarray(h), jnp.asarray(s),
                        method=model.reward)
    np.testing.assert_allclose(np.asarray(got_r["loc"]), ref_r["loc"].numpy(),
                               rtol=1e-4, atol=2e-4)


def test_mopoe_estimate_state_parity(rng):
    """Same rollout parity under MoPoE fusion."""
    transition, encoder, obs_model, reward = _torch_models(fusion_method="MoPoE")
    _set_eval(transition, encoder, obs_model, reward)
    model = _jax_model(fusion_method="MoPoE")
    variables = torch_import.import_world_model(
        _state_dicts(transition, encoder, obs_model, reward), model
    )
    from utils.models.encoder import bottle_tupele_multimodal

    obs_np = {
        "image_horizon": rng.normal(size=(T, B, 3, 64, 64)).astype(np.float32) * 0.3,
        "sound": rng.normal(size=(T, B, 128, 20)).astype(np.float32) * 0.3,
    }
    actions = rng.normal(size=(T, B, ACTION_SIZE)).astype(np.float32)
    with torch.no_grad():
        obs_t = {k: torch.tensor(v) for k, v in obs_np.items()}
        emb = bottle_tupele_multimodal(encoder, obs_t)
        outs = transition(
            torch.zeros(B, STATE), torch.tensor(actions),
            torch.zeros(B, BELIEF), emb, None, det=True,
        )
    post_means = outs[5]
    obs_hwc = {
        "image_horizon": jnp.asarray(obs_np["image_horizon"].transpose(0, 1, 3, 4, 2)),
        "sound": jnp.asarray(obs_np["sound"]),
    }
    states = model.apply(
        variables, obs_hwc, jnp.asarray(actions), None, None, True, False,
        method=model.estimate_state,
    )
    np.testing.assert_allclose(np.asarray(states["posterior_means"]),
                               post_means.numpy(), rtol=1e-4, atol=2e-4)


# -- torch-oracle ELBO parity (VERDICT r1 missing #3) ---------------------
#
# Runs the REFERENCE's actual loss assembly (RSSM_base._get_model_loss /
# _calc_loss, algos/MRSSM/base/algo.py:165-232, and the MoPoE overrides
# MRSSM_MoPoE/algo.py:69-137) end-to-end on its own algo classes, exports
# the torch weights, and asserts every ELBO term our make_loss_fn produces
# matches.  Both sides run deterministically (torch Normal.rsample patched
# to the mean; our loss called with key=None so every eps is zero), which
# makes the comparison exact rather than distribution-level.  This retires
# the round-1 self-referential risk of validating overshooting only against
# a builder-written oracle (tests/test_overshoot.py).


def _stub_wandb():
    """The reference algo modules import wandb at module scope
    (base/algo.py:9); it is not installed here.  Stub the import — the
    tests never enable cfg.main.wandb, so no stubbed attribute is called."""
    import sys as _sys
    import types

    if "wandb" not in _sys.modules:
        _sys.modules["wandb"] = types.ModuleType("wandb")


def _oracle_cfg(fusion_method="PoE", log_prob=False, kl_alpha=0.5,
                overshooting_reward_scale=1.0, multimodal=True, names=NAMES):
    """Tiny config consumed by BOTH the reference algo classes (attribute
    access, e.g. cfg.rssm.belief_size) and our make_loss_fn."""
    from multimodal_rssm_tpu.core.config import ConfigDict

    return ConfigDict({
        "main": {"device": "cpu", "wandb": False},
        "env": {"action_size": ACTION_SIZE,
                "observation_shapes": {k: list(v) for k, v in SHAPES.items()}},
        "train": {"batch_size": B, "chunk_size": T, "use_amp": False},
        "rssm": {
            "belief_size": BELIEF, "state_size": STATE, "hidden_size": HIDDEN,
            "observation_names_enc": list(names),
            "observation_names_rec": list(names),
            "embedding_size": dict(EMB),
            "activation_function": dict(ACT),
            "normalization": "BatchNorm",
            "multimodal": multimodal,
            "multimodal_params": {"fusion_method": fusion_method,
                                   "expert_dist": "q(st|ht,ot)"},
            "min_std_dev": 0.1,
            "free_nats": 3.0,
            "kl_beta": 1.0,
            "kl_balancing_alpha": kl_alpha,
            "global_kl_beta": 0.1,
            "overshooting_distance": 3,
            "overshooting_kl_beta": 0.5,
            "overshooting_reward_scale": overshooting_reward_scale,
            "worldmodel_LogProbLoss": log_prob,
            "predict_reward": True,
            "learning_rate_schedule": 0,
            "model_learning_rate": 1e-3,
            "adam_epsilon": 1e-7,
            "grad_clip_norm": 100.0,
        },
    })


def _build_reference_algo(cfg):
    _stub_wandb()
    if not cfg.rssm.multimodal:
        from algos.MRSSM.RSSM.algo import RSSM as cls
    elif cfg.rssm.multimodal_params.fusion_method == "MoPoE":
        from algos.MRSSM.MRSSM_MoPoE.algo import MRSSM_MoPoE as cls
    else:
        from algos.MRSSM.MRSSM_PoE.algo import MRSSM_PoE as cls
    torch.manual_seed(0)
    return cls(cfg, torch.device("cpu"))


def _oracle_batch(rng):
    obs_np = {
        "image_horizon": rng.normal(size=(T, B, 3, 64, 64)).astype(np.float32) * 0.3,
        "sound": rng.normal(size=(T, B, 128, 20)).astype(np.float32) * 0.3,
    }
    actions = rng.normal(size=(T, B, ACTION_SIZE)).astype(np.float32)
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    nonterm = np.ones((T, B, 1), np.float32)
    nonterm[2, 0, 0] = 0.0  # exercise episode-boundary masking
    return obs_np, actions, rewards, nonterm


def _reference_loss_terms(ref, obs_np, actions, rewards, nonterm, monkeypatch):
    """Run the reference's optimize() data path minus the backward pass:
    estimate_state (base/algo.py:337-366) then _get_model_loss (:217-232),
    deterministically."""
    monkeypatch.setattr(
        torch.distributions.Normal, "rsample",
        lambda self, sample_shape=torch.Size(): self.mean,
    )
    ref.eval()
    with torch.no_grad():
        obs_t = {k: torch.tensor(v) for k, v in obs_np.items()}
        obs_target = ref._clip_obs(obs_t, idx_start=1)
        actions_t = torch.tensor(actions)
        rewards_t = torch.tensor(rewards)
        nonterm_t = torch.tensor(nonterm)
        states = ref.estimate_state(
            obs_target, actions_t[:-1], rewards_t, nonterm_t[:-1]
        )
        model_loss, loss_info = ref._get_model_loss(
            obs_target, actions_t, rewards_t, nonterm_t, states
        )
    return float(model_loss), loss_info


def _our_loss_terms(cfg, ref, obs_np, actions, rewards, nonterm):
    from multimodal_rssm_tpu.train.trainer import make_loss_fn

    multimodal = bool(cfg.rssm.multimodal)
    model = _jax_model(
        fusion_method=(cfg.rssm.multimodal_params.fusion_method
                       if multimodal else "PoE"),
        # quirk #11 applies to the multimodal algo classes only
        core_activation="relu" if multimodal else None,
        multimodal=multimodal,
        names=tuple(cfg.rssm.observation_names_enc))
    variables = torch_import.import_world_model(ref.get_state_dict(), model)
    loss_fn = make_loss_fn(model, cfg)
    obs_hwc = {
        k: jnp.asarray(v.transpose(0, 1, 3, 4, 2) if v.ndim == 5 else v)
        for k, v in obs_np.items()
    }
    batch = (obs_hwc, jnp.asarray(actions), jnp.asarray(rewards),
             jnp.asarray(nonterm))
    total, (_, metrics) = loss_fn(
        variables["params"], variables.get("batch_stats", {}), batch,
        None, False,  # key=None -> det; train=False matches ref.eval()
    )
    return float(total), {k: float(v) for k, v in metrics.items()}


def _assert_terms_match(loss_info, metrics, total_ref, total_ours):
    keys = [k for k in loss_info
            if k.startswith("observation_") or k in
            ("observations_loss_sum", "reward_loss", "kl_loss", "kl_loss_sum")]
    assert any(k.startswith("observation_") and k != "observations_loss_sum"
               for k in keys)
    for key in keys:
        np.testing.assert_allclose(
            metrics[key], loss_info[key], rtol=5e-4, atol=5e-4, err_msg=key)
    np.testing.assert_allclose(total_ours, total_ref, rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("fusion_method", ["PoE", "MoPoE"])
def test_oracle_loss_assembly(fusion_method, rng, monkeypatch):
    """Every ELBO term (per-modality obs MSE, reward, balanced/MoPoE KL +
    free nats, global KL, latent overshooting incl. overshoot reward)
    matches the reference's _calc_loss on the same imported weights and
    batch.  Under det rollouts the reference's MoPoE quirk #10 (reward
    overshoot from the last subset iteration only) is numerically
    irrelevant — all subsets share the identical prior rollout — so the
    comparison is exact for both fusion methods."""
    cfg = _oracle_cfg(fusion_method=fusion_method)
    ref = _build_reference_algo(cfg)
    obs_np, actions, rewards, nonterm = _oracle_batch(rng)
    total_ref, loss_info = _reference_loss_terms(
        ref, obs_np, actions, rewards, nonterm, monkeypatch)
    total_ours, metrics = _our_loss_terms(
        cfg, ref, obs_np, actions, rewards, nonterm)
    _assert_terms_match(loss_info, metrics, total_ref, total_ours)


def test_oracle_loss_assembly_logprob_unbalanced(rng, monkeypatch):
    """LogProb observation/reward losses + unbalanced KL
    (kl_balancing_alpha: null) against the reference oracle."""
    cfg = _oracle_cfg(log_prob=True, kl_alpha=None,
                      overshooting_reward_scale=0.0)
    ref = _build_reference_algo(cfg)
    obs_np, actions, rewards, nonterm = _oracle_batch(rng)
    total_ref, loss_info = _reference_loss_terms(
        ref, obs_np, actions, rewards, nonterm, monkeypatch)
    total_ours, metrics = _our_loss_terms(
        cfg, ref, obs_np, actions, rewards, nonterm)
    _assert_terms_match(loss_info, metrics, total_ref, total_ours)


def test_oracle_loss_assembly_unimodal(rng, monkeypatch):
    """Unimodal loss assembly (RSSM._calc_observations_loss,
    algos/MRSSM/RSSM/algo.py:82-96, + the shared RSSM_base._calc_loss)
    against our make_loss_fn with multimodal=False — importing the REAL
    flat algo-level state dict the unimodal reference saves
    (RSSM.get_state_dict = self.state_dict(), RSSM/algo.py:48-49), which
    exercises torch_import.nest_flat_unimodal end to end through the loss.
    The unimodal core runs dense activation (elu) — quirk #11 is
    multimodal-only (RSSM/algo.py:18-19 threads it through)."""
    cfg = _oracle_cfg(multimodal=False, names=("image_horizon",))
    ref = _build_reference_algo(cfg)
    obs_np, actions, rewards, nonterm = _oracle_batch(rng)
    obs_np = {"image_horizon": obs_np["image_horizon"]}
    total_ref, loss_info = _reference_loss_terms(
        ref, obs_np, actions, rewards, nonterm, monkeypatch)
    total_ours, metrics = _our_loss_terms(
        cfg, ref, obs_np, actions, rewards, nonterm)
    _assert_terms_match(loss_info, metrics, total_ref, total_ours)


def test_gru_cell_parity(rng):
    from multimodal_rssm_tpu.models.layers import GRUCell

    H, I = 16, 12
    ref = torch.nn.GRUCell(I, H)
    x = rng.normal(size=(3, I)).astype(np.float32)
    h = rng.normal(size=(3, H)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(x), torch.tensor(h)).numpy()
    cell = GRUCell(features=H)
    params = {
        "wi": ref.weight_ih.detach().numpy().T,
        "wh": ref.weight_hh.detach().numpy().T,
        "bi": ref.bias_ih.detach().numpy(),
        "bh": ref.bias_hh.detach().numpy(),
    }
    out = cell.apply({"params": params}, jnp.asarray(h), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-5, atol=1e-5)
