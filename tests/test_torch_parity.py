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


def _jax_model(normalization="BatchNorm", fusion_method="PoE"):
    return WorldModel(
        observation_names_enc=NAMES,
        observation_names_rec=NAMES,
        observation_shapes=SHAPES,
        embedding_size=EMB,
        activation_function=ACT,
        belief_size=BELIEF, state_size=STATE, hidden_size=HIDDEN,
        action_size=ACTION_SIZE,
        normalization=normalization,
        multimodal=True,
        fusion_method=fusion_method,
        expert_dist="q(st|ht,ot)",
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
