"""Functional coverage for the remat policies (ADVICE r1, medium).

The user-facing ``rssm.remat`` values ('decoders', 'conv', 'decoders_conv',
True) change only WHERE activations are recomputed, never the math: a tiny
WorldModel fwd+bwd under each policy must produce gradients identical to
remat=False.  This exercises the save_only_these_names('conv_out') policy
path end to end (tag_conv_out on Conv/Dense/ConvTranspose outputs), which
conftest's global remat=False pin otherwise leaves untested.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_rssm_tpu.models.world_model import WorldModel

BELIEF, STATE, HIDDEN = 32, 8, 16
EMB = {"fusion": 40, "image": 40, "sound": 32, "other": 12}
ACT = {"cnn": "relu", "dense": "elu", "fusion": "relu"}
SHAPES = {"image_horizon": (3, 64, 64), "sound": (128, 20)}
NAMES = ("image_horizon", "sound")
T, B, A = 3, 2, 3


def _model(remat):
    return WorldModel(
        observation_names_enc=NAMES,
        observation_names_rec=NAMES,
        observation_shapes=SHAPES,
        embedding_size=EMB,
        activation_function=ACT,
        belief_size=BELIEF, state_size=STATE, hidden_size=HIDDEN,
        action_size=A,
        normalization="BatchNorm",
        multimodal=True,
        fusion_method="PoE",
        remat=remat,
    )


@pytest.fixture(scope="module")
def remat_inputs(rng):
    obs = {
        "image_horizon": jnp.asarray(
            rng.normal(size=(T, B, 64, 64, 3)).astype(np.float32) * 0.3),
        "sound": jnp.asarray(
            rng.normal(size=(T, B, 128, 20)).astype(np.float32) * 0.3),
    }
    actions = jnp.asarray(rng.normal(size=(T, B, A)).astype(np.float32))
    nonterm = jnp.ones((T, B, 1), jnp.float32)
    return obs, actions, nonterm


@pytest.fixture(scope="module")
def baseline(remat_inputs):
    obs, actions, nonterm = remat_inputs
    model = _model(False)
    variables = model.init(jax.random.PRNGKey(0), obs, actions, nonterm,
                           None, train=False)
    grads = _grads(model, variables, remat_inputs)
    return variables, grads


def _grads(model, variables, remat_inputs):
    obs, actions, nonterm = remat_inputs

    def loss(params):
        states, recon, rew = model.apply(
            {"params": params, **{k: v for k, v in variables.items()
                                  if k != "params"}},
            obs, actions, nonterm, None, train=False)
        l = sum(jnp.square(r["loc"] - obs[name]).mean()
                for name, r in recon.items())
        return l + jnp.square(states["posterior_means"]).mean()

    return jax.grad(loss)(variables["params"])


@pytest.mark.parametrize("remat", [True, "decoders", "conv", "decoders_conv"])
@pytest.mark.slow
def test_remat_policies_grad_equivalence(remat, baseline, remat_inputs):
    variables, ref_grads = baseline
    model = _model(remat)
    # same module tree -> same params apply under every remat wrapper
    grads = _grads(model, variables, remat_inputs)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        ref_grads, grads)
