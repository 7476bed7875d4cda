"""Actor/value heads (models/policy.py): shapes, tanh bounds, det action;
Mixer/EncoderNN single-vector fusion path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_rssm_tpu.models.encoders import EncoderNN, Mixer
from multimodal_rssm_tpu.models.policy import ActorModel, Pie, ValueModel

B, H, S, A = 4, 16, 8, 3


def test_value_model_shapes(rng):
    m = ValueModel(hidden_size=32)
    h = jnp.asarray(rng.normal(size=(5, B, H)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(5, B, S)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), h, s)
    out = m.apply(v, h, s)
    assert out["loc"].shape == (5, B)
    np.testing.assert_array_equal(np.asarray(out["scale"]), 1.0)


def test_value_model_matches_torch(rng):
    """4-layer MLP parity vs the reference ValueModel (policy.py:11-43)."""
    torch = pytest.importorskip("torch")
    import sys, os

    if os.path.isdir("/root/reference") and "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from utils.models.policy import ValueModel as TorchValue

    from multimodal_rssm_tpu.io import torch_import

    torch.manual_seed(0)
    ref = TorchValue(belief_size=H, state_size=S, hidden_size=32,
                     activation_function="relu")
    ref.eval()
    m = ValueModel(hidden_size=32, activation_function="relu")
    params = {f"fc{i}": torch_import.dense(ref.state_dict(), f"fc{i}")
              for i in (1, 2, 3, 4)}
    h = rng.normal(size=(5, B, H)).astype(np.float32)
    s = rng.normal(size=(5, B, S)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(h), torch.tensor(s))["loc"].numpy()
    out = m.apply({"params": params}, jnp.asarray(h), jnp.asarray(s))["loc"]
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-5, atol=1e-5)


def test_pie_distribution(rng):
    m = Pie(hidden_size=32, action_size=A, mean_scale=5.0, init_std=5.0)
    h = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(B, S)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), h, s)
    d = m.apply(v, h, s)
    assert d["loc"].shape == (B, A)
    assert np.all(np.abs(np.asarray(d["loc"])) <= 5.0)  # mean_scale tanh bound
    assert np.all(np.asarray(d["scale"]) > 1e-4)


def test_actor_action_bounds(rng):
    m = ActorModel(hidden_size=32, action_size=A)
    h = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(B, S)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    v = m.init(key, h, s, key)
    a = m.apply(v, h, s, key)
    assert a.shape == (B, A)
    assert np.all(np.abs(np.asarray(a)) <= 1.0)  # tanh squashed
    a_det = m.apply(v, h, s, key, det=True, method=m.get_action)
    assert a_det.shape == (B, A)
    assert np.all(np.abs(np.asarray(a_det)) <= 1.0)


def test_mixer_and_encoder_nn(rng, tiny_cfg):
    shapes = {"image_horizon": (3, 64, 64), "sound": (128, 20)}
    emb = {"fusion": 32, "image": 24, "sound": 16, "other": 8}
    actf = {"cnn": "relu", "dense": "elu", "fusion": "relu"}
    obs = {
        "image_horizon": jnp.asarray(
            rng.normal(size=(6, 64, 64, 3)).astype(np.float32)),
        "sound": jnp.asarray(rng.normal(size=(6, 128, 20)).astype(np.float32)),
    }
    m = EncoderNN(observation_names_enc=("image_horizon", "sound"),
                  observation_shapes=shapes, embedding_size=emb,
                  activation_function=actf, normalization=None)
    v = m.init(jax.random.PRNGKey(0), obs, train=False)
    out = m.apply(v, obs, train=False)
    assert out.shape == (6, 32)  # fused embedding

    hiddens = {"a": jnp.ones((6, 4)), "b": jnp.ones((6, 3))}
    mix = Mixer(output_size=10)
    vm = mix.init(jax.random.PRNGKey(1), hiddens)
    assert mix.apply(vm, hiddens).shape == (6, 10)
