"""Shape/grad contract tests for the non-64px image codec variants and the
normalization options (SURVEY §2: ImageEncoder_84/128/256 ref
encoder.py:362-615, ImageDecoder_84/128/256 ref observation_model.py:108-378,
norm variants None/Batch/Instance/Group ref :415-509)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_rssm_tpu.models.decoders import build_observation_model
from multimodal_rssm_tpu.models.encoders import build_encoder

EMB = {"image": 64, "sound": 32, "other": 16}
ACT = {"cnn": "relu", "dense": "relu"}


def _roundtrip(size, normalization):
    name = "image_horizon" if size == 64 else f"image_horizon_{size}"
    shapes = {name: (3, size, size)}
    enc = build_encoder(name, shapes, EMB, ACT, normalization, jnp.float32)
    dec = build_observation_model(
        name, shapes, belief_size=32, state_size=8, hidden_size=32,
        embedding_size=EMB, activation_function=ACT,
        normalization=normalization, dtype=jnp.float32)

    x = jax.random.normal(jax.random.PRNGKey(0), (2, size, size, 3))
    ev = enc.init(jax.random.PRNGKey(1), x, True)
    emb, _ = enc.apply(ev, x, True, mutable=["batch_stats"])
    assert emb.shape == (2, EMB["image"]), emb.shape

    h = jnp.ones((1, 2, 32))
    s = jnp.ones((1, 2, 8))
    dv = dec.init(jax.random.PRNGKey(2), h, s, True)
    out, _ = dec.apply(dv, h, s, True, mutable=["batch_stats"])
    assert out["loc"].shape == (1, 2, size, size, 3), out["loc"].shape  # NHWC (deviation D1)

    # gradients flow and are finite through both stacks
    def loss(ep, dp):
        e, _ = enc.apply({**ev, "params": ep}, x, True, mutable=["batch_stats"])
        o, _ = dec.apply({**dv, "params": dp}, h, s, True,
                         mutable=["batch_stats"])
        return jnp.sum(e ** 2) + jnp.sum(o["loc"] ** 2)

    ge, gd = jax.grad(loss, (0, 1))(ev["params"], dv["params"])
    for g in jax.tree_util.tree_leaves(ge) + jax.tree_util.tree_leaves(gd):
        assert bool(jnp.all(jnp.isfinite(g)))


@pytest.mark.parametrize("size", [84, 128, 256])
@pytest.mark.slow
def test_image_codec_sizes(size):
    _roundtrip(size, None)


@pytest.mark.parametrize("normalization",
                         ["BatchNorm", "InstanceNorm", "GroupNorm"])
@pytest.mark.slow
def test_image_codec_normalizations(normalization):
    _roundtrip(64, normalization)
