"""SoundEncoder / SoundDecoder (v1, GLU+BatchNorm stacks — present in the
reference but unused by its shipped configs): shape contracts and torch
parity of the encoder."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_rssm_tpu.models.decoders import SoundDecoder
from multimodal_rssm_tpu.models.encoders import SoundEncoder

REFERENCE = "/root/reference"


def test_sound_encoder_v1_shape(rng):
    m = SoundEncoder(embedding_size=250)
    x = jnp.asarray(rng.normal(size=(4, 128, 20)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (4, 250)


def test_sound_decoder_v1_shape(rng):
    m = SoundDecoder()
    h = jnp.asarray(rng.normal(size=(3, 2, 48)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(3, 2, 16)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), h, s, train=False)
    out = m.apply(v, h, s, train=False)
    assert out["loc"].shape == (3, 2, 128, 20)


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="no reference")
def test_sound_encoder_v1_torch_parity(rng):
    torch = pytest.importorskip("torch")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from utils.models.encoder import SoundEncoder as TorchSoundEncoder

    from multimodal_rssm_tpu.io import torch_import

    torch.manual_seed(0)
    ref = TorchSoundEncoder(embbed_size=250)
    ref.eval()
    sd = ref.state_dict()

    params, stats = {}, {}
    for i in range(5):
        params[f"conv{i}"] = torch_import.conv2d(sd, f"conv.{i*3}")
        p, s = torch_import.norm(sd, f"conv.{i*3+1}")
        params[f"norm{i}"] = p
        stats[f"norm{i}"] = s

    m = SoundEncoder(embedding_size=250)
    x = rng.normal(size=(4, 128, 20)).astype(np.float32) * 0.3
    with torch.no_grad():
        out_ref = ref(torch.tensor(x)).numpy()
    out = m.apply({"params": params, "batch_stats": stats}, jnp.asarray(x),
                  train=False)
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-4, atol=1e-4)
