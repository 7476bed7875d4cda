"""PackedSingleChannelConv (the MXU-friendly banded reformulation of the
sound decoder's 1-output-channel conv) must match the direct conv exactly,
forward and gradient."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rssm_tpu.models.decoders import PackedSingleChannelConv


def test_packed_conv_matches_direct(rng):
    N, H, W, C = 3, 16, 20, 8
    x = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))
    mod = PackedSingleChannelConv((7, 7))
    variables = mod.init(jax.random.PRNGKey(0), x)
    k = variables["params"]["kernel"]
    assert k.shape == (7, 7, C, 1)

    y = mod.apply(variables, x)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[..., 0]
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_packed_conv_gradient(rng):
    N, H, W, C = 2, 8, 12, 4
    x = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(N, H, W)).astype(np.float32))
    mod = PackedSingleChannelConv((5, 5))
    variables = mod.init(jax.random.PRNGKey(1), x)
    k = variables["params"]["kernel"]

    gk = jax.grad(lambda kk: (mod.apply({"params": {"kernel": kk}}, x) * g).sum())(k)
    gk_ref = jax.grad(lambda kk: (jax.lax.conv_general_dilated(
        x, kk, (1, 1), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0] * g).sum())(k)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref), rtol=1e-4,
                               atol=1e-5)


def test_packed_width_conv_matches_direct(rng):
    """PackedWidthConv (input-side width packing for the C_in=1 sound
    encoder first conv) == plain conv, forward and kernel gradient."""
    from multimodal_rssm_tpu.models.encoders import PackedWidthConv
    from multimodal_rssm_tpu.models.layers import Conv, torch_padding

    N, H, W = 3, 16, 20
    x = jnp.asarray(rng.normal(size=(N, H, W, 1)).astype(np.float32))
    packed = PackedWidthConv(32, (3, 9), (1, 4), use_bias=False)
    plain = Conv(32, (3, 9), strides=(1, 1),
                 padding=torch_padding((1, 4)), use_bias=False)
    k = jnp.asarray((rng.normal(size=(3, 9, 1, 32)) / 27).astype(np.float32))
    vp = {"params": {"kernel": k}}
    np.testing.assert_allclose(
        np.asarray(packed.apply(vp, x)), np.asarray(plain.apply(vp, x)),
        rtol=1e-5, atol=1e-5)

    ga = jax.grad(lambda k: jnp.sum(jnp.sin(
        plain.apply({"params": {"kernel": k}}, x))))(k)
    gb = jax.grad(lambda k: jnp.sum(jnp.sin(
        packed.apply({"params": {"kernel": k}}, x))))(k)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-4, atol=1e-4)
