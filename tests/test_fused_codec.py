"""Fused conv+InstanceNorm+GLU kernels (ops/fused_codec.py) vs the XLA
composition they replace — forward values, per-instance stats, and full
gradients (dx, dw, dscale, dbias), under the pallas interpreter on CPU.
On-TPU numeric verification: scripts/verify_fused_codec.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_rssm_tpu.ops import fused_codec


def ref_conv_in_glu(x, w, scale, bias, padding, eps=1e-5):
    """The unfused semantics: layers.Conv + InstanceNorm(train) + glu."""
    ph, pw = padding
    z = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(ph, ph), (pw, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    mean = jnp.mean(z, axis=(1, 2), keepdims=True)
    var = jnp.maximum(jnp.mean(z * z, axis=(1, 2), keepdims=True)
                      - mean * mean, 0.0)
    a = scale * jax.lax.rsqrt(var + eps)
    b = bias - mean * a
    zn = z * a + b
    c2 = z.shape[-1] // 2
    y = zn[..., :c2] * jax.nn.sigmoid(zn[..., c2:])
    return y, mean[:, 0, 0, :], var[:, 0, 0, :]


CASES = [
    # (N, H, W, Cin, kh, kw, Cout, ph, pw)   — down4-like and up0-like
    (6, 32, 5, 16, 3, 4, 32, 1, 1),          # encoder down4 shape family
    (6, 32, 4, 16, 3, 4, 32, 1, 2),          # up0's conv-equivalent padding
    (4, 8, 5, 8, 3, 3, 16, 1, 1),
]


@pytest.mark.parametrize("case", CASES)
def test_fused_forward_matches_ref(rng, case):
    n, h, wd, cin, kh, kw, cout, ph, pw = case
    x = jnp.asarray(rng.normal(size=(n, h, wd, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(kh, kw, cin, cout)).astype(np.float32)) * 0.1
    scale = jnp.asarray(rng.uniform(0.5, 1.5, cout).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=cout).astype(np.float32) * 0.1)

    y, mean, var = fused_codec.conv_in_glu(
        x, w, scale, bias, (ph, pw), 1e-5, True)
    y_ref, mean_ref, var_ref = ref_conv_in_glu(x, w, scale, bias, (ph, pw))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("case", CASES[:2])
def test_fused_gradients_match_ref(rng, case):
    n, h, wd, cin, kh, kw, cout, ph, pw = case
    x = jnp.asarray(rng.normal(size=(n, h, wd, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(kh, kw, cin, cout)).astype(np.float32)) * 0.1
    scale = jnp.asarray(rng.uniform(0.5, 1.5, cout).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=cout).astype(np.float32) * 0.1)
    r = jnp.asarray(rng.normal(
        size=(n, h + 2 * ph - kh + 1, wd + 2 * pw - kw + 1, cout // 2)
    ).astype(np.float32))

    def loss_fused(x, w, scale, bias):
        y, _, _ = fused_codec.conv_in_glu(x, w, scale, bias, (ph, pw),
                                          1e-5, True)
        return jnp.sum(y * r)

    def loss_ref(x, w, scale, bias):
        y, _, _ = ref_conv_in_glu(x, w, scale, bias, (ph, pw))
        return jnp.sum(y * r)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    for gf, gr, name in zip(g_fused, g_ref, ("dx", "dw", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_fused_conv_transpose_matches_layer(rng):
    """conv_transpose_in_glu == layers.ConvTranspose + InstanceNorm + glu
    (the up0 stage), values and gradients."""
    from multimodal_rssm_tpu.models.layers import ConvTranspose

    n, h, wd, cin, cout = 4, 8, 4, 8, 16
    kh, kw, ph, pw = 3, 4, 1, 1
    x = jnp.asarray(rng.normal(size=(n, h, wd, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(kh, kw, cin, cout)).astype(np.float32)) * 0.1
    scale = jnp.asarray(rng.uniform(0.5, 1.5, cout).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=cout).astype(np.float32) * 0.1)

    ct = ConvTranspose(cout, (kh, kw), strides=(1, 1), padding=(ph, pw),
                       use_bias=False)
    z_ref = ct.apply({"params": {"kernel": w}}, x)

    def ref(x, w, scale, bias):
        z = ct.apply({"params": {"kernel": w}}, x)
        mean = jnp.mean(z, axis=(1, 2), keepdims=True)
        var = jnp.maximum(jnp.mean(z * z, axis=(1, 2), keepdims=True)
                          - mean * mean, 0.0)
        a = scale * jax.lax.rsqrt(var + 1e-5)
        zn = z * a + (bias - mean * a)
        c2 = cout // 2
        return zn[..., :c2] * jax.nn.sigmoid(zn[..., c2:])

    y, mean, var = fused_codec.conv_transpose_in_glu(
        x, w, scale, bias, (ph, pw), 1e-5, True)
    y_ref = ref(x, w, scale, bias)
    assert y.shape == y_ref.shape == (n, h, wd + 1, cout // 2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)

    r = jnp.asarray(rng.normal(size=y_ref.shape).astype(np.float32))
    gf = jax.grad(lambda *a: jnp.sum(
        fused_codec.conv_transpose_in_glu(*a, (ph, pw), 1e-5, True)[0] * r),
        argnums=(0, 1, 2, 3))(x, w, scale, bias)
    gr = jax.grad(lambda *a: jnp.sum(ref(*a) * r),
                  argnums=(0, 1, 2, 3))(x, w, scale, bias)
    for a, b, name in zip(gf, gr, ("dx", "dw", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
