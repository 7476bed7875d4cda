"""Image/video quality metrics (eval/metrics.py): PSNR and uniform-window
SSIM, cross-checked against an independent NumPy sliding-window reference.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_rssm_tpu.eval import metrics as m


def test_psnr_golden():
    # MSE of 0.01 with range 1.0 -> 20 dB exactly
    a = jnp.zeros((4, 8, 8, 3))
    b = jnp.full((4, 8, 8, 3), 0.1)
    np.testing.assert_allclose(float(m.psnr(a, b)), 20.0, atol=1e-4)
    # identical images -> capped by the 1e-12 floor, very large
    assert float(m.psnr(a, a)) > 100.0


def _ssim_numpy(p, t, win=7, max_val=1.0, k1=0.01, k2=0.03):
    """Independent uniform-window SSIM via sliding_window_view."""
    from numpy.lib.stride_tricks import sliding_window_view

    c1, c2 = (k1 * max_val) ** 2, (k2 * max_val) ** 2
    vals = []
    for n in range(p.shape[0]):
        for c in range(p.shape[-1]):
            pw = sliding_window_view(p[n, ..., c], (win, win))
            tw = sliding_window_view(t[n, ..., c], (win, win))
            mu_p = pw.mean(axis=(-1, -2))
            mu_t = tw.mean(axis=(-1, -2))
            var_p = (pw ** 2).mean(axis=(-1, -2)) - mu_p ** 2
            var_t = (tw ** 2).mean(axis=(-1, -2)) - mu_t ** 2
            cov = (pw * tw).mean(axis=(-1, -2)) - mu_p * mu_t
            num = (2 * mu_p * mu_t + c1) * (2 * cov + c2)
            den = (mu_p ** 2 + mu_t ** 2 + c1) * (var_p + var_t + c2)
            vals.append(num / den)
    return np.mean(vals)


def test_ssim_matches_numpy_reference():
    """ssim() takes the zero-centered training range and must equal the
    standard (non-negative-input) SSIM of the [0, 1]-shifted data — the
    convention literature numbers use (ADVICE r3: the luminance term is
    meaningless on data anchored at 0)."""
    rng = np.random.default_rng(0)
    p = rng.uniform(-0.5, 0.5, size=(3, 16, 16, 3)).astype(np.float32)
    t = np.clip(p + rng.normal(0, 0.1, p.shape), -0.5, 0.5).astype(np.float32)
    ours = float(m.ssim(jnp.asarray(p), jnp.asarray(t)))
    ref = _ssim_numpy(p + 0.5, t + 0.5)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_ssim_properties():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(-0.5, 0.5, size=(2, 32, 32, 3)))
    np.testing.assert_allclose(float(m.ssim(img, img)), 1.0, atol=1e-5)
    noisy = img + jnp.asarray(rng.normal(0, 0.2, img.shape))
    s = float(m.ssim(img, noisy))
    assert 0.0 < s < 0.9
    # leading time axis folds into batch
    seq = img.reshape(1, 2, 32, 32, 3)
    np.testing.assert_allclose(float(m.ssim(seq, seq)), 1.0, atol=1e-5)
    with pytest.raises(ValueError, match="window"):
        m.ssim(jnp.zeros((1, 4, 4, 3)), jnp.zeros((1, 4, 4, 3)))


def test_video_prediction_metrics_shapes():
    T, B, H, W = 6, 2, 16, 16
    rng = np.random.default_rng(2)
    gt_img = rng.uniform(-0.5, 0.5, size=(T, B, H, W, 3)).astype(np.float32)
    gt_snd = rng.normal(size=(T, B, 128, 20)).astype(np.float32)
    t_start, horizon = 1, 3
    preds = {
        "image_horizon": {"loc": jnp.asarray(
            gt_img[t_start + 1 : t_start + 1 + horizon] + 0.05)},
        "sound": {"loc": jnp.asarray(
            gt_snd[t_start + 1 : t_start + 1 + horizon])},
    }
    out = m.video_prediction_metrics(
        preds, {"image_horizon": jnp.asarray(gt_img),
                "sound": jnp.asarray(gt_snd)}, t_start, horizon)
    assert set(out["image_horizon"]) == {"mse", "psnr", "ssim"}
    assert set(out["sound"]) == {"mse", "psnr"}  # not image-shaped
    np.testing.assert_allclose(out["image_horizon"]["mse"], 0.0025, atol=1e-4)
    np.testing.assert_allclose(out["sound"]["mse"], 0.0, atol=1e-7)
    assert out["image_horizon"]["ssim"] < 1.0
