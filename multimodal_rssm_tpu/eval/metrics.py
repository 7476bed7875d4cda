"""Image/video quality metrics: PSNR and SSIM.

The reference evaluates prediction quality by eye (check_model.ipynb) and
this framework's north-star parity metric is MSE
(eval/imagination.video_prediction_mse).  PSNR and SSIM are the standard
companions in the video-prediction literature (SV2P, PlaNet appendix,
FitVid, ...), so `check_model` reports all three.

Conventions: inputs are *normalised* observations in the training range
(bit-depth normalise maps images to [-0.5, 0.5] — ops/image.py), so the
dynamic range L is 1.0.  Arrays are [..., H, W, C]; leading axes (time,
batch) are averaged.  Pure jnp, f32 — runs on whatever backend the caller
is on.
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
from jax import lax


def psnr(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0
         ) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB over the whole array (scalar)."""
    mse = jnp.mean(jnp.square(pred.astype(jnp.float32) -
                              target.astype(jnp.float32)))
    return 10.0 * jnp.log10((max_val * max_val) / jnp.maximum(mse, 1e-12))


def _uniform_filter(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """Mean filter over the (H, W) axes of [N, H, W, C] via two separable
    reduce_windows (VALID) — no learned weights, fuses cleanly on TPU."""
    ones = 1.0 / win
    y = lax.reduce_window(
        x, 0.0, lax.add, (1, win, 1, 1), (1, 1, 1, 1), "VALID") * ones
    y = lax.reduce_window(
        y, 0.0, lax.add, (1, 1, win, 1), (1, 1, 1, 1), "VALID") * ones
    return y


def ssim(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0,
         win: int = 7, k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """Mean structural similarity (Wang et al. 2004) with a uniform
    ``win``x``win`` window (the standard tf.image/skimage uniform variant).

    pred/target: [..., H, W, C] in this framework's zero-centered training
    range [-max_val/2, +max_val/2] (bit-depth normalise, ops/image.py);
    leading axes are folded into the batch.  Returns the scalar mean SSIM
    over all windows/channels/frames.

    Inputs are shifted to the non-negative [0, max_val] convention before
    the computation (ADVICE r3): the luminance term
    (2·mu_p·mu_t + c1)/(mu_p² + mu_t² + c1) assumes data anchored at 0
    (tf.image.ssim requires non-negative inputs) — on the zero-centered
    [-0.5, 0.5] training range, windows with near-zero means of opposite
    sign flip the term negative and the score stops being comparable to
    the SV2P/FitVid-style literature numbers.  The shift leaves variances
    and covariance (the contrast/structure terms) unchanged.
    """
    p = pred.astype(jnp.float32) + (max_val / 2.0)
    t = target.astype(jnp.float32) + (max_val / 2.0)
    H, W, C = p.shape[-3:]
    if min(H, W) < win:
        raise ValueError(f"image {H}x{W} smaller than SSIM window {win}")
    p = p.reshape(-1, H, W, C)
    t = t.reshape(-1, H, W, C)

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    mu_p = _uniform_filter(p, win)
    mu_t = _uniform_filter(t, win)
    mu_pp = mu_p * mu_p
    mu_tt = mu_t * mu_t
    mu_pt = mu_p * mu_t
    # biased (uniform-window) moments, matching tf.image.ssim
    var_p = _uniform_filter(p * p, win) - mu_pp
    var_t = _uniform_filter(t * t, win) - mu_tt
    cov = _uniform_filter(p * t, win) - mu_pt
    num = (2.0 * mu_pt + c1) * (2.0 * cov + c2)
    den = (mu_pp + mu_tt + c1) * (var_p + var_t + c2)
    return jnp.mean(num / den)


def video_prediction_metrics(
    preds: Mapping[str, Mapping[str, jnp.ndarray]],
    targets: Mapping[str, jnp.ndarray],
    t_start: int,
    horizon: int,
) -> Dict[str, Dict[str, float]]:
    """Per-modality {mse, psnr[, ssim]} of imagined predictions vs the
    normalised ground truth over the imagination window.  SSIM is computed
    for image-shaped ([T, B, H, W, C]) modalities only; flat/spectrogram
    modalities report mse/psnr."""
    out: Dict[str, Dict[str, float]] = {}
    for name, pred in preds.items():
        gt = targets[name][t_start + 1 : t_start + 1 + horizon]
        p = pred["loc"]
        row = {
            "mse": float(jnp.mean(jnp.square(p - gt))),
            "psnr": float(psnr(p, gt)),
        }
        if p.ndim == 5 and p.shape[-1] in (1, 3) and min(p.shape[-3:-1]) >= 7:
            row["ssim"] = float(ssim(p, gt))
        out[name] = row
    return out
