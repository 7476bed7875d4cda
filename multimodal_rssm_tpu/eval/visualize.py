"""Analysis helpers: latent PCA, image de-normalisation.

Replicates utils/evaluation/visualize_utils.py (ref :7-40): converters and
the sklearn PCA over latent trajectories used by the reference notebook's
belief/posterior visualisations (check_model.ipynb cells 25-29).
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np

from multimodal_rssm_tpu.ops.image import reverse_normalized_image


def reverse_image_observation(images: np.ndarray, bit_depth: int = 5) -> np.ndarray:
    """Normalised float image -> uint8 (ref visualize_utils.py:19-21)."""
    return reverse_normalized_image(np.asarray(images), bit_depth)


def get_pca_model(feat: np.ndarray, n_components: int = 2):
    """Fit sklearn PCA on [N, D] latent features (ref :34-40)."""
    from sklearn.decomposition import PCA

    pca = PCA(n_components=n_components)
    pca.fit(np.asarray(feat))
    return pca


def pca_trajectories(
    states_per_episode: Iterable[np.ndarray], n_components: int = 2
):
    """Fit a PCA over all episodes' latents and project each episode —
    the notebook's latent-trajectory plot data."""
    stacked = np.concatenate([np.asarray(s).reshape(-1, np.asarray(s).shape[-1])
                              for s in states_per_episode], axis=0)
    pca = get_pca_model(stacked, n_components)
    return pca, [pca.transform(np.asarray(s).reshape(-1, stacked.shape[-1]))
                 for s in states_per_episode]
