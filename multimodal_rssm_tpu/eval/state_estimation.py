"""Offline full-dataset posterior state estimation.

Library-grade replacement for the reference's eval pipeline
(utils/evaluation/estimate_states.py + train/.../estimate_state.py):
per-episode batch-1 inference over every stored episode, producing the same
``states_models_{itr}.npy`` artifact keyed by source episode filename.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rssm_tpu.train import trainer as tr


def episode_bounds(buffer) -> np.ndarray:
    """Episode start indices from nonterminal==0 markers (ref
    estimate_states.py:36-38)."""
    idx_done = np.where(buffer.nonterminals[: buffer.idx, 0] == 0)[0]
    return np.hstack([[0], idx_done + 1])


def get_episode_data(buffer, epi_idx: int, spec, draws, bit_depth: int, key):
    """One full episode as a batch-1 chunk, through the same device
    augment/normalise path as training (ref estimate_states.py:35-58;
    crop_idx pinned to 0 as in ref ``get_states`` :60)."""
    bounds = episode_bounds(buffer)
    lo, hi = int(bounds[epi_idx]), int(bounds[epi_idx + 1])
    observations = {
        name: jnp.asarray(buffer.observations[name][lo:hi][:, None])
        for name in buffer.observation_names
    }
    observations = tr.prepare_observations(observations, spec, draws, bit_depth, key)
    actions = jnp.asarray(buffer.actions[lo:hi][:, None])
    rewards = jnp.asarray(buffer.rewards[lo:hi][:, None])
    nonterminals = jnp.asarray(buffer.nonterminals[lo:hi][:, None])
    return observations, actions, rewards, nonterminals


def fixed_draws(buffer, spec) -> Dict[str, Dict[str, np.ndarray]]:
    """Deterministic augmentation draws for eval: crop idx 0, no noise/PCA."""
    from multimodal_rssm_tpu.data import augment as aug

    out = {}
    for name, mspec in spec.modalities:
        entry = {}
        if mspec.needs_crop:
            stored_hw = buffer.observations[name].shape[1:3]
            dh, dw = aug.idx_to_offsets(0, stored_hw, mspec.out_size,
                                        buffer.dh_base, buffer.dw_base)
            entry["crop"] = np.asarray([dh, dw], np.int32)
        if mspec.noise:
            entry["noise"] = np.float32(0.0)
        if mspec.pca:
            entry["pca"] = np.zeros(3, np.float32)
        out[name] = entry
    return out


def tensor2numpy_state(state) -> Dict:
    """DeviceArray state dict -> plain numpy (ref estimate_states.py:12-20)."""
    out = {}
    for k, v in state.items():
        if isinstance(v, dict):
            out[k] = {kk: np.asarray(vv) for kk, vv in v.items()}
        else:
            out[k] = np.asarray(v)
    return out


def estimate_episode(model, variables, buffer, epi_idx: int, spec=None,
                     bit_depth: int = 5, key: Optional[jax.Array] = None,
                     det: bool = False):
    """Posterior inference over one episode (batch 1)."""
    spec = spec if spec is not None else tr.build_aug_spec(buffer)
    key = key if key is not None else jax.random.PRNGKey(0)
    k_prep, k_est = jax.random.split(key)
    obs, actions, rewards, nonterminals = get_episode_data(
        buffer, epi_idx, spec, fixed_draws(buffer, spec), bit_depth, k_prep
    )
    obs_target = {k: v[1:] for k, v in obs.items()}
    states = model.apply(
        variables, obs_target, actions[:-1], nonterminals[:-1],
        None if det else k_est, det, False, method=model.estimate_state,
    )
    return states


def get_states(model, variables, buffer, bit_depth: int = 5,
               key: Optional[jax.Array] = None) -> Dict[str, Dict]:
    """All episodes -> {episode_file: numpy state dict} (ref
    estimate_states.py:60-70)."""
    spec = tr.build_aug_spec(buffer)
    key = key if key is not None else jax.random.PRNGKey(0)
    states = {}
    for epi_idx in range(buffer.episodes):
        key, k = jax.random.split(key)
        s = estimate_episode(model, variables, buffer, epi_idx, spec,
                             bit_depth, k)
        name = (buffer.file_names[epi_idx]
                if epi_idx < len(buffer.file_names) else f"episode_{epi_idx}")
        states[name] = tensor2numpy_state(s)
    return states


def run(cfg, cwd, model_path: str) -> str:
    """Offline eval entry (ref estimate_states.py:73-89): load train data +
    checkpoint, estimate every episode, save ``states_models_{itr}.npy``."""
    from multimodal_rssm_tpu.models.world_model import WorldModel
    from multimodal_rssm_tpu.train.loop import get_dataset_loader

    D = get_dataset_loader(cfg, cwd, cfg.train.train_data_path)
    model = WorldModel.from_config(cfg)
    variables = load_model_variables(model, cfg, model_path)

    states = get_states(model, variables, D, bit_depth=int(cfg.env.bit_depth))
    save_file = (model_path
                 .replace(".pth", ".npy").replace(".msgpack", ".npy")
                 .replace("/models_", "/states_models_"))
    np.save(save_file, states)
    return save_file


def load_model_variables(model, cfg, model_path: str):
    """Load model variables from either a native checkpoint or a reference
    ``.pth``."""
    if model_path.endswith(".pth"):
        from multimodal_rssm_tpu.io.torch_import import load_reference_checkpoint

        return load_reference_checkpoint(model_path, model)
    from flax import serialization

    with open(model_path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = payload["state"]
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]
    return variables
