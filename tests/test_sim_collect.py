"""Sim data collection (scripts/collect_sim_data.py — BASELINE config #4):
episodes must come out in the exact COBOTTA schema the buffer ingests."""

import os

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")


def _load_collector():
    from multimodal_rssm_tpu.cli import collect_sim_data

    return collect_sim_data


def test_collect_episode_schema(tmp_path):
    col = _load_collector()
    ep = col.collect_episode(length=8, seed=0)
    assert ep["image_horizon"].shape == (8, 64, 64, 3)
    assert ep["image_horizon"].dtype == np.uint8
    assert ep["sound"].shape == (8, 128, 20)
    assert ep["sound"].dtype == np.float32
    assert ep["pose_quat_v2"].shape == (8, 3)
    assert ep["d_pose_quat_v2"].shape == (8, 3)
    assert ep["reward"].shape == (8,)
    assert ep["done"].shape == (8,) and ep["done"][-1] == 1.0
    for v in ep.values():
        assert np.all(np.isfinite(np.asarray(v, np.float32)))

    # the buffer ingests it unchanged
    np.save(tmp_path / "episode_0000.npy", ep, allow_pickle=True)
    from multimodal_rssm_tpu.core.config import compose
    from multimodal_rssm_tpu.data.buffer import build_buffer

    cfg = compose(os.path.join(os.path.dirname(__file__), "..", "configs"),
                  overrides=["train.experience_size=1000"])
    D = build_buffer(cfg)
    D.load_dataset(str(tmp_path))
    assert D.steps == 8 and D.episodes == 1
