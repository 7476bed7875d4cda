"""Data-layer tests: episode ingestion semantics, ring-buffer sampling,
PCA colour-augmentation fit, pose normalisers."""

import numpy as np
import pytest

from multimodal_rssm_tpu.data import pose
from multimodal_rssm_tpu.data.augment import calc_params_of_pca
from multimodal_rssm_tpu.data.buffer import ExperienceReplay
from multimodal_rssm_tpu.data.episodes import clip_episode, preprocess_data


def test_clip_episode_min_length():
    data = {"a": np.zeros((10, 2)), "b": np.zeros((7, 3)), "seed": np.array(1)}
    out, length = clip_episode(data)
    assert length == 7
    assert out["a"].shape == (7, 2)
    assert "seed" not in out


def test_preprocess_data_semantics():
    data = {
        "image": np.zeros((5, 3, 64, 64), np.uint8),  # CHW input
        "done": np.array([0, 0, 0, 0, 1], np.float32),
        "reward": np.zeros(5, np.float32),
    }
    out, length = preprocess_data(data)
    assert out["image"].shape == (5, 64, 64, 3)  # HWC storage
    np.testing.assert_array_equal(out["nonterminals"][:, 0], [1, 1, 1, 1, 0])


def test_preprocess_renames_non64_images():
    data = {
        "image": np.zeros((4, 128, 128, 3), np.uint8),
        "done": np.zeros(4, np.float32),
    }
    out, _ = preprocess_data(data)
    assert "image_128" in out and "image" not in out


def test_preprocess_float_images_to_uint8():
    data = {
        "image": np.random.default_rng(0).uniform(-0.5, 0.5, (3, 64, 64, 3)).astype(np.float32),
        "done": np.zeros(3, np.float32),
    }
    out, _ = preprocess_data(data)
    assert out["image"].dtype == np.uint8


def test_buffer_sampling_validity(tiny_buffer):
    """Chunks never straddle the ring write head (ref memory.py:177-187)."""
    for _ in range(20):
        idxs = tiny_buffer._sample_idx(8)
        assert tiny_buffer.idx not in idxs[1:]
        assert len(idxs) == 8


def test_buffer_gather_shapes(tiny_buffer):
    obs, act, rew, nt = tiny_buffer.sample(3, 6)
    assert obs["image_horizon"].shape == (6, 3, 64, 64, 3)
    assert obs["image_horizon"].dtype == np.uint8
    assert obs["sound"].shape == (6, 3, 128, 20)
    assert act.shape == (6, 3, 3)
    assert rew.shape == (6, 3)
    assert nt.shape == (6, 3, 1)


def test_buffer_gather_is_time_contiguous(tiny_buffer):
    idxs = np.asarray([np.arange(4, 10)])
    obs, act, _, _ = tiny_buffer.gather(idxs, 1, 6)
    np.testing.assert_array_equal(act[:, 0], tiny_buffer.actions[4:10])


def test_buffer_online_append():
    D = ExperienceReplay(
        size=16, observation_names=["pose_quat_v2"],
        observation_shapes={"pose_quat_v2": [3]}, action_size=3,
    )
    for i in range(20):  # wraps the ring
        D.append({"pose_quat_v2": np.full(3, i, np.float32)},
                 np.zeros(3, np.float32), 0.5, done=(i % 5 == 4))
    assert D.full
    assert D.idx == 4
    assert D.episodes == 4


def test_buffer_empty_dataset_dir_fails_loudly(tmp_path):
    """Pointing load_dataset at a directory with no *.npy files must raise
    immediately — without the guard the failure surfaced much later as an
    opaque LinAlgError (PCA fit over zero frames -> NaN covariance).
    Regression: found pointing train_data_path at a dataset root that
    holds train/ and validation/ subdirs."""
    D = ExperienceReplay(
        size=16, observation_names=["image_horizon"],
        observation_shapes={"image_horizon": [3, 64, 64]}, action_size=3,
    )
    with pytest.raises(FileNotFoundError, match="no episode files"):
        D.load_dataset(str(tmp_path))


def test_buffer_pca_fit_survives_exact_fill(tmp_path):
    """When the loaded episodes exactly fill the ring, idx wraps to 0 with
    full=True; the PCA colour-aug fit must use every stored row, not the
    naive [:idx] slice (which would be zero frames -> NaN covariance)."""
    rng = np.random.default_rng(0)
    ep_len = 8
    for i in range(2):
        ep = {
            "image_horizon": rng.integers(0, 255, (ep_len, 64, 64, 3),
                                          dtype=np.uint8),
            "action": np.zeros((ep_len, 3), np.float32),
            "reward": np.zeros(ep_len, np.float32),
            "done": np.zeros(ep_len, np.float32),
        }
        ep["done"][-1] = 1.0
        np.save(tmp_path / f"episode_{i:04d}.npy", ep, allow_pickle=True)

    D = ExperienceReplay(
        size=2 * ep_len,  # exact fill: idx wraps to 0
        observation_names=["image_horizon"],
        observation_shapes={"image_horizon": [3, 64, 64]},
        action_size=3, n_crop=1, dh_base=2, dw_base=2, pca_scales=[0.1],
    )
    D.load_dataset(str(tmp_path))
    assert D.full and D.idx == 0
    lambd = D.lambd_eigen_values["image_horizon"]
    assert lambd is not None and np.isfinite(lambd).all()


def test_pca_params_match_torch_reference(rng):
    """calc_params_of_pca vs the reference's torch eigh pipeline
    (data_augment.py:53-62)."""
    torch = pytest.importorskip("torch")
    # uint8 HWC frames; reference takes CHW and does image.reshape(3, -1)
    imgs_hwc = rng.integers(0, 256, size=(300, 8, 8, 3), dtype=np.uint8)
    lambd, p = calc_params_of_pca(imgs_hwc, dt=100)

    imgs_chw = torch.tensor(imgs_hwc.transpose(0, 3, 1, 2))[::100]
    flat = imgs_chw.permute(1, 0, 2, 3).reshape(3, -1).to(torch.float32)
    flat = (flat.T - torch.mean(flat, axis=1)) / torch.std(flat, axis=1)
    cov = torch.cov(flat.T)
    ref_l, ref_p = torch.linalg.eigh(cov)
    np.testing.assert_allclose(lambd, ref_l.numpy(), rtol=1e-3, atol=1e-4)
    # eigenvectors defined up to sign
    np.testing.assert_allclose(np.abs(p), np.abs(ref_p.numpy()), rtol=1e-3,
                               atol=1e-4)


# -- pose -----------------------------------------------------------------


def test_pose_quat_v2_roundtrip(rng):
    x = rng.normal(size=(10, 7)).astype(np.float32)
    np.testing.assert_allclose(
        pose.reverse_pose_quat_v2(pose.normalize_pose_quat_v2(x)), x, rtol=1e-5
    )


def test_d_pose_quat_v2_roundtrip(rng):
    x = rng.normal(size=(10, 7)).astype(np.float32)
    d = pose.normalize_d_pose_quat_v2(x)
    rec = pose.reverse_d_pose_quat_v2(d)
    np.testing.assert_allclose(rec[:-1], x[1:] - x[:-1], rtol=1e-4, atol=1e-6)


def test_pose_rpy_v1_roundtrip(rng):
    x = rng.normal(size=(6, 6)).astype(np.float32)
    np.testing.assert_allclose(
        pose.reverse_pose_rpy_v1(pose.normalize_pose_rpy_v1(x)), x,
        rtol=1e-4, atol=1e-6,
    )


def test_postprocess_dispatch_order(rng):
    """'d_pose_quat_v2' must dispatch to the delta denormaliser even though
    'pose_quat_v2' is a substring."""
    x = rng.normal(size=(4, 7)).astype(np.float32)
    np.testing.assert_allclose(
        pose.postprocess_pose("d_pose_quat_v2", x),
        pose.reverse_d_pose_quat_v2(x),
    )
    np.testing.assert_array_equal(pose.postprocess_pose("unknown", x), x)


def test_preprocess_pose_derives_channels(rng):
    data = {"pose_quat": rng.normal(size=(8, 7)).astype(np.float32)}
    out = pose.preprocess_pose(data)
    for key in ("pose_quat_v2", "d_pose_quat_v2", "pose_quat_norm",
                "d_pose_quat_norm", "pose_quat_next"):
        assert key in out
    # shift_prev here is a true backwards shift (reference bug fixed)
    np.testing.assert_array_equal(
        out["d_pose_quat_v2_prev"][1:], out["d_pose_quat_v2"][:-1]
    )
    # ref_compat reproduces the reference's duplicated forward shift
    out2 = pose.preprocess_pose(
        {"pose_quat": data["pose_quat"].copy()}, ref_compat=True
    )
    np.testing.assert_array_equal(
        out2["d_pose_quat_v2_prev"][:-1], out2["d_pose_quat_v2"][1:]
    )


def test_parallel_load_matches_serial(tiny_cfg, tiny_dataset_dir):
    """workers>1 pipelines decode but writes in file order: the loaded
    buffer must be bit-identical to a serial load."""
    import copy

    import numpy as np

    from multimodal_rssm_tpu.data.buffer import build_buffer

    cfg = copy.deepcopy(tiny_cfg)
    a = build_buffer(cfg)
    a.load_dataset(tiny_dataset_dir, workers=1)
    b = build_buffer(cfg)
    b.load_dataset(tiny_dataset_dir, workers=4)
    assert (a.idx, a.steps, a.episodes, a.full) == (
        b.idx, b.steps, b.episodes, b.full)
    n = a.size if a.full else a.idx  # ring tail past idx is uninitialized
    for name in a.observation_names:
        np.testing.assert_array_equal(a.observations[name][:n],
                                      b.observations[name][:n])
    np.testing.assert_array_equal(a.actions[:n], b.actions[:n])
    np.testing.assert_array_equal(a.rewards[:n], b.rewards[:n])
    np.testing.assert_array_equal(a.nonterminals[:n], b.nonterminals[:n])
    for name in a.lambd_eigen_values:
        la, lb = a.lambd_eigen_values[name], b.lambd_eigen_values[name]
        if la is None:
            assert lb is None
        else:
            np.testing.assert_array_equal(la, lb)
    # same sampling stream afterwards
    oa = a.sample(2, 4)
    ob = b.sample(2, 4)
    for va, vb in zip(oa[0].values(), ob[0].values()):
        np.testing.assert_array_equal(va, vb)
