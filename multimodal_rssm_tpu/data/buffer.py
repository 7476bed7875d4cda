"""Host-RAM experience replay with uniform sequence-chunk sampling.

Re-implements the reference ``ExperienceReplay_Multimodal``
(utils/replay_buffer/memory.py:110-284) as a NumPy ring buffer: uint8 HWC
storage for images (oversized by the crop margin), float32 for everything
else.  ``sample(n, L)`` gathers time-major [L, n, ...] chunks on the host;
device transfer, augmentation and bit-depth normalisation happen inside the
jit-compiled train step (see train/trainer.py) — the host's only job is the
strided gather.

Sampling semantics match the reference exactly: uniform random start index,
chunks may cross episode boundaries (compensated by nonterminal masking in
the scan — ref memory.py:177-187 excludes only the ring write head).
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np

from multimodal_rssm_tpu.data.augment import calc_params_of_pca, storage_image_shape
from multimodal_rssm_tpu.data.episodes import get_data, get_file_names
from multimodal_rssm_tpu.data.native import gather_chunks
from multimodal_rssm_tpu.ops.image import reverse_normalized_image


class ExperienceReplay:
    """Multimodal ring buffer + chunk sampler (host side)."""

    def __init__(
        self,
        size: int,
        observation_names: Sequence[str] = ("image",),
        observation_shapes: Optional[Mapping[str, Sequence[int]]] = None,
        n_crop: Optional[int] = None,
        dh_base: Optional[int] = None,
        dw_base: Optional[int] = None,
        noise_scales: Optional[Sequence[float]] = None,
        pca_scales: Optional[Sequence[float]] = None,
        action_name: str = "action",
        action_size: Optional[int] = None,
        bit_depth: int = 5,
        seed: int = 0,
        load_workers: int = 4,
    ):
        observation_shapes = observation_shapes or {"image": [3, 64, 64]}
        self.size = int(size)
        self.observation_names = list(observation_names)
        self.observation_shapes = {k: list(v) for k, v in observation_shapes.items()}
        self.action_name = action_name
        self.action_size = action_size
        self.bit_depth = bit_depth
        self.n_crop = n_crop
        self.dh_base = dh_base
        self.dw_base = dw_base
        self.noise_scales = list(noise_scales) if noise_scales is not None else None
        self.pca_scales = list(pca_scales) if pca_scales is not None else None
        self.load_workers = int(load_workers)
        self.rng = np.random.default_rng(seed)

        self.idx = 0
        self.full = False
        self.steps = 0
        self.episodes = 0
        self.file_names: List[str] = []
        self.lambd_eigen_values: Dict[str, Optional[np.ndarray]] = {}
        self.p_eigen_vectors: Dict[str, Optional[np.ndarray]] = {}

        self.observations: Dict[str, np.ndarray] = {}
        for name in self.observation_names:
            shape = self.observation_shapes[name]
            if "image" in name:
                c, h, w = storage_image_shape(shape, n_crop, dw_base or 2, dh_base or 2)
                # HWC uint8 storage (see module docstring).
                self.observations[name] = np.empty((self.size, h, w, c), np.uint8)
            else:
                self.observations[name] = np.empty((self.size, *shape), np.float32)
        self.actions = np.empty((self.size, int(action_size)), np.float32)
        self.rewards = np.empty((self.size,), np.float32)
        self.nonterminals = np.empty((self.size, 1), np.float32)

    # -- sampling ---------------------------------------------------------
    def _sample_idx(self, L: int, idx_max: Optional[int] = None) -> np.ndarray:
        """One valid chunk start (ref memory.py:177-187): uniform, avoiding
        the ring write head inside the chunk body."""
        _idx_max = self.size if self.full else self.idx - L
        if idx_max is not None:
            _idx_max = min(idx_max, _idx_max)
        while True:
            idx = int(self.rng.integers(0, _idx_max))
            idxs = np.arange(idx, idx + L) % self.size
            if self.idx not in idxs[1:]:
                return idxs

    def sample_indices(self, n: int, L: int) -> np.ndarray:
        """[n, L] chunk indices."""
        return np.asarray([self._sample_idx(L) for _ in range(n)])

    def gather(self, idxs: np.ndarray, n: int, L: int):
        """Gather raw (un-augmented, un-normalised) chunks time-major
        (ref ``_retrieve_batch`` gather+reshape, memory.py:189-196; the
        augment/normalise half runs on device in the train step).

        Returns (observations {name: [L, n, ...]}, actions [L, n, A],
        rewards [L, n], nonterminals [L, n, 1]); images stay uint8.
        """
        observations = {
            name: gather_chunks(self.observations[name], idxs)
            for name in self.observation_names
        }
        actions = gather_chunks(self.actions, idxs)
        rewards = gather_chunks(self.rewards, idxs)
        nonterminals = gather_chunks(self.nonterminals, idxs)
        return observations, actions, rewards, nonterminals

    def sample(self, n: int, L: int):
        """Uniform batch of sequence chunks (ref memory.py:212-222)."""
        return self.gather(self.sample_indices(n, L), n, L)

    # -- ingest -----------------------------------------------------------
    def append(self, observation, action, reward, done, raw=False):
        """Online single-step append (ref memory.py:225-238).

        ``raw=False`` (ref semantics): images arrive normalized float and
        are re-quantized for uint8 storage.  ``raw=True``: images arrive
        as uint8 HWC frames straight from an environment
        (multimodal_rssm_tpu/envs/) and are stored as-is — note the frame
        must already match the stored shape, i.e. carry the crop margin
        when ``n_crop > 1`` (the shipped configs use n_crop=1: no margin).
        """
        for name in self.observation_names:
            if "image" in name and not raw:
                self.observations[name][self.idx] = reverse_normalized_image(
                    observation[name], self.bit_depth
                )
            else:
                self.observations[name][self.idx] = observation[name]
        self.actions[self.idx] = action
        self.rewards[self.idx] = reward
        self.nonterminals[self.idx] = float(not done)
        self.idx = (self.idx + 1) % self.size
        self.full = self.full or self.idx == 0
        self.steps += 1
        self.episodes += int(bool(done))

    def _set_data_to_buffer(self, file_name: str) -> None:
        """Write one episode file into the ring (ref memory.py:241-260)."""
        data, episode_length = get_data(
            file_name, self.n_crop, self.dh_base, self.dw_base
        )
        self._write_episode(data, episode_length)

    def _write_episode(self, data, episode_length: int) -> None:
        idx = np.arange(self.idx, self.idx + episode_length) % self.size
        for name in self.observation_names:
            self.observations[name][idx] = data[name]
        if self.action_name == "dummy":
            self.actions[idx] = 0.0
        else:
            self.actions[idx] = data[self.action_name]
        self.rewards[idx] = np.asarray(data["reward"], np.float32).reshape(-1)
        self.nonterminals[idx] = data["nonterminals"]
        self.full = self.full or (self.idx + episode_length) / self.size >= 1
        self.idx = (self.idx + episode_length) % self.size
        self.steps += episode_length
        self.episodes += 1

    def load_dataset(self, dataset_dir: str, workers: Optional[int] = None) -> None:
        """Load every episode file in a directory (ref memory.py:262-273).

        ``workers`` > 1 pipelines the per-file work (np.load + preprocess +
        margin crop — IO and GIL-releasing numpy) over a thread pool while
        the ring writes stay strictly in file order, so the resulting
        buffer is bit-identical to a serial load (tested).  At most
        ``workers + 2`` episodes are decoded ahead, bounding host memory.
        Default comes from ``train.load_workers`` (build_buffer); the
        reference loads serially with a tqdm bar (memory.py:268).
        """
        file_names = get_file_names(dataset_dir)
        if not file_names:
            # without this the failure surfaces much later as an opaque
            # LinAlgError (PCA fit over zero frames -> NaN covariance)
            raise FileNotFoundError(
                f"no episode files (*.npy) in {dataset_dir} — point "
                "train.*_data_path at the episode directory itself "
                "(e.g. dataset/synthetic/train, not dataset/synthetic)")
        self.file_names += file_names
        n = self.load_workers if workers is None else int(workers)
        if n > 1 and len(file_names) > 1:
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=n) as ex:
                it = iter(file_names)
                pending = deque()

                def submit_next():
                    fn = next(it, None)
                    if fn is not None:
                        pending.append(ex.submit(
                            get_data, fn, self.n_crop, self.dh_base,
                            self.dw_base))

                for _ in range(n + 2):
                    submit_next()
                while pending:
                    data, episode_length = pending.popleft().result()
                    self._write_episode(data, episode_length)
                    submit_next()
        else:
            for file_name in file_names:
                self._set_data_to_buffer(file_name)
        if self.pca_scales is not None:
            self._set_color_aug_params()

    def _set_color_aug_params(self) -> None:
        """Fit PCA colour-augmentation params over stored pixels
        (ref memory.py:276-284)."""
        # valid row count must respect the ring wrap: when the loaded data
        # exactly fills the buffer, idx wraps to 0 with full=True and a
        # naive [:idx] slice would fit PCA on ZERO frames (NaN covariance,
        # LinAlgError from eigh)
        n_valid = self.size if self.full else self.idx
        for name in self.observation_names:
            if "image" in name and "bin" not in name:
                lambd, p = calc_params_of_pca(self.observations[name][:n_valid])
                self.lambd_eigen_values[name] = lambd
                self.p_eigen_vectors[name] = p
            else:
                self.lambd_eigen_values[name] = None
                self.p_eigen_vectors[name] = None


def build_buffer(cfg, seed: int = 0) -> ExperienceReplay:
    """Construct a buffer from a composed config (mirrors reference
    ``get_dataset_loader``, algos/MRSSM/MRSSM/train.py:9-25)."""
    observation_names = sorted(
        set(list(cfg.rssm.observation_names_enc) + list(cfg.rssm.observation_names_rec))
    )
    aug = cfg.train.augmentation
    return ExperienceReplay(
        size=cfg.train.experience_size,
        observation_names=observation_names,
        observation_shapes=cfg.env.observation_shapes,
        n_crop=aug.n_crop,
        dh_base=aug.dh_base,
        dw_base=aug.dw_base,
        noise_scales=aug.noise_scales,
        pca_scales=aug.pca_scales,
        action_name=cfg.env.action_name,
        action_size=cfg.env.action_size,
        bit_depth=cfg.env.bit_depth,
        seed=seed,
        # pipelined episode ingest (np.load + preprocess on a thread pool,
        # ring writes in file order — bit-identical to serial, tested)
        load_workers=cfg.train.get("load_workers", 4),
    )


def load_dataset(cfg, cwd: str, buffer: ExperienceReplay, dataset_path) -> None:
    """str-or-list dataset path dispatch (ref memory.py:13-32)."""
    import os

    paths = [dataset_path] if isinstance(dataset_path, str) else list(dataset_path)
    for p in paths:
        full = os.path.join(cwd, p)
        if not os.path.exists(full):
            raise FileNotFoundError(f"{full} does not exist")
        if os.path.isfile(full):
            # The reference's file branch (memory.py:20-22) calls
            # D.convert_dataset, which does not exist anywhere in that
            # codebase — a dead path that would crash.  Fail loudly here.
            raise NotImplementedError(
                f"{full} is a file; single-file buffer dumps are a dead "
                "path in the reference (memory.py:20-22 calls the "
                "nonexistent convert_dataset) — pass an episode directory")
        buffer.load_dataset(full)
