"""Native C++ chunk-gather kernel: correctness vs NumPy, bounds checks."""

import numpy as np
import pytest

from multimodal_rssm_tpu.data.native import gather_chunks, get_lib


@pytest.mark.skipif(get_lib() is None, reason="no C++ toolchain")
def test_native_gather_matches_numpy(rng):
    src = rng.integers(0, 255, size=(200, 8, 8, 3), dtype=np.uint8)
    idxs = rng.integers(0, 200, size=(5, 7))
    out = gather_chunks(src, idxs, num_threads=4)
    vec = idxs.transpose().reshape(-1)
    np.testing.assert_array_equal(out, src[vec].reshape(7, 5, 8, 8, 3))


@pytest.mark.skipif(get_lib() is None, reason="no C++ toolchain")
def test_native_gather_float_rows(rng):
    src = rng.normal(size=(50, 6)).astype(np.float32)
    idxs = rng.integers(0, 50, size=(3, 4))
    out = gather_chunks(src, idxs, num_threads=2)
    np.testing.assert_array_equal(
        out, src[idxs.transpose().reshape(-1)].reshape(4, 3, 6)
    )


@pytest.mark.skipif(get_lib() is None, reason="no C++ toolchain")
def test_native_gather_bounds(rng):
    src = np.zeros((10, 4), np.float32)
    with pytest.raises(IndexError):
        gather_chunks(src, np.asarray([[10]]), num_threads=2)


def test_numpy_fallback(rng):
    # non-contiguous source forces the NumPy path
    src = rng.normal(size=(20, 8)).astype(np.float32)[:, ::2]
    idxs = rng.integers(0, 20, size=(2, 3))
    out = gather_chunks(src, idxs)
    np.testing.assert_array_equal(
        out, src[idxs.transpose().reshape(-1)].reshape(3, 2, 4)
    )
