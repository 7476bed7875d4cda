"""StreamingDeviceReplay: device-resident working set for over-budget
datasets (VERDICT r4 weak #2 — the host-streamed fallback cliff).

All on the CPU test platform; correctness is backend-independent (the
class is plain gather/scatter over jnp arrays).
"""

import numpy as np
import pytest

from multimodal_rssm_tpu.data.device_buffer import (
    DeviceReplay,
    StreamingDeviceReplay,
    gather_batch,
    hbm_budget_bytes,
)


def _tiny_budget(D, segments, S):
    """Byte budget that admits exactly ``segments`` resident segments."""
    row_bytes = DeviceReplay.nbytes(D) / (D.idx if not D.full else D.size)
    return int(segments * S * row_bytes) + 1


def test_budget_fallback_on_cpu_platform():
    # CPU test platform has no HBM: the budget must stay the conservative
    # 4 GiB default so the fits/fallback tests keep their semantics
    assert hbm_budget_bytes() == 4 << 30


def test_streaming_initial_residency_matches_host(tiny_buffer):
    S = 16
    dev = StreamingDeviceReplay(
        tiny_buffer, chunk_size=8, segment_len=S,
        budget_bytes=_tiny_budget(tiny_buffer, 3, S), seed=0)
    assert dev.W == 3
    for name in tiny_buffer.observation_names:
        host = tiny_buffer.observations[name][: dev.used]
        host = host.reshape(host.shape[0], -1)  # rows are stored FLAT
        got = np.asarray(dev.arrays[name])
        for slot, seg in enumerate(dev.resident):
            np.testing.assert_array_equal(
                got[slot * S:(slot + 1) * S], host[seg * S:(seg + 1) * S])


def test_streaming_sample_indices_stay_inside_segments(tiny_buffer):
    S, L = 16, 8
    dev = StreamingDeviceReplay(
        tiny_buffer, chunk_size=L, segment_len=S,
        budget_bytes=_tiny_budget(tiny_buffer, 4, S), seed=1)
    idxs = np.asarray(dev.sample_indices(64, L))
    assert idxs.shape == (64, L)
    assert idxs.min() >= 0 and idxs.max() < dev.W * S
    # every chunk is contiguous and confined to one segment
    np.testing.assert_array_equal(np.diff(idxs, axis=1), 1)
    assert (idxs[:, 0] // S == idxs[:, -1] // S).all()


def test_streaming_refresh_replaces_segment_content(tiny_buffer):
    S = 16
    dev = StreamingDeviceReplay(
        tiny_buffer, chunk_size=8, segment_len=S,
        budget_bytes=_tiny_budget(tiny_buffer, 2, S), seed=2)
    before = {k: np.asarray(v) for k, v in dev.arrays.items()}
    nbytes = dev.refresh(4)
    assert nbytes > 0
    after = {k: np.asarray(v) for k, v in dev.arrays.items()}
    # post-refresh arrays must equal the host rows of the NEW residency map
    name = tiny_buffer.observation_names[0]
    host = tiny_buffer.observations[name][: dev.used]
    host = host.reshape(host.shape[0], -1)
    for slot, seg in enumerate(dev.resident):
        np.testing.assert_array_equal(
            after[name][slot * S:(slot + 1) * S], host[seg * S:(seg + 1) * S])
    assert before[name].shape == after[name].shape


def test_streaming_gather_batch_rows_exist_in_host(tiny_buffer):
    S, L = 16, 8
    dev = StreamingDeviceReplay(
        tiny_buffer, chunk_size=L, segment_len=S,
        budget_bytes=_tiny_budget(tiny_buffer, 3, S), seed=3)
    idxs = dev.sample_indices(5, L)
    obs, act, rew, nt = gather_batch(dev.arrays, idxs,
                                     tiny_buffer.observation_names,
                                     dev.row_shapes)
    name = tiny_buffer.observation_names[0]
    assert obs[name].shape == (L, 5) + dev.row_shapes[name]
    assert rew.shape == (L, 5)
    # map device indices back to host rows and compare exactly
    flat = np.asarray(idxs)
    host = tiny_buffer.observations[name][: dev.used]
    for b in range(5):
        slot = flat[b, 0] // S
        host_start = dev.resident[slot] * S + flat[b, 0] % S
        np.testing.assert_array_equal(
            np.asarray(obs[name])[:, b], host[host_start:host_start + L])


def test_streaming_rejects_too_small_dataset(tiny_buffer):
    with pytest.raises(ValueError):
        StreamingDeviceReplay(tiny_buffer, chunk_size=8, segment_len=10_000)


def test_streaming_marginal_row_coverage(tiny_buffer):
    # refresh cycles through the whole host ring: after many refreshes every
    # host segment should have been resident at least once
    S = 16
    dev = StreamingDeviceReplay(
        tiny_buffer, chunk_size=8, segment_len=S,
        budget_bytes=_tiny_budget(tiny_buffer, 2, S), seed=4)
    seen = set(int(s) for s in dev.resident)
    for _ in range(80):
        dev.refresh(1)
        seen.update(int(s) for s in dev.resident)
    assert seen == set(range(dev.n_host_segments))
