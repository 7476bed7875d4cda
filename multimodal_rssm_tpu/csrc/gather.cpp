// Native host-side chunk gather for the replay buffer.
//
// The host's hot path per training step is gathering n*L buffer rows
// (batch 50 x chunk 50 = 2500 rows of ~10-40 KB each across modalities)
// into a time-major [L, n, ...] batch (reference does this with torch
// fancy indexing, memory.py:189-196; the numpy equivalent allocates an
// intermediate and re-checks indices per element block).  This kernel is a
// single pass of bounds-checked memcpys into a caller-allocated output,
// optionally threaded over rows.
//
// Built as a plain shared library (no pybind11 in this image); bound via
// ctypes in multimodal_rssm_tpu/data/native.py.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Gather rows time-major: dst[(l * n + i) * row_bytes] = src[idx[i, l] * row_bytes]
// idx: int64 [n, L] (row-major).  Returns 0 on success, -1 on out-of-range.
int mrssm_gather_chunks(
    const uint8_t* src,
    uint64_t src_rows,
    uint64_t row_bytes,
    const int64_t* idx,
    uint64_t n,
    uint64_t L,
    uint8_t* dst,
    int num_threads) {
  // validate first so threads can skip bounds checks
  const uint64_t total = n * L;
  for (uint64_t k = 0; k < total; ++k) {
    const int64_t r = idx[k];
    if (r < 0 || (uint64_t)r >= src_rows) return -1;
  }

  auto worker = [&](uint64_t l_begin, uint64_t l_end) {
    for (uint64_t l = l_begin; l < l_end; ++l) {
      uint8_t* dst_row = dst + (l * n) * row_bytes;
      for (uint64_t i = 0; i < n; ++i) {
        const uint64_t r = (uint64_t)idx[i * L + l];
        std::memcpy(dst_row + i * row_bytes, src + r * row_bytes, row_bytes);
      }
    }
  };

  if (num_threads <= 1 || L < 4) {
    worker(0, L);
    return 0;
  }
  const uint64_t nt = (uint64_t)num_threads < L ? (uint64_t)num_threads : L;
  std::vector<std::thread> threads;
  threads.reserve(nt);
  const uint64_t chunk = (L + nt - 1) / nt;
  for (uint64_t t = 0; t < nt; ++t) {
    const uint64_t b = t * chunk;
    const uint64_t e = b + chunk < L ? b + chunk : L;
    if (b >= e) break;
    threads.emplace_back(worker, b, e);
  }
  for (auto& th : threads) th.join();
  return 0;
}

}  // extern "C"
