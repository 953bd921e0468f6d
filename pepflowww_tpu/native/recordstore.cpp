// Native data-plane kernels for the host-side pipeline.
//
// The reference's runtime dependencies for data handling are native C
// libraries behind Python bindings (LMDB via py-lmdb, zlib via pickle;
// SURVEY.md §2.9). This module provides the equivalent native layer for the
// TPU build: batched zlib record decompression and fused pad-and-stack batch
// assembly, callable from Python through ctypes (pepflowww_tpu/native).
//
// Build: g++ -O3 -march=native -shared -fPIC recordstore.cpp -o librecordstore.so -lz -lpthread

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

extern "C" {

// Decompress `n` zlib records in parallel.
// srcs: concatenated compressed bytes; src_offsets/src_lens: per-record spans;
// dsts: preallocated output buffer; dst_offsets/dst_caps: per-record spans.
// Returns 0 on success, or 1-based index of the first failing record.
int64_t decompress_records(
    const uint8_t* src, const int64_t* src_offsets, const int64_t* src_lens,
    uint8_t* dst, const int64_t* dst_offsets, const int64_t* dst_caps,
    int64_t n, int64_t* out_lens, int32_t n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<int64_t> fail(n_threads, 0);
  auto worker = [&](int32_t tid) {
    for (int64_t i = tid; i < n; i += n_threads) {
      uLongf out_len = static_cast<uLongf>(dst_caps[i]);
      int rc = uncompress(dst + dst_offsets[i], &out_len,
                          src + src_offsets[i], static_cast<uLong>(src_lens[i]));
      if (rc != Z_OK) {
        fail[tid] = i + 1;
        return;
      }
      out_lens[i] = static_cast<int64_t>(out_len);
    }
  };
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int32_t t = 0; t < n_threads; ++t) threads.emplace_back(worker, t);
  for (auto& th : threads) th.join();
  for (auto f : fail)
    if (f) return f;
  return 0;
}

// Compress one record (level 1, matching the Python writer). Returns the
// compressed size, or -1 if the destination buffer is too small.
int64_t compress_record(const uint8_t* src, int64_t src_len, uint8_t* dst,
                        int64_t dst_cap) {
  uLongf out_len = static_cast<uLongf>(dst_cap);
  int rc = compress2(dst, &out_len, src, static_cast<uLong>(src_len), 1);
  if (rc != Z_OK) return -1;
  return static_cast<int64_t>(out_len);
}

int64_t compress_bound(int64_t src_len) {
  return static_cast<int64_t>(compressBound(static_cast<uLong>(src_len)));
}

// Fused pad-and-stack: scatter `n` variable-length float32 items
// (lengths[i] rows of `row_elems` elements each) into a zero/pad-filled
// (n, pad_to, row_elems) batch. One memcpy per item, no Python loop.
void pad_stack_f32(const float** items, const int64_t* lengths, int64_t n,
                   int64_t pad_to, int64_t row_elems, float pad_value,
                   float* out) {
  const int64_t stride = pad_to * row_elems;
  for (int64_t i = 0; i < n; ++i) {
    float* dst = out + i * stride;
    const int64_t copy_rows = lengths[i] < pad_to ? lengths[i] : pad_to;
    std::memcpy(dst, items[i], sizeof(float) * copy_rows * row_elems);
    if (copy_rows < pad_to) {
      float* tail = dst + copy_rows * row_elems;
      const int64_t fill = (pad_to - copy_rows) * row_elems;
      if (pad_value == 0.0f) {
        std::memset(tail, 0, sizeof(float) * fill);
      } else {
        for (int64_t j = 0; j < fill; ++j) tail[j] = pad_value;
      }
    }
  }
}

void pad_stack_i64(const int64_t** items, const int64_t* lengths, int64_t n,
                   int64_t pad_to, int64_t row_elems, int64_t pad_value,
                   int64_t* out) {
  const int64_t stride = pad_to * row_elems;
  for (int64_t i = 0; i < n; ++i) {
    int64_t* dst = out + i * stride;
    const int64_t copy_rows = lengths[i] < pad_to ? lengths[i] : pad_to;
    std::memcpy(dst, items[i], sizeof(int64_t) * copy_rows * row_elems);
    for (int64_t j = copy_rows * row_elems; j < stride; ++j) dst[j] = pad_value;
  }
}

}  // extern "C"
