// Host-side batch assembly for the windowed dataset.
//
// The reference feeds training through torch DataLoader worker *processes*
// (utils/load_data.py:174): per-window python __getitem__, pickling, IPC.
// Here batch assembly is a single multithreaded C++ pass over the in-RAM
// episode arrays: strided window gather + optional per-window position
// normalization (translate-to-first-frame / 2), writing straight into the
// caller-provided pinned buffer that feeds jax.device_put.
//
// Exposed via ctypes (no pybind11 in the image); see
// state_policy_diffusionmodel_tpu/data/native.py.
//
// Build: make -C csrc   (produces libwindow_sampler.so)

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Gather B strided windows from a (T, feat) float32 array.
//   src:    (T, feat)
//   starts: (B,) window start rows
//   out:    (B, seq_len, feat)
// Each window takes rows start, start+step, ..., start+(seq_len-1)*step.
void gather_windows_f32(const float* src, int64_t feat,
                        const int64_t* starts, int64_t batch,
                        int64_t seq_len, int64_t step, float* out,
                        int n_threads) {
  if (n_threads <= 0) n_threads = 1;
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    int64_t b;
    while ((b = next.fetch_add(1)) < batch) {
      const int64_t start = starts[b];
      float* dst = out + b * seq_len * feat;
      for (int64_t i = 0; i < seq_len; ++i) {
        std::memcpy(dst + i * feat, src + (start + i * step) * feat,
                    sizeof(float) * feat);
      }
    }
  };
  std::vector<std::thread> threads;
  threads.reserve(n_threads - 1);
  for (int t = 1; t < n_threads; ++t) threads.emplace_back(worker);
  worker();
  for (auto& th : threads) th.join();
}

// Same gather for uint8 sources (raw image frames), converting to float32
// and scaling by 1/255 on the fly.
void gather_windows_u8_to_f32(const uint8_t* src, int64_t feat,
                              const int64_t* starts, int64_t batch,
                              int64_t seq_len, int64_t step, float* out,
                              int n_threads) {
  if (n_threads <= 0) n_threads = 1;
  constexpr float kInv255 = 1.0f / 255.0f;
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    int64_t b;
    while ((b = next.fetch_add(1)) < batch) {
      const int64_t start = starts[b];
      float* dst = out + b * seq_len * feat;
      for (int64_t i = 0; i < seq_len; ++i) {
        const uint8_t* row = src + (start + i * step) * feat;
        float* d = dst + i * feat;
        for (int64_t j = 0; j < feat; ++j) d[j] = row[j] * kInv255;
      }
    }
  };
  std::vector<std::thread> threads;
  threads.reserve(n_threads - 1);
  for (int t = 1; t < n_threads; ++t) threads.emplace_back(worker);
  worker();
  for (auto& th : threads) th.join();
}

// Per-window position normalization (utils/load_data.py:85-89 semantics):
//   pos: (B, seq_len, 2) raw positions, normalized IN PLACE:
//     p' = ((p - min)/(max - min) * 2 - 1); p'' = (p' - p'_0) / 2
//   translations: (B, 2) out — the removed first-frame vectors.
void normalize_positions_f32(float* pos, int64_t batch, int64_t seq_len,
                             float stat_min, float stat_max,
                             float* translations, int n_threads) {
  if (n_threads <= 0) n_threads = 1;
  const float range = (stat_max - stat_min) == 0.f ? 1.f
                                                   : (stat_max - stat_min);
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    int64_t b;
    while ((b = next.fetch_add(1)) < batch) {
      float* w = pos + b * seq_len * 2;
      float t0 = (w[0] - stat_min) / range * 2.f - 1.f;
      float t1 = (w[1] - stat_min) / range * 2.f - 1.f;
      translations[2 * b] = t0;
      translations[2 * b + 1] = t1;
      for (int64_t i = 0; i < seq_len; ++i) {
        float a = (w[2 * i] - stat_min) / range * 2.f - 1.f;
        float c = (w[2 * i + 1] - stat_min) / range * 2.f - 1.f;
        w[2 * i] = (a - t0) * 0.5f;
        w[2 * i + 1] = (c - t1) * 0.5f;
      }
    }
  };
  std::vector<std::thread> threads;
  threads.reserve(n_threads - 1);
  for (int t = 1; t < n_threads; ++t) threads.emplace_back(worker);
  worker();
  for (auto& th : threads) th.join();
}

}  // extern "C"
