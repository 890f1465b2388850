// Host-side native IO for the TPU lidar SLAM engine.
//
// The reference's data path is ROS deserialization inside each node
// (reference: imageProjection.cpp:163-179).  Here the host feeds the device
// directly; this library provides the fast paths:
//   * KITTI velodyne .bin ingestion (single read, no Python overhead);
//   * a double-buffered background prefetcher for sequence replay, so disk
//     latency overlaps device compute;
//   * NaN filtering + fixed-shape padding done in native code.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// Read a KITTI .bin (float32 x,y,z,r records).  Returns number of points,
// fills at most cap points into out (4 floats per point).  Returns -1 on
// I/O error.
long long kitti_read_bin(const char* path, float* out, long long cap) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  long long n = std::fread(out, sizeof(float) * 4, cap, f);
  std::fclose(f);
  return n;
}

// Non-finite filter + pad: in (n x stride floats, xyz first) ->
// out_xyz (cap x 3), out_valid (cap bytes).  Returns number of points
// written.  Rejects NaN AND +-Inf (matching the NumPy fallback's
// isfinite; real drivers emit Inf for no-return beams).
long long pad_scan(const float* in, long long n, int stride, float* out_xyz,
                   unsigned char* out_valid, long long cap) {
  long long m = n < cap ? n : cap;
  for (long long i = 0; i < m; ++i) {
    const float* p = in + i * stride;
    bool ok = std::isfinite(p[0]) && std::isfinite(p[1]) &&
              std::isfinite(p[2]);
    out_xyz[i * 3 + 0] = ok ? p[0] : 0.f;
    out_xyz[i * 3 + 1] = ok ? p[1] : 0.f;
    out_xyz[i * 3 + 2] = ok ? p[2] : 0.f;
    out_valid[i] = ok ? 1 : 0;
  }
  std::memset(out_xyz + m * 3, 0, sizeof(float) * 3 * (cap - m));
  std::memset(out_valid + m, 0, cap - m);
  return m;
}

// ---------------- background sequence prefetcher ----------------

struct Prefetcher {
  std::vector<std::string> files;
  long long cap;                 // max points per scan
  size_t next_load = 0;          // next file index the worker loads
  size_t next_get = 0;           // next file index the consumer takes
  static constexpr int kSlots = 4;
  std::vector<float> buf[kSlots];
  long long count[kSlots];
  size_t index[kSlots];
  bool full[kSlots] = {false, false, false, false};
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  std::thread worker;
  std::atomic<bool> stop{false};

  void run() {
    while (!stop.load()) {
      size_t idx;
      int slot = -1;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_empty.wait(lk, [&] {
          if (stop.load() || next_load >= files.size()) return true;
          for (int s = 0; s < kSlots; ++s)
            if (!full[s]) return true;
          return false;
        });
        if (stop.load() || next_load >= files.size()) return;
        for (int s = 0; s < kSlots; ++s)
          if (!full[s]) { slot = s; break; }
        idx = next_load++;
      }
      buf[slot].resize(cap * 4);
      long long n = kitti_read_bin(files[idx].c_str(), buf[slot].data(), cap);
      {
        std::lock_guard<std::mutex> lk(mu);
        count[slot] = n;
        index[slot] = idx;
        full[slot] = true;
      }
      cv_full.notify_all();
    }
  }
};

void* prefetcher_create(const char** paths, long long n_paths, long long cap) {
  auto* p = new Prefetcher();
  p->cap = cap;
  for (long long i = 0; i < n_paths; ++i) p->files.emplace_back(paths[i]);
  p->worker = std::thread([p] { p->run(); });
  return p;
}

// Blocks until the next scan (in order) is ready; copies into out.
// Returns point count, or -2 when the sequence is exhausted.
long long prefetcher_next(void* h, float* out) {
  auto* p = static_cast<Prefetcher*>(h);
  std::unique_lock<std::mutex> lk(p->mu);
  if (p->next_get >= p->files.size()) return -2;
  int slot = -1;
  p->cv_full.wait(lk, [&] {
    for (int s = 0; s < Prefetcher::kSlots; ++s)
      if (p->full[s] && p->index[s] == p->next_get) { slot = s; return true; }
    return p->stop.load();
  });
  if (slot < 0) return -2;
  long long n = p->count[slot];
  if (n > 0) std::memcpy(out, p->buf[slot].data(), sizeof(float) * 4 * n);
  p->full[slot] = false;
  p->next_get++;
  lk.unlock();
  p->cv_empty.notify_all();
  return n;
}

void prefetcher_destroy(void* h) {
  auto* p = static_cast<Prefetcher*>(h);
  p->stop.store(true);
  p->cv_empty.notify_all();
  p->cv_full.notify_all();
  if (p->worker.joinable()) p->worker.join();
  delete p;
}

}  // extern "C"
