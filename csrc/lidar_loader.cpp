// Native data loader for the TPU fusion framework.
//
// The reference loads Velodyne scans one np.fromfile at a time inside its
// Python frame loop (V1_BBox_Pointwise_filtering.py:24-28).  For production
// serving the host must keep the TPU fed, so this loader provides:
//
//   * lidar_load_scan       -- single scan read + pad-to-fixed-shape, one
//                              fread straight into the caller's pinned
//                              buffer (no intermediate copies),
//   * lidar_prefetcher_*    -- a multi-threaded read-ahead pipeline over a
//                              frame list with a bounded completion queue,
//                              overlapping disk IO with device compute.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
// Build: make -C csrc   (g++ -O3 -shared -fPIC -pthread)

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kFloatsPerPoint = 4;

// Read one .bin scan into out[max_points*4], zero-padded; valid[i] marks
// real points.  Returns 0 on success, negative errno-style codes otherwise.
int load_scan_impl(const char* path, float* out, int32_t max_points,
                   uint8_t* valid, int32_t* num_points) {
  FILE* f = std::fopen(path, "rb");
  if (f == nullptr) return -1;
  std::fseek(f, 0, SEEK_END);
  long bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (bytes < 0 || bytes % (kFloatsPerPoint * (long)sizeof(float)) != 0) {
    std::fclose(f);
    return -2;
  }
  long n = bytes / (kFloatsPerPoint * (long)sizeof(float));
  if (n > max_points) {
    std::fclose(f);
    return -3;
  }
  size_t want = (size_t)n * kFloatsPerPoint;
  size_t got = std::fread(out, sizeof(float), want, f);
  std::fclose(f);
  if (got != want) return -4;
  std::memset(out + want, 0,
              ((size_t)max_points * kFloatsPerPoint - want) * sizeof(float));
  if (valid != nullptr) {
    std::memset(valid, 1, (size_t)n);
    std::memset(valid + n, 0, (size_t)(max_points - n));
  }
  if (num_points != nullptr) *num_points = (int32_t)n;
  return 0;
}

struct Completed {
  int32_t index;
  int32_t num_points;
  int status;
  std::vector<float> data;
  std::vector<uint8_t> valid;
};

struct Prefetcher {
  std::vector<std::string> paths;
  int32_t max_points;
  size_t queue_depth;

  std::mutex mu;
  std::condition_variable cv_space;   // producers wait for queue space
  std::condition_variable cv_ready;   // consumer waits for completions
  std::queue<Completed> done;
  size_t next_task = 0;
  size_t delivered = 0;
  bool shutdown = false;
  std::vector<std::thread> workers;

  void worker() {
    for (;;) {
      size_t idx;
      {
        std::lock_guard<std::mutex> lock(mu);
        if (shutdown || next_task >= paths.size()) return;
        idx = next_task++;
      }
      Completed c;
      c.index = (int32_t)idx;
      c.data.resize((size_t)max_points * kFloatsPerPoint);
      c.valid.resize((size_t)max_points);
      c.status = load_scan_impl(paths[idx].c_str(), c.data.data(),
                                max_points, c.valid.data(), &c.num_points);
      std::unique_lock<std::mutex> lock(mu);
      cv_space.wait(lock,
                    [&] { return done.size() < queue_depth || shutdown; });
      if (shutdown) return;
      done.push(std::move(c));
      cv_ready.notify_one();
    }
  }
};

}  // namespace

extern "C" {

int lidar_load_scan(const char* path, float* out, int32_t max_points,
                    uint8_t* valid, int32_t* num_points) {
  return load_scan_impl(path, out, max_points, valid, num_points);
}

void* lidar_prefetcher_create(const char** paths, int32_t n_paths,
                              int32_t max_points, int32_t n_threads,
                              int32_t queue_depth) {
  auto* p = new Prefetcher();
  p->paths.reserve(n_paths);
  for (int32_t i = 0; i < n_paths; ++i) p->paths.emplace_back(paths[i]);
  p->max_points = max_points;
  p->queue_depth = queue_depth > 0 ? (size_t)queue_depth : 4;
  int threads = n_threads > 0 ? n_threads : 2;
  for (int t = 0; t < threads; ++t) {
    p->workers.emplace_back(&Prefetcher::worker, p);
  }
  return p;
}

// Pops the next completed scan (arrival order; frame identity returned via
// *frame_index).  Returns the scan's load status, or 1 when exhausted.
int lidar_prefetcher_next(void* handle, float* out, uint8_t* valid,
                          int32_t* num_points, int32_t* frame_index) {
  auto* p = static_cast<Prefetcher*>(handle);
  std::unique_lock<std::mutex> lock(p->mu);
  if (p->delivered >= p->paths.size()) return 1;
  p->cv_ready.wait(lock, [&] { return !p->done.empty(); });
  Completed c = std::move(p->done.front());
  p->done.pop();
  p->delivered++;
  p->cv_space.notify_one();
  lock.unlock();
  std::memcpy(out, c.data.data(), c.data.size() * sizeof(float));
  if (valid != nullptr) std::memcpy(valid, c.valid.data(), c.valid.size());
  if (num_points != nullptr) *num_points = c.num_points;
  if (frame_index != nullptr) *frame_index = c.index;
  return c.status;
}

void lidar_prefetcher_destroy(void* handle) {
  auto* p = static_cast<Prefetcher*>(handle);
  {
    std::lock_guard<std::mutex> lock(p->mu);
    p->shutdown = true;
  }
  p->cv_space.notify_all();
  p->cv_ready.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"
