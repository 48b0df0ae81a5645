// Native data-staging runtime for the TPU odometry pipeline.
//
// The reference implements its whole IO path in C++ (DatasetReader.h,
// ImageRW_OpenCV.cpp, Undistort.cpp:319+ remap loop). This library provides
// the equivalent host-side runtime for the TPU build:
//   * KITTI velodyne .bin parsing with NaN filtering
//     (reference: pcl::removeNaNFromPointCloud, main.cpp:791-792),
//   * multithreaded bilinear undistortion remap
//     (reference: Undistort::undistort<T>, single-threaded),
//   * a double-buffered prefetch pipeline that loads and preprocesses the
//     next (image, cloud) pair on worker threads while the device computes
//     — the TPU-native stand-in for the reference's ROS callback queues
//     (qImg / qCloudPixel, FullSystem.h:157-165).
//
// Exposed as a plain C ABI consumed via ctypes (sdv_loam_tpu/data/native.py).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// velodyne .bin reader: file of float32 x,y,z,reflectance records
// ---------------------------------------------------------------------------
// Returns number of valid points written (<= max_points); -1 on IO error.
int sdv_read_velodyne(const char* path, float* out_xyz, int max_points) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  long n = size / (4 * sizeof(float));
  std::vector<float> buf(static_cast<size_t>(n) * 4);
  size_t got = std::fread(buf.data(), sizeof(float), n * 4, f);
  std::fclose(f);
  n = static_cast<long>(got / 4);
  int out = 0;
  for (long i = 0; i < n && out < max_points; i++) {
    float x = buf[i * 4], y = buf[i * 4 + 1], z = buf[i * 4 + 2];
    if (std::isfinite(x) && std::isfinite(y) && std::isfinite(z)) {
      out_xyz[out * 3] = x;
      out_xyz[out * 3 + 1] = y;
      out_xyz[out * 3 + 2] = z;
      out++;
    }
  }
  return out;
}

// ---------------------------------------------------------------------------
// multithreaded bilinear undistortion remap
// ---------------------------------------------------------------------------
// remap_x/remap_y: (out_h*out_w) source coords, <0 marks invalid (-> 0).
void sdv_undistort_remap(const float* src, int in_w, int in_h,
                         const float* remap_x, const float* remap_y,
                         float* dst, int out_w, int out_h, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  auto worker = [&](int y0, int y1) {
    for (int y = y0; y < y1; y++) {
      for (int x = 0; x < out_w; x++) {
        int i = y * out_w + x;
        float sx = remap_x[i], sy = remap_y[i];
        if (sx < 0.f) {
          dst[i] = 0.f;
          continue;
        }
        int x0 = static_cast<int>(sx);
        int y0i = static_cast<int>(sy);
        if (x0 > in_w - 2) x0 = in_w - 2;
        if (y0i > in_h - 2) y0i = in_h - 2;
        float ax = sx - x0, ay = sy - y0i;
        const float* p = src + y0i * in_w + x0;
        dst[i] = p[0] * (1 - ax) * (1 - ay) + p[1] * ax * (1 - ay) +
                 p[in_w] * (1 - ax) * ay + p[in_w + 1] * ax * ay;
      }
    }
  };
  if (n_threads == 1) {
    worker(0, out_h);
    return;
  }
  std::vector<std::thread> ts;
  int rows = (out_h + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; t++) {
    int y0 = t * rows, y1 = std::min(out_h, (t + 1) * rows);
    if (y0 >= y1) break;
    ts.emplace_back(worker, y0, y1);
  }
  for (auto& t : ts) t.join();
}

// ---------------------------------------------------------------------------
// prefetching sequence loader (double-buffered pipeline)
// ---------------------------------------------------------------------------

struct PrefetchItem {
  int index;
  std::vector<float> cloud;  // 3*n floats
  int n_points;
};

struct Prefetcher {
  std::vector<std::string> cloud_paths;
  int max_points;
  size_t depth;
  std::queue<PrefetchItem> ready;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::thread worker;
  std::atomic<bool> stop{false};
  int next_load = 0;  // worker-private: only the worker thread touches it
  int produced = 0;   // items pushed to `ready`; guarded by `mu`

  void run() {
    while (!stop.load()) {
      if (next_load >= static_cast<int>(cloud_paths.size())) break;
      PrefetchItem item;
      item.index = next_load;
      item.cloud.resize(static_cast<size_t>(max_points) * 3);
      item.n_points = sdv_read_velodyne(cloud_paths[next_load].c_str(),
                                        item.cloud.data(), max_points);
      next_load++;
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] { return ready.size() < depth || stop.load(); });
      if (stop.load()) break;
      ready.push(std::move(item));
      produced++;  // counted under the mutex AFTER the push, so the
                   // consumer's end-of-sequence predicate never runs ahead
      cv_ready.notify_one();
    }
    // unblock a consumer waiting on a sequence that ends early (stop, or
    // the worker exiting without producing every path)
    std::lock_guard<std::mutex> lk(mu);
    produced = static_cast<int>(cloud_paths.size());
    cv_ready.notify_all();
  }
};

void* sdv_prefetcher_create(const char** paths, int n_paths, int max_points,
                            int depth) {
  auto* p = new Prefetcher();
  for (int i = 0; i < n_paths; i++) p->cloud_paths.emplace_back(paths[i]);
  p->max_points = max_points;
  p->depth = depth < 1 ? 1 : depth;
  p->worker = std::thread([p] { p->run(); });
  return p;
}

// Blocks until the next item is ready; returns its point count, -1 when
// the sequence is exhausted, or -2 when the underlying file read failed
// (missing/corrupt cloud). Caller buffer must hold max_points*3 floats.
int sdv_prefetcher_next(void* handle, float* out_xyz, int* out_index) {
  auto* p = static_cast<Prefetcher*>(handle);
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_ready.wait(lk, [&] {
    return !p->ready.empty() ||
           p->produced >= static_cast<int>(p->cloud_paths.size());
  });
  if (p->ready.empty()) return -1;
  PrefetchItem item = std::move(p->ready.front());
  p->ready.pop();
  p->cv_space.notify_one();
  lk.unlock();
  *out_index = item.index;
  if (item.n_points < 0) return -2;  // surfaced as IOError in Python
  std::memcpy(out_xyz, item.cloud.data(),
              static_cast<size_t>(item.n_points) * 3 * sizeof(float));
  return item.n_points;
}

void sdv_prefetcher_destroy(void* handle) {
  auto* p = static_cast<Prefetcher*>(handle);
  p->stop.store(true);
  p->cv_space.notify_all();
  p->cv_ready.notify_all();
  if (p->worker.joinable()) p->worker.join();
  delete p;
}

}  // extern "C"
