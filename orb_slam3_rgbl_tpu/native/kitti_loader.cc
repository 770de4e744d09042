// Native KITTI sequence prefetcher.
//
// Replaces the reference drivers' synchronous loaders
// (Examples/RGB-L/rgbl_kitti.cc: LoadImages :187-224,
// LoadPointcloudBinaryMat :151-184) with a multi-threaded, bounded,
// in-order prefetch pipeline so host IO/decode overlaps TPU compute:
// worker threads decode PNG images (grayscale f32) and read velodyne
// .bin clouds (near-point truncation + zero padding to a fixed shape,
// matching io/kitti.py::load_pointcloud), the consumer pops frames in
// sequence order.
//
// C ABI for ctypes; no Python dependencies.

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <dirent.h>
#include <map>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

namespace {

struct Frame {
  std::vector<float> img;    // H*W grayscale
  int height = 0, width = 0;
  std::vector<float> cloud;  // max_points * 4
  std::vector<uint8_t> mask; // max_points
  double timestamp = 0.0;
  int index = -1;
  bool ok = false;
};

std::vector<std::string> list_dir(const std::string& dir, const char* suffix) {
  std::vector<std::string> out;
  DIR* d = opendir(dir.c_str());
  if (!d) return out;
  while (dirent* e = readdir(d)) {
    std::string name = e->d_name;
    if (name.size() > strlen(suffix) &&
        name.compare(name.size() - strlen(suffix), strlen(suffix), suffix) == 0) {
      out.push_back(dir + "/" + name);
    }
  }
  closedir(d);
  std::sort(out.begin(), out.end());
  return out;
}

struct Loader {
  std::vector<std::string> images;
  std::vector<std::string> clouds;
  std::vector<double> times;
  int max_points = 0;
  int queue_depth = 4;

  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_produce, cv_consume;
  std::map<int, Frame> ready;       // completed frames by index
  std::atomic<int> next_to_fetch{0};
  int next_to_consume = 0;
  bool stopping = false;

  void worker() {
    for (;;) {
      int idx = next_to_fetch.fetch_add(1);
      if (idx >= (int)images.size()) return;
      Frame f = load(idx);
      std::unique_lock<std::mutex> lk(mu);
      // bound the reorder buffer: don't run too far ahead of consumption
      cv_produce.wait(lk, [&] {
        return stopping || idx < next_to_consume + queue_depth;
      });
      if (stopping) return;
      ready.emplace(idx, std::move(f));
      cv_consume.notify_all();
    }
  }

  Frame load(int idx) {
    Frame f;
    f.index = idx;
    f.timestamp = idx < (int)times.size() ? times[idx] : 0.0;
    cv::Mat im = cv::imread(images[idx], cv::IMREAD_GRAYSCALE);
    if (im.empty()) return f;
    cv::Mat imf;
    im.convertTo(imf, CV_32F);
    f.height = imf.rows;
    f.width = imf.cols;
    f.img.assign((float*)imf.datastart, (float*)imf.dataend);

    if (!clouds.empty() && idx < (int)clouds.size() && max_points > 0) {
      FILE* fp = fopen(clouds[idx].c_str(), "rb");
      if (fp) {
        fseek(fp, 0, SEEK_END);
        long bytes = ftell(fp);
        fseek(fp, 0, SEEK_SET);
        int n = (int)(bytes / (4 * sizeof(float)));
        std::vector<float> raw(n * 4);
        size_t rd = fread(raw.data(), sizeof(float), n * 4, fp);
        (void)rd;
        fclose(fp);
        f.cloud.assign(max_points * 4, 0.0f);
        f.mask.assign(max_points, 0);
        if (n > max_points) {
          // keep the nearest points (far tail carries no depth info
          // under the projection max_dist gate)
          std::vector<std::pair<float, int>> d2(n);
          for (int i = 0; i < n; i++) {
            float x = raw[i * 4], y = raw[i * 4 + 1], z = raw[i * 4 + 2];
            d2[i] = {x * x + y * y + z * z, i};
          }
          std::nth_element(d2.begin(), d2.begin() + max_points, d2.end());
          for (int i = 0; i < max_points; i++) {
            memcpy(&f.cloud[i * 4], &raw[d2[i].second * 4], 4 * sizeof(float));
            f.mask[i] = 1;
          }
        } else {
          memcpy(f.cloud.data(), raw.data(), n * 4 * sizeof(float));
          std::fill(f.mask.begin(), f.mask.begin() + n, 1);
        }
      }
    }
    f.ok = true;
    return f;
  }
};

}  // namespace

extern "C" {

void* kl_open(const char* seq_dir, const char* camera, int max_points,
              int queue_depth, int n_threads) {
  auto* L = new Loader();
  std::string base(seq_dir);
  L->images = list_dir(base + "/" + camera, ".png");
  L->clouds = list_dir(base + "/velodyne", ".bin");
  L->max_points = max_points;
  L->queue_depth = std::max(queue_depth, 1);
  FILE* tf = fopen((base + "/times.txt").c_str(), "r");
  if (tf) {
    double t;
    while (fscanf(tf, "%lf", &t) == 1) L->times.push_back(t);
    fclose(tf);
  }
  int nt = std::max(1, n_threads);
  for (int i = 0; i < nt; i++) L->workers.emplace_back(&Loader::worker, L);
  return L;
}

int kl_count(void* h) { return (int)((Loader*)h)->images.size(); }

int kl_image_height(void* h) {
  // peek: decode header of first image lazily via full decode (cached by OS)
  Loader* L = (Loader*)h;
  if (L->images.empty()) return 0;
  cv::Mat im = cv::imread(L->images[0], cv::IMREAD_GRAYSCALE);
  return im.rows;
}

int kl_image_width(void* h) {
  Loader* L = (Loader*)h;
  if (L->images.empty()) return 0;
  cv::Mat im = cv::imread(L->images[0], cv::IMREAD_GRAYSCALE);
  return im.cols;
}

// Pops the next frame in order. Returns 0 on success, -1 at end/error.
// img_out must hold H*W floats, cloud_out max_points*4 floats, mask_out
// max_points bytes.
int kl_next(void* h, float* img_out, int H, int W, float* cloud_out,
            uint8_t* mask_out, double* t_out) {
  Loader* L = (Loader*)h;
  std::unique_lock<std::mutex> lk(L->mu);
  int want = L->next_to_consume;
  if (want >= (int)L->images.size()) return -1;
  L->cv_consume.wait(lk, [&] { return L->stopping || L->ready.count(want); });
  if (L->stopping) return -1;
  Frame f = std::move(L->ready[want]);
  L->ready.erase(want);
  L->next_to_consume++;
  L->cv_produce.notify_all();
  lk.unlock();

  if (!f.ok || f.height != H || f.width != W) return -2;
  memcpy(img_out, f.img.data(), sizeof(float) * H * W);
  if (cloud_out && !f.cloud.empty()) {
    memcpy(cloud_out, f.cloud.data(), f.cloud.size() * sizeof(float));
    memcpy(mask_out, f.mask.data(), f.mask.size());
  }
  *t_out = f.timestamp;
  return 0;
}

void kl_close(void* h) {
  Loader* L = (Loader*)h;
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stopping = true;
  }
  L->cv_produce.notify_all();
  L->cv_consume.notify_all();
  // drain fetch counter so workers exit
  L->next_to_fetch.store(1 << 30);
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
