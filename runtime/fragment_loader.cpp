// Native fragment loader: threaded JPEG/PNG decode + resize for the data
// pipeline. TPU-native counterpart of the reference's torch DataLoader
// worker processes (reference main.py:130-151, num_workers=8): the hot
// host-side path (image decode, depth decode, bilinear resize) runs in a
// C++ thread pool and hands the TPU feed loop fully-assembled fragments.
//
// C ABI (ctypes-friendly):
//   frag_loader_create(n_threads, out_w, out_h, max_depth_mm)
//   frag_loader_submit(loader, n_views, img_paths[], depth_paths[]) -> ticket
//   frag_loader_fetch(loader, ticket, imgs_out, depths_out, n_views) -> 0/err
//   frag_loader_destroy(loader)
//
// imgs_out:  float32 [n_views, out_h, out_w, 3], BGR (matching the
//            reference's BGR pixel means, config/default.py:60)
// depths_out: float32 [n_views, out_h, out_w] meters, >max_depth zeroed
//            (reference datasets/scannet.py depth handling)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <functional>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<float> data;  // hwc
};

bool decode_jpeg_bgr(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = 3;
  out->data.resize((size_t)out->w * out->h * 3);
  std::vector<unsigned char> row((size_t)out->w * cinfo.output_components);
  unsigned char* rp = row.data();
  for (int y = 0; (unsigned)y < cinfo.output_height; ++y) {
    jpeg_read_scanlines(&cinfo, &rp, 1);
    float* dst = out->data.data() + (size_t)y * out->w * 3;
    for (int x = 0; x < out->w; ++x) {
      // RGB → BGR
      dst[x * 3 + 0] = row[x * 3 + 2];
      dst[x * 3 + 1] = row[x * 3 + 1];
      dst[x * 3 + 2] = row[x * 3 + 0];
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

bool decode_png16_depth(const char* path, float max_depth_m, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  int w = png_get_image_width(png, info);
  int h = png_get_image_height(png, info);
  int depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);
  if (color != PNG_COLOR_TYPE_GRAY) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  out->w = w;
  out->h = h;
  out->c = 1;
  out->data.resize((size_t)w * h);
  std::vector<unsigned char> row((size_t)w * (depth / 8));
  for (int y = 0; y < h; ++y) {
    png_read_row(png, row.data(), nullptr);
    float* dst = out->data.data() + (size_t)y * w;
    if (depth == 16) {
      for (int x = 0; x < w; ++x) {
        // PNG is big-endian
        uint16_t v = (uint16_t)((row[x * 2] << 8) | row[x * 2 + 1]);
        float m = v / 1000.0f;
        dst[x] = (m > max_depth_m) ? 0.0f : m;
      }
    } else {
      for (int x = 0; x < w; ++x) dst[x] = row[x] / 1000.0f;
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return true;
}

// ScanNet color frames are 1296x968; the python pipeline pads 2 zero rows
// top+bottom to 972 before resizing (reference datasets/transforms.py:83-92,
// mirrored in eprecon_tpu/data/transforms.py pad_scannet). Apply the same
// pad here so native-decoded images match the python path.
void pad_scannet_968(Image* img) {
  if (img->w != 1296 || img->h != 968 || img->c != 3) return;
  std::vector<float> padded((size_t)img->w * 972 * 3, 0.0f);
  std::memcpy(padded.data() + (size_t)2 * img->w * 3, img->data.data(),
              img->data.size() * sizeof(float));
  img->data = std::move(padded);
  img->h = 972;
}

void resize_bilinear(const Image& src, int out_w, int out_h, float* dst) {
  const float sx = (float)src.w / out_w;
  const float sy = (float)src.h / out_h;
  for (int y = 0; y < out_h; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)fy;
    if (y0 < 0) y0 = 0;
    int y1 = y0 + 1 < src.h ? y0 + 1 : src.h - 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < out_w; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)fx;
      if (x0 < 0) x0 = 0;
      int x1 = x0 + 1 < src.w ? x0 + 1 : src.w - 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int ch = 0; ch < src.c; ++ch) {
        float v00 = src.data[((size_t)y0 * src.w + x0) * src.c + ch];
        float v01 = src.data[((size_t)y0 * src.w + x1) * src.c + ch];
        float v10 = src.data[((size_t)y1 * src.w + x0) * src.c + ch];
        float v11 = src.data[((size_t)y1 * src.w + x1) * src.c + ch];
        dst[((size_t)y * out_w + x) * src.c + ch] =
            (1 - wy) * ((1 - wx) * v00 + wx * v01) +
            wy * ((1 - wx) * v10 + wx * v11);
      }
    }
  }
}

void resize_nearest(const Image& src, int out_w, int out_h, float* dst) {
  for (int y = 0; y < out_h; ++y) {
    int sy = (int)((y + 0.5f) * src.h / out_h);
    if (sy >= src.h) sy = src.h - 1;
    for (int x = 0; x < out_w; ++x) {
      int sx = (int)((x + 0.5f) * src.w / out_w);
      if (sx >= src.w) sx = src.w - 1;
      dst[(size_t)y * out_w + x] = src.data[(size_t)sy * src.w + sx];
    }
  }
}

struct Fragment {
  std::vector<std::string> img_paths;
  std::vector<std::string> depth_paths;
  std::vector<float> imgs;    // [n, H, W, 3]
  std::vector<float> depths;  // [n, H, W]
  std::atomic<int> pending{0};
  bool ok = true;
};

struct Loader {
  int out_w, out_h;
  float max_depth_m;
  std::vector<std::thread> threads;
  std::deque<std::function<void()>> queue;
  std::mutex mu;
  std::condition_variable cv;
  std::condition_variable done_cv;
  bool stop = false;
  long next_ticket = 1;
  std::map<long, Fragment*> frags;

  void worker() {
    for (;;) {
      std::function<void()> job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return stop || !queue.empty(); });
        if (stop && queue.empty()) return;
        job = std::move(queue.front());
        queue.pop_front();
      }
      job();
    }
  }
};

}  // namespace

extern "C" {

void* frag_loader_create(int n_threads, int out_w, int out_h,
                         float max_depth_m) {
  auto* l = new Loader;
  l->out_w = out_w;
  l->out_h = out_h;
  l->max_depth_m = max_depth_m;
  if (n_threads < 1) n_threads = 1;
  for (int i = 0; i < n_threads; ++i)
    l->threads.emplace_back([l] { l->worker(); });
  return l;
}

void frag_loader_destroy(void* handle) {
  auto* l = (Loader*)handle;
  {
    std::lock_guard<std::mutex> lk(l->mu);
    l->stop = true;
  }
  l->cv.notify_all();
  for (auto& t : l->threads) t.join();
  for (auto& kv : l->frags) delete kv.second;
  delete l;
}

long frag_loader_submit(void* handle, int n_views, const char** img_paths,
                        const char** depth_paths) {
  auto* l = (Loader*)handle;
  auto* fr = new Fragment;
  for (int i = 0; i < n_views; ++i) {
    fr->img_paths.emplace_back(img_paths[i]);
    fr->depth_paths.emplace_back(depth_paths ? depth_paths[i] : "");
  }
  const size_t img_sz = (size_t)l->out_h * l->out_w * 3;
  const size_t dep_sz = (size_t)l->out_h * l->out_w;
  fr->imgs.resize(img_sz * n_views);
  fr->depths.resize(dep_sz * n_views);
  fr->pending = n_views;

  long ticket;
  {
    std::lock_guard<std::mutex> lk(l->mu);
    ticket = l->next_ticket++;
    l->frags[ticket] = fr;
    for (int i = 0; i < n_views; ++i) {
      l->queue.push_back([l, fr, i, img_sz, dep_sz] {
        Image img;
        if (decode_jpeg_bgr(fr->img_paths[i].c_str(), &img)) {
          pad_scannet_968(&img);
          resize_bilinear(img, l->out_w, l->out_h, fr->imgs.data() + i * img_sz);
        } else {
          fr->ok = false;
        }
        if (!fr->depth_paths[i].empty()) {
          Image dep;
          if (decode_png16_depth(fr->depth_paths[i].c_str(), l->max_depth_m,
                                 &dep)) {
            resize_nearest(dep, l->out_w, l->out_h,
                           fr->depths.data() + i * dep_sz);
          } else {
            fr->ok = false;
          }
        }
        if (--fr->pending == 0) l->done_cv.notify_all();
      });
    }
  }
  l->cv.notify_all();
  return ticket;
}

int frag_loader_fetch(void* handle, long ticket, float* imgs_out,
                      float* depths_out, int n_views) {
  auto* l = (Loader*)handle;
  Fragment* fr;
  {
    std::unique_lock<std::mutex> lk(l->mu);
    auto it = l->frags.find(ticket);
    if (it == l->frags.end()) return -1;
    fr = it->second;
    l->done_cv.wait(lk, [&] { return fr->pending.load() == 0; });
    l->frags.erase(it);
  }
  int rc = fr->ok ? 0 : -2;
  if (imgs_out) memcpy(imgs_out, fr->imgs.data(), fr->imgs.size() * 4);
  if (depths_out) memcpy(depths_out, fr->depths.data(), fr->depths.size() * 4);
  delete fr;
  return rc;
}

}  // extern "C"
