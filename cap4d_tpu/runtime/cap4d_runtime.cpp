// cap4d_tpu native runtime: threaded image decode + fused crop/resize loader.
//
// TPU-native replacement for the reference's C++ data-path dependencies
// (decord VideoReader, cap4d/datasets/utils.py:220-237 frame loading, and the
// per-frame crop_image/rescale_image host work feeding the conditioning
// pipeline). The hot host path — decode → pad-crop → resize → normalise to
// [-1, 1] float — runs fused in one pass per frame on a worker pool, off the
// Python GIL.
//
// C ABI only (consumed via ctypes; pybind11 is not available in this image).

#include <png.h>
#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // h*w*3
};

bool decode_png_file(FILE* fp, Image* img) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  // normalise everything to 8-bit RGB
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  img->w = static_cast<int>(w);
  img->h = static_cast<int>(h);
  img->rgb.resize(static_cast<size_t>(w) * h * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = img->rgb.data() + static_cast<size_t>(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_jpeg_file(FILE* fp, Image* img) {
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img->w = cinfo.output_width;
  img->h = cinfo.output_height;
  img->rgb.resize(static_cast<size_t>(img->w) * img->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row =
        img->rgb.data() + static_cast<size_t>(cinfo.output_scanline) * img->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_image(const char* path, Image* img) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  uint8_t magic[4] = {0};
  if (fread(magic, 1, 4, fp) != 4) {
    fclose(fp);
    return false;
  }
  rewind(fp);
  bool ok = false;
  if (magic[0] == 0x89 && magic[1] == 'P')
    ok = decode_png_file(fp, img);
  else if (magic[0] == 0xFF && magic[1] == 0xD8)
    ok = decode_jpeg_file(fp, img);
  fclose(fp);
  return ok;
}

// pad-crop (crop_image semantics: OOB → bg value) into a square crop buffer
void pad_crop(const Image& img, const int box[4], uint8_t bg, Image* out) {
  const int x0 = box[0], y0 = box[1], x1 = box[2], y1 = box[3];
  out->w = x1 - x0;
  out->h = y1 - y0;
  out->rgb.assign(static_cast<size_t>(out->w) * out->h * 3, bg);
  const int sx0 = std::max(0, x0), sy0 = std::max(0, y0);
  const int sx1 = std::min(img.w, x1), sy1 = std::min(img.h, y1);
  for (int y = sy0; y < sy1; ++y) {
    if (sx1 <= sx0) continue;
    std::memcpy(out->rgb.data() +
                    (static_cast<size_t>(y - y0) * out->w + (sx0 - x0)) * 3,
                img.rgb.data() + (static_cast<size_t>(y) * img.w + sx0) * 3,
                static_cast<size_t>(sx1 - sx0) * 3);
  }
}

// area-average resize for downscale, bilinear for upscale; output float [-1,1]
void resize_normalize(const Image& img, int res, float* out) {
  const float sx = static_cast<float>(img.w) / res;
  const float sy = static_cast<float>(img.h) / res;
  const bool down = res < img.h;
  for (int oy = 0; oy < res; ++oy) {
    for (int ox = 0; ox < res; ++ox) {
      float acc[3] = {0, 0, 0};
      if (down) {  // box filter over the source cell
        int x0 = static_cast<int>(ox * sx), x1 = static_cast<int>((ox + 1) * sx);
        int y0 = static_cast<int>(oy * sy), y1 = static_cast<int>((oy + 1) * sy);
        x1 = std::max(x1, x0 + 1);
        y1 = std::max(y1, y0 + 1);
        x1 = std::min(x1, img.w);
        y1 = std::min(y1, img.h);
        const float inv = 1.0f / ((x1 - x0) * (y1 - y0));
        for (int y = y0; y < y1; ++y)
          for (int x = x0; x < x1; ++x) {
            const uint8_t* p = img.rgb.data() + (static_cast<size_t>(y) * img.w + x) * 3;
            acc[0] += p[0];
            acc[1] += p[1];
            acc[2] += p[2];
          }
        acc[0] *= inv;
        acc[1] *= inv;
        acc[2] *= inv;
      } else {  // bilinear
        const float fx = (ox + 0.5f) * sx - 0.5f;
        const float fy = (oy + 0.5f) * sy - 0.5f;
        const int x0 = std::max(0, std::min(img.w - 1, static_cast<int>(fx)));
        const int y0 = std::max(0, std::min(img.h - 1, static_cast<int>(fy)));
        const int x1 = std::min(img.w - 1, x0 + 1);
        const int y1 = std::min(img.h - 1, y0 + 1);
        const float ax = std::max(0.0f, std::min(1.0f, fx - x0));
        const float ay = std::max(0.0f, std::min(1.0f, fy - y0));
        for (int c = 0; c < 3; ++c) {
          const float v00 = img.rgb[(static_cast<size_t>(y0) * img.w + x0) * 3 + c];
          const float v01 = img.rgb[(static_cast<size_t>(y0) * img.w + x1) * 3 + c];
          const float v10 = img.rgb[(static_cast<size_t>(y1) * img.w + x0) * 3 + c];
          const float v11 = img.rgb[(static_cast<size_t>(y1) * img.w + x1) * 3 + c];
          acc[c] = (1 - ay) * ((1 - ax) * v00 + ax * v01) +
                   ay * ((1 - ax) * v10 + ax * v11);
        }
      }
      float* o = out + (static_cast<size_t>(oy) * res + ox) * 3;
      o[0] = acc[0] / 127.5f - 1.0f;
      o[1] = acc[1] / 127.5f - 1.0f;
      o[2] = acc[2] / 127.5f - 1.0f;
    }
  }
}

int load_frame_impl(const char* path, const int box[4], int res, uint8_t bg,
                    float* out) {
  Image img;
  if (!decode_image(path, &img)) return -1;
  Image cropped;
  const Image* src = &img;
  if (box) {
    pad_crop(img, box, bg, &cropped);
    src = &cropped;
  }
  resize_normalize(*src, res, out);
  return 0;
}

// ---------------- prefetch pool ----------------

struct Job {
  std::string path;
  int box[4];
  bool has_box;
  int res;
  uint8_t bg;
  int ticket;
};

struct Pool {
  std::vector<std::thread> workers;
  std::deque<Job> queue;
  std::map<int, std::pair<int, std::vector<float>>> results;  // ticket → (status, data)
  std::mutex mu;
  std::condition_variable cv_job, cv_done;
  bool stop = false;

  explicit Pool(int n) {
    for (int i = 0; i < n; ++i)
      workers.emplace_back([this] { run(); });
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_job.notify_all();
    for (auto& w : workers) w.join();
  }
  void run() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_job.wait(lk, [this] { return stop || !queue.empty(); });
        if (stop && queue.empty()) return;
        job = std::move(queue.front());
        queue.pop_front();
      }
      std::vector<float> buf(static_cast<size_t>(job.res) * job.res * 3);
      int status = load_frame_impl(job.path.c_str(),
                                   job.has_box ? job.box : nullptr, job.res,
                                   job.bg, buf.data());
      {
        std::lock_guard<std::mutex> lk(mu);
        results[job.ticket] = {status, std::move(buf)};
      }
      cv_done.notify_all();
    }
  }
};

}  // namespace

extern "C" {

// Decode + optional pad-crop + resize + [-1,1] normalise. box may be null.
// Returns 0 on success.
int c4d_load_frame(const char* path, const int* box, int target_res, int bg,
                   float* out) {
  return load_frame_impl(path, box, target_res, static_cast<uint8_t>(bg), out);
}

// Raw decode: caller passes a buffer of cap_bytes; dims returned via w/h.
int c4d_decode_image(const char* path, uint8_t* out, long cap_bytes, int* w,
                     int* h) {
  Image img;
  if (!decode_image(path, &img)) return -1;
  *w = img.w;
  *h = img.h;
  const long need = static_cast<long>(img.rgb.size());
  if (need > cap_bytes) return -2;
  std::memcpy(out, img.rgb.data(), need);
  return 0;
}

void* c4d_pool_create(int n_threads) { return new Pool(n_threads); }

void c4d_pool_destroy(void* pool) { delete static_cast<Pool*>(pool); }

int c4d_pool_submit(void* pool, const char* path, const int* box,
                    int target_res, int bg, int ticket) {
  auto* p = static_cast<Pool*>(pool);
  Job job;
  job.path = path;
  job.has_box = box != nullptr;
  if (box) std::memcpy(job.box, box, sizeof(job.box));
  job.res = target_res;
  job.bg = static_cast<uint8_t>(bg);
  job.ticket = ticket;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->queue.push_back(std::move(job));
  }
  p->cv_job.notify_one();
  return 0;
}

// Blocks until the ticket's frame is ready; copies into out. Returns the
// job status (0 ok, -1 decode failure).
int c4d_pool_wait(void* pool, int ticket, float* out, int target_res) {
  auto* p = static_cast<Pool*>(pool);
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_done.wait(lk, [&] { return p->results.count(ticket) > 0; });
  auto node = p->results.extract(ticket);
  const auto& [status, data] = node.mapped();
  if (status == 0)
    std::memcpy(out, data.data(),
                sizeof(float) * static_cast<size_t>(target_res) * target_res * 3);
  return status;
}

}  // extern "C"
