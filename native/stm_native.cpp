// Native host runtime for the TPU stereo-to-multiview engine.
//
// The reference's host layer is C++ (image_io.cpp / video_io.cpp /
// getCPUtime.cpp): OpenCV decode, CPU timers, a frame loop.  This library is
// its TPU-native equivalent: dependency-free 24/32bpp BMP codec, monotonic +
// process-CPU timers (getCPUtime parity), and a multi-threaded prefetching
// frame queue that decodes and stitches SBS frames on host threads so IO
// overlaps device compute.  Exposed C ABI, consumed via ctypes
// (stereo_to_multiview_tpu/native.py).
//
// Build: make -C native   ->  libstm_native.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>

#include <atomic>
#include <condition_variable>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// timers (getCPUtime.cpp parity)
// ---------------------------------------------------------------------------

double stm_wall_time() {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return (double)ts.tv_sec + 1e-9 * (double)ts.tv_nsec;
}

double stm_cpu_time() {
  struct timespec ts;
  clock_gettime(CLOCK_PROCESS_CPUTIME_ID, &ts);
  return (double)ts.tv_sec + 1e-9 * (double)ts.tv_nsec;
}

// ---------------------------------------------------------------------------
// BMP codec (24/32bpp uncompressed, bottom-up or top-down, BGR out)
// ---------------------------------------------------------------------------

static uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
static int32_t rd_i32(const uint8_t* p) { return (int32_t)rd_u32(p); }
static uint16_t rd_u16(const uint8_t* p) {
  return (uint16_t)((uint32_t)p[0] | ((uint32_t)p[1] << 8));
}

// Returns 0 on success.  If out == nullptr, only fills *h/*w.
int stm_bmp_read(const char* path, uint8_t* out, int32_t* h, int32_t* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint8_t hdr[54];
  if (fread(hdr, 1, 54, f) != 54 || hdr[0] != 'B' || hdr[1] != 'M') {
    fclose(f);
    return -2;
  }
  uint32_t pixel_off = rd_u32(hdr + 10);
  int32_t width = rd_i32(hdr + 18);
  int32_t height = rd_i32(hdr + 22);
  uint16_t bpp = rd_u16(hdr + 28);
  uint32_t compression = rd_u32(hdr + 30);
  bool bottom_up = height > 0;
  if (height < 0) height = -height;
  if ((bpp != 24 && bpp != 32) || (compression != 0 && compression != 3)) {
    fclose(f);
    return -3;
  }
  *h = height;
  *w = width;
  if (!out) {
    fclose(f);
    return 0;
  }
  int bytes_pp = bpp / 8;
  size_t row_sz = ((size_t)width * bytes_pp + 3) & ~(size_t)3;
  std::vector<uint8_t> row(row_sz);
  if (fseek(f, (long)pixel_off, SEEK_SET) != 0) {
    fclose(f);
    return -4;
  }
  for (int32_t r = 0; r < height; ++r) {
    if (fread(row.data(), 1, row_sz, f) != row_sz) {
      fclose(f);
      return -5;
    }
    int32_t out_r = bottom_up ? (height - 1 - r) : r;
    uint8_t* dst = out + (size_t)out_r * width * 3;
    const uint8_t* src = row.data();
    if (bytes_pp == 3) {
      memcpy(dst, src, (size_t)width * 3);
    } else {
      for (int32_t x = 0; x < width; ++x) {
        dst[3 * x] = src[4 * x];
        dst[3 * x + 1] = src[4 * x + 1];
        dst[3 * x + 2] = src[4 * x + 2];
      }
    }
  }
  fclose(f);
  return 0;
}

int stm_bmp_write(const char* path, const uint8_t* img, int32_t h, int32_t w) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  size_t row_sz = ((size_t)w * 3 + 3) & ~(size_t)3;
  uint32_t pixel_bytes = (uint32_t)(row_sz * h);
  uint32_t file_sz = 54 + pixel_bytes;
  uint8_t hdr[54] = {0};
  hdr[0] = 'B';
  hdr[1] = 'M';
  memcpy(hdr + 2, &file_sz, 4);
  uint32_t off = 54;
  memcpy(hdr + 10, &off, 4);
  uint32_t info = 40;
  memcpy(hdr + 14, &info, 4);
  memcpy(hdr + 18, &w, 4);
  memcpy(hdr + 22, &h, 4);
  uint16_t planes = 1, bpp = 24;
  memcpy(hdr + 26, &planes, 2);
  memcpy(hdr + 28, &bpp, 2);
  memcpy(hdr + 34, &pixel_bytes, 4);
  fwrite(hdr, 1, 54, f);
  std::vector<uint8_t> row(row_sz, 0);
  for (int32_t r = h - 1; r >= 0; --r) {  // bottom-up
    memcpy(row.data(), img + (size_t)r * w * 3, (size_t)w * 3);
    fwrite(row.data(), 1, row_sz, f);
  }
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// prefetching frame queue
// ---------------------------------------------------------------------------
//
// N decoder threads pull file indices from a work list, decode (and stitch
// L/R pairs into SBS when pair_mode), and publish frames IN ORDER into a
// bounded ring.  The consumer (Python) blocks in stm_queue_next.

struct Frame {
  std::vector<uint8_t> data;
  int32_t h = 0, w = 0;
  int ok = -1;
};

struct FrameQueue {
  std::vector<std::string> paths;   // frame files (pairs flattened: L,R,L,R)
  bool pair_mode = false;
  int depth = 4;
  int loops = 1;                    // how many passes over the list
  size_t n_logical = 0;             // frames per pass

  std::mutex mu;
  std::condition_variable cv_pub, cv_take;
  std::vector<Frame> ring;
  std::vector<char> ready;
  size_t next_take = 0;             // logical index consumer needs next
  std::atomic<size_t> next_job{0};  // logical index to decode next
  size_t total = 0;                 // total logical frames (passes * per-pass)
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;

  size_t per_pass() const { return n_logical; }
};

static void decode_logical(FrameQueue* q, size_t logical, Frame* fr) {
  size_t idx = logical % q->per_pass();
  if (!q->pair_mode) {
    int32_t h = 0, w = 0;
    if (stm_bmp_read(q->paths[idx].c_str(), nullptr, &h, &w) != 0) {
      fr->ok = -1;
      return;
    }
    fr->data.resize((size_t)h * w * 3);
    fr->ok = stm_bmp_read(q->paths[idx].c_str(), fr->data.data(), &h, &w);
    fr->h = h;
    fr->w = w;
  } else {
    const std::string& pl = q->paths[2 * idx];
    const std::string& pr = q->paths[2 * idx + 1];
    int32_t hl, wl, hr, wr;
    if (stm_bmp_read(pl.c_str(), nullptr, &hl, &wl) != 0 ||
        stm_bmp_read(pr.c_str(), nullptr, &hr, &wr) != 0 || hl != hr ||
        wl != wr) {
      fr->ok = -1;
      return;
    }
    std::vector<uint8_t> left((size_t)hl * wl * 3), right((size_t)hl * wl * 3);
    if (stm_bmp_read(pl.c_str(), left.data(), &hl, &wl) != 0 ||
        stm_bmp_read(pr.c_str(), right.data(), &hr, &wr) != 0) {
      fr->ok = -1;
      return;
    }
    fr->h = hl;
    fr->w = 2 * wl;
    fr->data.resize((size_t)hl * wl * 6);
    for (int32_t r = 0; r < hl; ++r) {
      memcpy(fr->data.data() + (size_t)r * wl * 6,
             left.data() + (size_t)r * wl * 3, (size_t)wl * 3);
      memcpy(fr->data.data() + (size_t)r * wl * 6 + (size_t)wl * 3,
             right.data() + (size_t)r * wl * 3, (size_t)wl * 3);
    }
    fr->ok = 0;
  }
}

static void worker_fn(FrameQueue* q) {
  while (!q->stop.load()) {
    size_t job = q->next_job.fetch_add(1);
    if (job >= q->total) return;
    Frame fr;
    decode_logical(q, job, &fr);
    std::unique_lock<std::mutex> lk(q->mu);
    // wait until job's ring slot is free (consumer caught up enough)
    q->cv_take.wait(lk, [&] {
      return q->stop.load() || job < q->next_take + q->ring.size();
    });
    if (q->stop.load()) return;
    size_t slot = job % q->ring.size();
    q->ring[slot] = std::move(fr);
    q->ready[slot] = 1;
    q->cv_pub.notify_all();
  }
}

void* stm_queue_create(const char** paths, int32_t n_paths, int32_t pair_mode,
                       int32_t depth, int32_t loops, int32_t n_threads) {
  FrameQueue* q = new FrameQueue();
  for (int32_t i = 0; i < n_paths; ++i) q->paths.emplace_back(paths[i]);
  q->pair_mode = pair_mode != 0;
  q->depth = depth > 0 ? depth : 4;
  q->n_logical = q->pair_mode ? (q->paths.size() / 2) : q->paths.size();
  q->total = q->n_logical * (size_t)(loops > 0 ? loops : 1);
  q->ring.resize(q->depth);
  q->ready.assign(q->depth, 0);
  int nt = n_threads > 0 ? n_threads : 2;
  for (int t = 0; t < nt; ++t) q->workers.emplace_back(worker_fn, q);
  return q;
}

// Blocks for the next in-order frame.  Returns 0 ok / 1 end / <0 error.
// On ok: writes h, w (SBS width) and, if out != nullptr, copies pixels.
int stm_queue_next(void* vq, uint8_t* out, int32_t* h, int32_t* w) {
  FrameQueue* q = (FrameQueue*)vq;
  std::unique_lock<std::mutex> lk(q->mu);
  if (q->next_take >= q->total) return 1;
  size_t slot = q->next_take % q->ring.size();
  q->cv_pub.wait(lk, [&] { return q->stop.load() || q->ready[slot]; });
  if (q->stop.load()) return -9;
  Frame& fr = q->ring[slot];
  if (fr.ok != 0) {
    q->ready[slot] = 0;
    q->next_take++;
    q->cv_take.notify_all();
    return -1;
  }
  *h = fr.h;
  *w = fr.w;
  if (out) memcpy(out, fr.data.data(), fr.data.size());
  q->ready[slot] = 0;
  q->next_take++;
  q->cv_take.notify_all();
  return 0;
}

void stm_queue_destroy(void* vq) {
  FrameQueue* q = (FrameQueue*)vq;
  q->stop.store(true);
  q->cv_pub.notify_all();
  q->cv_take.notify_all();
  for (auto& t : q->workers) t.join();
  delete q;
}

// ---------------------------------------------------------------------------
// Y4M (YUV4MPEG2) reader: container-free video ingestion -- the TPU-native
// analog of the reference's cv::VideoCapture path (video_io.cpp:77,148).
// Supports C420* (any cositing tag; nearest chroma upsample), C422, C444,
// 8-bit.  Output is BGR uint8 via integer BT.601 limited-range conversion
// (bit-identical to the Python fallback in utils/y4m.py).
// ---------------------------------------------------------------------------

struct Y4MReader {
  FILE* f = nullptr;
  long data_start = 0;
  int32_t w = 0, h = 0;
  int cs = 420;  // chroma layout: 420, 422 or 444
  std::vector<uint8_t> planes;
};

static size_t y4m_frame_bytes(const Y4MReader* r) {
  size_t y = (size_t)r->w * r->h;
  size_t cw = (size_t)((r->w + 1) / 2);
  if (r->cs == 444) return 3 * y;
  if (r->cs == 422) return y + 2 * cw * r->h;  // cw x h chroma planes
  return y + 2 * (cw * (size_t)((r->h + 1) / 2));
}

// Read one header line (up to '\n') of arbitrary length into `out`.
// Returns false on EOF/error before any byte.
static bool y4m_read_line(FILE* f, std::string* out) {
  out->clear();
  int c;
  while ((c = fgetc(f)) != EOF) {
    if (c == '\n') return true;
    out->push_back((char)c);
  }
  return !out->empty();
}

void* stm_y4m_open(const char* path, int32_t* w, int32_t* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  std::string hdr;
  if (!y4m_read_line(f, &hdr)) { fclose(f); return nullptr; }
  if (strncmp(hdr.c_str(), "YUV4MPEG2", 9) != 0) { fclose(f); return nullptr; }
  Y4MReader* r = new Y4MReader();
  r->f = f;
  std::vector<char> line(hdr.begin(), hdr.end());
  line.push_back('\0');
  for (char* tok = strtok(line.data() + 9, " "); tok;
       tok = strtok(nullptr, " ")) {
    if (tok[0] == 'W') r->w = atoi(tok + 1);
    else if (tok[0] == 'H') r->h = atoi(tok + 1);
    else if (tok[0] == 'C') {
      if (strncmp(tok + 1, "444", 3) == 0) r->cs = 444;
      else if (strncmp(tok + 1, "422", 3) == 0) r->cs = 422;
      else r->cs = 420;  // C420, C420jpeg, C420mpeg2, C420paldv
    }
  }
  if (r->w <= 0 || r->h <= 0) { fclose(f); delete r; return nullptr; }
  r->data_start = ftell(f);
  r->planes.resize(y4m_frame_bytes(r));
  *w = r->w;
  *h = r->h;
  return r;
}

static inline uint8_t clip8(int v) {
  return (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
}

// 0 ok / 1 eof / <0 error.  bgr: (h, w, 3) uint8.
int stm_y4m_next(void* vr, uint8_t* bgr) {
  Y4MReader* r = (Y4MReader*)vr;
  std::string line;
  if (!y4m_read_line(r->f, &line)) return 1;
  if (strncmp(line.c_str(), "FRAME", 5) != 0) return -2;
  if (fread(r->planes.data(), 1, r->planes.size(), r->f) != r->planes.size())
    return -3;
  int32_t w = r->w, h = r->h;
  int cw = (r->cs == 444) ? w : (w + 1) / 2;
  int ch = (r->cs == 420) ? (h + 1) / 2 : h;
  const uint8_t* yp = r->planes.data();
  const uint8_t* up = yp + (size_t)w * h;
  const uint8_t* vp = up + (size_t)cw * ch;
  for (int32_t yy = 0; yy < h; ++yy) {
    int cy = (r->cs == 420) ? (yy >> 1) : yy;
    for (int32_t xx = 0; xx < w; ++xx) {
      int cx = (r->cs == 444) ? xx : (xx >> 1);
      int C = (int)yp[(size_t)yy * w + xx] - 16;
      int D = (int)up[(size_t)cy * cw + cx] - 128;
      int E = (int)vp[(size_t)cy * cw + cx] - 128;
      uint8_t* px = bgr + 3 * ((size_t)yy * w + xx);
      px[0] = clip8((298 * C + 516 * D + 128) >> 8);           // B
      px[1] = clip8((298 * C - 100 * D - 208 * E + 128) >> 8);  // G
      px[2] = clip8((298 * C + 409 * E + 128) >> 8);           // R
    }
  }
  return 0;
}

void stm_y4m_rewind(void* vr) {
  Y4MReader* r = (Y4MReader*)vr;
  fseek(r->f, r->data_start, SEEK_SET);
}

void stm_y4m_close(void* vr) {
  Y4MReader* r = (Y4MReader*)vr;
  if (r->f) fclose(r->f);
  delete r;
}

}  // extern "C"
