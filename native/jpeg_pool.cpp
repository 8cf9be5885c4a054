// Native JPEG decode pool for the ingestion pipeline.
//
// The host's residual job under on-device tiling is reading + decoding
// JPEGs (ingest/device_tiling.py). This pool does that stage entirely in
// C++: pthreads workers pull paths from a queue, read the file, decode via
// libjpeg into caller-visible RGB buffers, and publish completions — no
// Python objects or GIL on the decode path. Python drives it over ctypes
// (runtime/jpeg_decode.py), mirroring native/roaring.cpp's build scheme.
//
// C ABI:
//   jp_create(n_threads, max_w, max_h)      -> pool*
//   jp_submit(pool, id, path)               -> 0 ok / -1 queue full
//   jp_poll(pool, *id, *w, *h, buf, buflen) -> 1 result / 0 none / -2 error result
//   jp_pending(pool)                        -> jobs submitted but not polled
//   jp_destroy(pool)
//
// Decoded output is tightly packed RGB8 (h*w*3 bytes, row-major).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

struct Job {
  int64_t id;
  std::string path;
};

struct Result {
  int64_t id;
  int w = 0;
  int h = 0;
  bool ok = false;
  std::vector<uint8_t> rgb;
};

struct Pool {
  int max_w, max_h;
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_work;
  std::deque<Job> jobs;
  std::deque<Result> results;
  std::atomic<int64_t> pending{0};
  bool stopping = false;

  Pool(int n_threads, int mw, int mh) : max_w(mw), max_h(mh) {
    for (int i = 0; i < n_threads; i++) {
      workers.emplace_back([this] { this->run(); });
    }
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> g(mu);
      stopping = true;
    }
    cv_work.notify_all();
    for (auto& t : workers) t.join();
  }

  void run() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> g(mu);
        cv_work.wait(g, [this] { return stopping || !jobs.empty(); });
        if (stopping && jobs.empty()) return;
        job = std::move(jobs.front());
        jobs.pop_front();
      }
      Result r = decode(job);
      {
        std::lock_guard<std::mutex> g(mu);
        results.push_back(std::move(r));
      }
    }
  }

  Result decode(const Job& job) {
    Result r;
    r.id = job.id;

    FILE* f = std::fopen(job.path.c_str(), "rb");
    if (!f) return r;

    jpeg_decompress_struct cinfo;
    ErrMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = error_exit;
    if (setjmp(jerr.jump)) {  // corrupt file: bail with ok=false
      jpeg_destroy_decompress(&cinfo);
      std::fclose(f);
      r.ok = false;
      return r;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);

    int w = static_cast<int>(cinfo.output_width);
    int h = static_cast<int>(cinfo.output_height);
    if (w <= 0 || h <= 0 || w > max_w || h > max_h) {
      jpeg_abort_decompress(&cinfo);
      jpeg_destroy_decompress(&cinfo);
      std::fclose(f);
      return r;
    }
    r.w = w;
    r.h = h;
    r.rgb.resize(static_cast<size_t>(w) * h * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
      JSAMPROW row = r.rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
      jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    r.ok = true;
    return r;
  }
};

}  // namespace

extern "C" {

void* jp_create(int n_threads, int max_w, int max_h) {
  if (n_threads < 1) n_threads = 1;
  return new Pool(n_threads, max_w, max_h);
}

void jp_destroy(void* p) { delete static_cast<Pool*>(p); }

int jp_submit(void* p, int64_t id, const char* path) {
  Pool* pool = static_cast<Pool*>(p);
  {
    std::lock_guard<std::mutex> g(pool->mu);
    if (pool->stopping) return -1;
    // increment BEFORE the job becomes visible: a worker could otherwise
    // decode + get polled (fetch_sub) before this thread's fetch_add,
    // letting jp_pending() transiently report 0/-1 with work in flight
    pool->pending.fetch_add(1);
    pool->jobs.push_back(Job{id, std::string(path)});
  }
  pool->cv_work.notify_one();
  return 0;
}

int64_t jp_pending(void* p) { return static_cast<Pool*>(p)->pending.load(); }

// Returns 1 and fills (*id, *w, *h, buf) on success; 0 when no result is
// ready; -2 for a failed decode (id still reported). buf must hold
// (*w) * (*h) * 3 bytes, i.e. at least max_w*max_h*3.
int jp_poll(void* p, int64_t* id, int* w, int* h, uint8_t* buf, int64_t buflen) {
  Pool* pool = static_cast<Pool*>(p);
  Result r;
  {
    std::lock_guard<std::mutex> g(pool->mu);
    if (pool->results.empty()) return 0;
    r = std::move(pool->results.front());
    pool->results.pop_front();
  }
  pool->pending.fetch_sub(1);
  *id = r.id;
  *w = r.w;
  *h = r.h;
  if (!r.ok) return -2;
  int64_t need = static_cast<int64_t>(r.w) * r.h * 3;
  if (need > buflen) return -2;
  std::memcpy(buf, r.rgb.data(), static_cast<size_t>(need));
  return 1;
}

}  // extern "C"
