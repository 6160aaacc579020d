// Native visibility IO: binary chunked store with background prefetch.
//
// The reference delegates heavy IO to the external C++ stack (DP3 DPBuffer
// streaming, dp3_calibration.py:157-196; casacore measurement sets). This is
// the framework's native equivalent: a flat binary visibility format with
// time-slab chunk reads, O_DIRECT-free buffered IO, and a prefetch thread so
// host IO overlaps device compute (double buffering at the Python rim).
//
// Layout (little endian):
//   header: char magic[8] = "SVIS0001"
//           int64 ntime, nbl, nchan, npol
//   meta:   f64 frequency[nchan]
//           f64 time[ntime]
//           i32 antenna1[nbl], antenna2[nbl]
//           f64 uvw[ntime*nbl*3]
//   data:   per time slab t: f32 vis_re[nbl*nchan*npol],
//           f32 vis_im[...], f32 weight[...], u8 flags[...]
//
// C ABI for ctypes. Thread-safety: one handle per thread of control; the
// prefetch thread is internal.

#include <cstdio>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <string>
#include <thread>
#include <mutex>
#include <condition_variable>
#include <vector>

namespace {

constexpr char kMagic[8] = {'S', 'V', 'I', 'S', '0', '0', '0', '1'};

struct Header {
  int64_t ntime, nbl, nchan, npol;
};

struct Handle {
  FILE* f = nullptr;
  Header h{};
  bool writable = false;
  // prefetch state
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv;
  bool job_ready = false;
  bool job_done = false;
  bool shutdown = false;
  int64_t job_t0 = 0, job_nt = 0;
  std::vector<float> buf_re, buf_im, buf_wt;
  std::vector<uint8_t> buf_fl;

  int64_t rowsz() const { return h.nbl * h.nchan * h.npol; }
  int64_t meta_bytes() const {
    return 8 * h.nchan + 8 * h.ntime + 4 * 2 * h.nbl +
           8 * h.ntime * h.nbl * 3;
  }
  int64_t slab_bytes() const { return rowsz() * (4 * 3 + 1); }
  int64_t data_offset() const { return 8 + 32 + meta_bytes(); }

  void read_slabs(int64_t t0, int64_t nt, float* re, float* im, float* wt,
                  uint8_t* fl) {
    const int64_t rs = rowsz();
    for (int64_t t = 0; t < nt; ++t) {
      int64_t off = data_offset() + (t0 + t) * slab_bytes();
#ifdef _WIN32
      fseek(f, (long)off, SEEK_SET);
#else
      fseeko(f, off, SEEK_SET);
#endif
      size_t n = 0;
      n += fread(re + t * rs, 4, rs, f);
      n += fread(im + t * rs, 4, rs, f);
      n += fread(wt + t * rs, 4, rs, f);
      n += fread(fl + t * rs, 1, rs, f);
      (void)n;
    }
  }

  void worker_loop() {
    std::unique_lock<std::mutex> lk(mu);
    while (true) {
      cv.wait(lk, [&] { return job_ready || shutdown; });
      if (shutdown) return;
      int64_t t0 = job_t0, nt = job_nt;
      job_ready = false;
      lk.unlock();
      const int64_t rs = rowsz();
      buf_re.resize(nt * rs);
      buf_im.resize(nt * rs);
      buf_wt.resize(nt * rs);
      buf_fl.resize(nt * rs);
      read_slabs(t0, nt, buf_re.data(), buf_im.data(), buf_wt.data(),
                 buf_fl.data());
      lk.lock();
      job_done = true;
      cv.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* svis_create(const char* path, int64_t ntime, int64_t nbl,
                  int64_t nchan, int64_t npol) {
  FILE* f = fopen(path, "wb");
  if (!f) return nullptr;
  auto* handle = new Handle();
  handle->f = f;
  handle->h = {ntime, nbl, nchan, npol};
  handle->writable = true;
  fwrite(kMagic, 1, 8, f);
  fwrite(&handle->h, 8, 4, f);
  return handle;
}

int svis_write_meta(void* hv, const double* frequency, const double* time,
                    const int32_t* a1, const int32_t* a2,
                    const double* uvw) {
  auto* handle = static_cast<Handle*>(hv);
  const Header& h = handle->h;
  FILE* f = handle->f;
  if (fwrite(frequency, 8, h.nchan, f) != (size_t)h.nchan) return -1;
  if (fwrite(time, 8, h.ntime, f) != (size_t)h.ntime) return -1;
  if (fwrite(a1, 4, h.nbl, f) != (size_t)h.nbl) return -1;
  if (fwrite(a2, 4, h.nbl, f) != (size_t)h.nbl) return -1;
  int64_t n = h.ntime * h.nbl * 3;
  if (fwrite(uvw, 8, n, f) != (size_t)n) return -1;
  return 0;
}

int svis_write_chunk(void* hv, int64_t t0, int64_t nt, const float* re,
                     const float* im, const float* wt, const uint8_t* fl) {
  auto* handle = static_cast<Handle*>(hv);
  const int64_t rs = handle->rowsz();
  for (int64_t t = 0; t < nt; ++t) {
    int64_t off = handle->data_offset() + (t0 + t) * handle->slab_bytes();
    fseeko(handle->f, off, SEEK_SET);
    if (fwrite(re + t * rs, 4, rs, handle->f) != (size_t)rs) return -1;
    if (fwrite(im + t * rs, 4, rs, handle->f) != (size_t)rs) return -1;
    if (fwrite(wt + t * rs, 4, rs, handle->f) != (size_t)rs) return -1;
    if (fwrite(fl + t * rs, 1, rs, handle->f) != (size_t)rs) return -1;
  }
  return 0;
}

void* svis_open(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  char magic[8];
  if (fread(magic, 1, 8, f) != 8 || memcmp(magic, kMagic, 8) != 0) {
    fclose(f);
    return nullptr;
  }
  auto* handle = new Handle();
  handle->f = f;
  if (fread(&handle->h, 8, 4, f) != 4) {
    fclose(f);
    delete handle;
    return nullptr;
  }
  handle->worker = std::thread([handle] { handle->worker_loop(); });
  return handle;
}

void svis_dims(void* hv, int64_t* dims) {
  auto* handle = static_cast<Handle*>(hv);
  dims[0] = handle->h.ntime;
  dims[1] = handle->h.nbl;
  dims[2] = handle->h.nchan;
  dims[3] = handle->h.npol;
}

// Absolute byte offsets of the meta sections (frequency, time, antenna1,
// antenna2, uvw) — the single source of truth for readers that map or
// slice the meta blocks directly (the Python rim memmaps the uvw block
// instead of calling svis_read_meta, which at 1B vis would eagerly load
// 24 GB of f64). Any layout change here changes these values, so the
// Python side can never drift from the writer.
void svis_meta_offsets(void* hv, int64_t* off) {
  auto* handle = static_cast<Handle*>(hv);
  const Header& h = handle->h;
  int64_t o = 8 + 32;  // magic + 4x i64 dims
  off[0] = o;                     // f64 frequency[nchan]
  o += 8 * h.nchan;
  off[1] = o;                     // f64 time[ntime]
  o += 8 * h.ntime;
  off[2] = o;                     // i32 antenna1[nbl]
  o += 4 * h.nbl;
  off[3] = o;                     // i32 antenna2[nbl]
  o += 4 * h.nbl;
  off[4] = o;                     // f64 uvw[ntime*nbl*3]
}

int svis_read_meta(void* hv, double* frequency, double* time, int32_t* a1,
                   int32_t* a2, double* uvw) {
  auto* handle = static_cast<Handle*>(hv);
  const Header& h = handle->h;
  fseeko(handle->f, 8 + 32, SEEK_SET);
  if (fread(frequency, 8, h.nchan, handle->f) != (size_t)h.nchan) return -1;
  if (fread(time, 8, h.ntime, handle->f) != (size_t)h.ntime) return -1;
  if (fread(a1, 4, h.nbl, handle->f) != (size_t)h.nbl) return -1;
  if (fread(a2, 4, h.nbl, handle->f) != (size_t)h.nbl) return -1;
  int64_t n = h.ntime * h.nbl * 3;
  if (fread(uvw, 8, n, handle->f) != (size_t)n) return -1;
  return 0;
}

int svis_read_chunk(void* hv, int64_t t0, int64_t nt, float* re, float* im,
                    float* wt, uint8_t* fl) {
  auto* handle = static_cast<Handle*>(hv);
  handle->read_slabs(t0, nt, re, im, wt, fl);
  return 0;
}

// --- async prefetch ------------------------------------------------------

int svis_prefetch(void* hv, int64_t t0, int64_t nt) {
  auto* handle = static_cast<Handle*>(hv);
  std::lock_guard<std::mutex> lk(handle->mu);
  handle->job_t0 = t0;
  handle->job_nt = nt;
  handle->job_ready = true;
  handle->job_done = false;
  handle->cv.notify_all();
  return 0;
}

int svis_wait(void* hv, float* re, float* im, float* wt, uint8_t* fl) {
  auto* handle = static_cast<Handle*>(hv);
  std::unique_lock<std::mutex> lk(handle->mu);
  handle->cv.wait(lk, [&] { return handle->job_done; });
  const int64_t n = handle->job_nt * handle->rowsz();
  memcpy(re, handle->buf_re.data(), 4 * n);
  memcpy(im, handle->buf_im.data(), 4 * n);
  memcpy(wt, handle->buf_wt.data(), 4 * n);
  memcpy(fl, handle->buf_fl.data(), n);
  return 0;
}

void svis_close(void* hv) {
  auto* handle = static_cast<Handle*>(hv);
  if (handle->worker.joinable()) {
    {
      std::lock_guard<std::mutex> lk(handle->mu);
      handle->shutdown = true;
      handle->cv.notify_all();
    }
    handle->worker.join();
  }
  fclose(handle->f);
  delete handle;
}

}  // extern "C"
