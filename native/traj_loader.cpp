// traj_loader — native trajectory reader for molann_tpu.
//
// The fused TPU kernels consume packed float32 frame batches at >10 GB/s;
// a Python mmap + fancy-index pipeline cannot feed that. This library
// memory-maps .npy trajectory files (shape [n_frames, n_atoms, 3] or
// packed [n_frames, 3n], dtype <f4, C-order) and provides:
//
//   - zero-copy open (mmap, no read until touched)
//   - multi-threaded batch gather into a caller-provided packed buffer
//   - asynchronous prefetch (madvise WILLNEED + page touching) so the
//     next batch's pages are resident before the gather
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (molann_tpu/io/native_loader.py). No Python.h dependency.
//
// The reference has no native components at all (SURVEY.md §2.3); this is
// the runtime-side native piece of the TPU build (data path), while the
// compute-side native pieces are the Pallas kernels.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Loader {
  int fd = -1;
  const uint8_t* base = nullptr;   // mmap base
  size_t map_size = 0;
  const float* data = nullptr;     // first element of the array payload
  int64_t n_frames = 0;
  int64_t floats_per_frame = 0;    // 3 * n_atoms
  // prefetch worker
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv;
  std::vector<int64_t> pending;    // frame indices to prefetch
  bool stop = false;

  ~Loader() {
    {
      std::lock_guard<std::mutex> lock(mu);
      stop = true;
    }
    cv.notify_all();
    if (worker.joinable()) worker.join();
    if (base != nullptr) munmap(const_cast<uint8_t*>(base), map_size);
    if (fd >= 0) close(fd);
  }
};

thread_local std::string g_error;

void set_error(const std::string& msg) { g_error = msg; }

// Minimal .npy header parser (format spec v1.0/2.0/3.0). Returns payload
// offset or 0 on failure.
size_t parse_npy_header(const uint8_t* p, size_t size, Loader* L) {
  if (size < 10 || std::memcmp(p, "\x93NUMPY", 6) != 0) {
    set_error("not a .npy file");
    return 0;
  }
  const uint8_t major = p[6];
  size_t header_len, header_off;
  if (major == 1) {
    header_len = p[8] | (p[9] << 8);
    header_off = 10;
  } else {
    header_len = static_cast<size_t>(p[8]) | (static_cast<size_t>(p[9]) << 8) |
                 (static_cast<size_t>(p[10]) << 16) |
                 (static_cast<size_t>(p[11]) << 24);
    header_off = 12;
  }
  if (header_off + header_len > size) {
    set_error("truncated .npy header");
    return 0;
  }
  std::string header(reinterpret_cast<const char*>(p + header_off), header_len);

  if (header.find("'<f4'") == std::string::npos &&
      header.find("'float32'") == std::string::npos) {
    set_error("dtype must be little-endian float32 ('<f4'), got: " + header);
    return 0;
  }
  if (header.find("'fortran_order': True") != std::string::npos) {
    set_error("fortran_order arrays are not supported");
    return 0;
  }
  size_t sp = header.find("'shape':");
  if (sp == std::string::npos) {
    set_error("missing shape in .npy header");
    return 0;
  }
  size_t lp = header.find('(', sp);
  size_t rp = header.find(')', lp);
  if (lp == std::string::npos || rp == std::string::npos) {
    set_error("malformed shape in .npy header");
    return 0;
  }
  std::vector<int64_t> dims;
  std::string shape = header.substr(lp + 1, rp - lp - 1);
  const char* s = shape.c_str();
  while (*s) {
    while (*s == ' ' || *s == ',') s++;
    if (!*s) break;
    dims.push_back(strtoll(s, const_cast<char**>(&s), 10));
  }
  if (dims.size() == 3 && dims[2] == 3) {
    L->n_frames = dims[0];
    L->floats_per_frame = dims[1] * 3;
  } else if (dims.size() == 2) {
    L->n_frames = dims[0];
    L->floats_per_frame = dims[1];
  } else {
    set_error("expected shape [n_frames, n_atoms, 3] or [n_frames, 3n]");
    return 0;
  }
  return header_off + header_len;
}

void prefetch_loop(Loader* L) {
  const size_t page = static_cast<size_t>(sysconf(_SC_PAGESIZE));
  for (;;) {
    std::vector<int64_t> batch;
    {
      std::unique_lock<std::mutex> lock(L->mu);
      L->cv.wait(lock, [L] { return L->stop || !L->pending.empty(); });
      if (L->stop) return;
      batch.swap(L->pending);
    }
    const size_t frame_bytes = L->floats_per_frame * sizeof(float);
    volatile uint8_t sink = 0;
    for (int64_t f : batch) {
      const uint8_t* ptr = reinterpret_cast<const uint8_t*>(L->data) +
                           static_cast<size_t>(f) * frame_bytes;
      madvise(const_cast<uint8_t*>(
                  reinterpret_cast<const uint8_t*>(
                      reinterpret_cast<uintptr_t>(ptr) & ~(page - 1))),
              frame_bytes + page, MADV_WILLNEED);
      // touch one byte per page to force residency
      for (size_t off = 0; off < frame_bytes; off += page) sink ^= ptr[off];
    }
    (void)sink;
  }
}

}  // namespace

extern "C" {

const char* tl_last_error() { return g_error.c_str(); }

void* tl_open(const char* path, int64_t* out_n_frames,
              int64_t* out_floats_per_frame) {
  auto L = new Loader();
  L->fd = open(path, O_RDONLY);
  if (L->fd < 0) {
    set_error(std::string("cannot open ") + path);
    delete L;
    return nullptr;
  }
  struct stat st;
  if (fstat(L->fd, &st) != 0) {
    set_error("fstat failed");
    delete L;
    return nullptr;
  }
  L->map_size = static_cast<size_t>(st.st_size);
  void* m = mmap(nullptr, L->map_size, PROT_READ, MAP_PRIVATE, L->fd, 0);
  if (m == MAP_FAILED) {
    set_error("mmap failed");
    delete L;
    return nullptr;
  }
  L->base = static_cast<const uint8_t*>(m);
  size_t off = parse_npy_header(L->base, L->map_size, L);
  if (off == 0) {
    delete L;
    return nullptr;
  }
  const size_t need =
      off + static_cast<size_t>(L->n_frames) * L->floats_per_frame * 4;
  if (need > L->map_size) {
    set_error("file smaller than header claims");
    delete L;
    return nullptr;
  }
  L->data = reinterpret_cast<const float*>(L->base + off);
  L->worker = std::thread(prefetch_loop, L);
  *out_n_frames = L->n_frames;
  *out_floats_per_frame = L->floats_per_frame;
  return L;
}

void tl_close(void* handle) { delete static_cast<Loader*>(handle); }

// Gather `count` frames (by index) into `out` ([count, floats_per_frame],
// packed, caller-allocated). Multi-threaded for large batches.
int tl_read_batch(void* handle, const int64_t* indices, int64_t count,
                  float* out, int n_threads) {
  auto* L = static_cast<Loader*>(handle);
  const int64_t fpf = L->floats_per_frame;
  for (int64_t i = 0; i < count; i++) {
    if (indices[i] < 0 || indices[i] >= L->n_frames) {
      set_error("frame index out of range");
      return -1;
    }
  }
  auto copy_range = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; i++) {
      std::memcpy(out + i * fpf, L->data + indices[i] * fpf,
                  fpf * sizeof(float));
    }
  };
  if (n_threads <= 1 || count < 1024) {
    copy_range(0, count);
  } else {
    const int t = n_threads;
    std::vector<std::thread> threads;
    threads.reserve(t);
    for (int k = 0; k < t; k++) {
      int64_t lo = count * k / t, hi = count * (k + 1) / t;
      threads.emplace_back(copy_range, lo, hi);
    }
    for (auto& th : threads) th.join();
  }
  return 0;
}

// Contiguous range read (no per-frame gather).
int tl_read_range(void* handle, int64_t start, int64_t count, float* out) {
  auto* L = static_cast<Loader*>(handle);
  if (start < 0 || start + count > L->n_frames) {
    set_error("range out of bounds");
    return -1;
  }
  std::memcpy(out, L->data + start * L->floats_per_frame,
              static_cast<size_t>(count) * L->floats_per_frame * sizeof(float));
  return 0;
}

// Queue asynchronous prefetch of the given frames (returns immediately).
void tl_prefetch(void* handle, const int64_t* indices, int64_t count) {
  auto* L = static_cast<Loader*>(handle);
  {
    std::lock_guard<std::mutex> lock(L->mu);
    L->pending.assign(indices, indices + count);
  }
  L->cv.notify_one();
}

}  // extern "C"
