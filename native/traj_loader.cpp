// traj_loader — native trajectory reader for molann_tpu.
//
// The fused TPU kernels consume packed float32 frame batches at >10 GB/s;
// a Python mmap + fancy-index pipeline cannot feed that. This library
// memory-maps trajectory files and provides:
//
//   - zero-copy open (mmap, no read until touched)
//   - multi-threaded batch gather into a caller-provided packed buffer
//   - asynchronous prefetch (madvise WILLNEED + page touching) so the
//     next batch's pages are resident before the gather
//
// Formats (auto-detected by magic):
//   - .npy  — shape [n_frames, n_atoms, 3] or packed [n_frames, 3n],
//             dtype <f4, C-order (numpy format spec v1/2/3)
//   - .dcd  — CHARMM/NAMD/X-PLOR binary trajectories (little-endian,
//             32-bit Fortran record markers; fixed-atom files rejected).
//             Frames are stored as X/Y/Z component planes; the gather
//             interleaves them into the packed [3n] atom-major layout the
//             rest of the framework uses.
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

enum class Format { NPY, DCD };

struct Loader {
  int fd = -1;
  const uint8_t* base = nullptr;   // mmap base
  size_t map_size = 0;
  Format format = Format::NPY;
  // NPY: contiguous float payload
  const float* data = nullptr;     // first element of the array payload
  // DCD: per-frame record geometry
  int64_t natoms = 0;
  size_t frame0_off = 0;
  size_t frame_stride = 0;
  size_t cell_bytes = 0;           // 0 or 48+8 (unit-cell record + markers)
  // common
  int64_t n_frames = 0;
  int64_t floats_per_frame = 0;    // 3 * n_atoms
  // prefetch worker
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv;
  std::vector<int64_t> pending;    // frame indices to prefetch
  bool stop = false;

  // byte span of one frame's payload (for prefetch)
  const uint8_t* frame_ptr(int64_t f) const {
    if (format == Format::NPY) {
      return reinterpret_cast<const uint8_t*>(data) +
             static_cast<size_t>(f) * floats_per_frame * sizeof(float);
    }
    return base + frame0_off + static_cast<size_t>(f) * frame_stride;
  }
  size_t frame_bytes() const {
    if (format == Format::NPY) return floats_per_frame * sizeof(float);
    return frame_stride;
  }

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

uint32_t rd_u32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

int32_t rd_i32(const uint8_t* p) {
  int32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

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
    if (size < 12) {  // v2/v3 carry a 4-byte header length
      set_error("truncated .npy v2/v3 header");
      return 0;
    }
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

// CHARMM/NAMD/X-PLOR DCD header. Layout (little-endian, 32-bit Fortran
// record markers [len][payload][len]):
//   record 1 (84 bytes): "CORD" + icntrl[20]
//     icntrl[0]=NSET (frames), icntrl[8]=NAMNF (fixed atoms),
//     icntrl[10]=unit-cell flag (CHARMM), icntrl[11]=4D flag (CHARMM),
//     icntrl[19]=CHARMM version (0 => X-PLOR)
//   record 2: NTITLE + 80*NTITLE chars
//   record 3: NATOM (one int32)
//   per frame: [unit cell: 6 doubles, CHARMM w/ flag only] + X, Y, Z
//     planes (NATOM floats each).
bool parse_dcd_header(const uint8_t* p, size_t size, Loader* L) {
  if (size < 116) {
    set_error("file too small for a DCD header");
    return false;
  }
  uint32_t m0 = rd_u32(p);
  if (m0 != 84) {
    if (m0 == 0x54000000u) {  // 84 byte-swapped
      set_error("big-endian DCD files are not supported");
    } else {
      set_error("not a DCD file (bad first record marker)");
    }
    return false;
  }
  if (std::memcmp(p + 4, "CORD", 4) != 0) {
    set_error("not a coordinate DCD (missing CORD magic)");
    return false;
  }
  const uint8_t* icntrl = p + 8;
  int32_t nset = rd_i32(icntrl + 0 * 4);
  int32_t namnf = rd_i32(icntrl + 8 * 4);
  int32_t cell_flag = rd_i32(icntrl + 10 * 4);
  int32_t four_d = rd_i32(icntrl + 11 * 4);
  int32_t charmm_version = rd_i32(icntrl + 19 * 4);
  if (rd_u32(p + 4 + 84) != 84) {
    set_error("corrupt DCD header (trailing marker mismatch)");
    return false;
  }
  if (namnf != 0) {
    set_error("DCD files with fixed atoms (NAMNF != 0) are not supported");
    return false;
  }
  if (charmm_version != 0 && four_d != 0) {
    set_error("4-dimensional CHARMM DCD files are not supported");
    return false;
  }
  size_t off = 4 + 84 + 4;

  // title record
  if (off + 8 > size) {
    set_error("truncated DCD title record");
    return false;
  }
  uint32_t tlen = rd_u32(p + off);
  if (off + 8 + tlen > size || rd_u32(p + off + 4 + tlen) != tlen) {
    set_error("corrupt DCD title record");
    return false;
  }
  off += 8 + tlen;

  // natoms record
  if (off + 12 > size || rd_u32(p + off) != 4 ||
      rd_u32(p + off + 8) != 4) {
    set_error("corrupt DCD NATOM record");
    return false;
  }
  int32_t natoms = rd_i32(p + off + 4);
  if (natoms <= 0) {
    set_error("DCD NATOM must be positive");
    return false;
  }
  off += 12;

  L->format = Format::DCD;
  L->natoms = natoms;
  L->floats_per_frame = 3 * static_cast<int64_t>(natoms);
  L->cell_bytes =
      (charmm_version != 0 && cell_flag != 0) ? (8 + 6 * sizeof(double)) : 0;
  const size_t plane = 8 + static_cast<size_t>(natoms) * sizeof(float);
  L->frame_stride = L->cell_bytes + 3 * plane;
  L->frame0_off = off;

  const int64_t avail =
      static_cast<int64_t>((size - off) / L->frame_stride);
  L->n_frames = (nset > 0 && nset < avail) ? nset : avail;
  if (L->n_frames <= 0) {
    set_error("DCD contains no complete frames");
    return false;
  }
  // validate the first frame's record markers
  const uint8_t* f0 = p + off + L->cell_bytes;
  for (int c = 0; c < 3; c++) {
    const uint8_t* rec = f0 + c * plane;
    if (rd_u32(rec) != static_cast<uint32_t>(natoms) * 4 ||
        rd_u32(rec + 4 + natoms * 4) != static_cast<uint32_t>(natoms) * 4) {
      set_error("corrupt DCD coordinate record markers");
      return false;
    }
  }
  return true;
}

// Interleave one DCD frame's X/Y/Z planes into packed atom-major [3n].
void gather_dcd_frame(const Loader* L, int64_t f, float* out) {
  const uint8_t* base = L->frame_ptr(f) + L->cell_bytes;
  const size_t plane = 8 + static_cast<size_t>(L->natoms) * sizeof(float);
  const float* X = reinterpret_cast<const float*>(base + 4);
  const float* Y = reinterpret_cast<const float*>(base + plane + 4);
  const float* Z = reinterpret_cast<const float*>(base + 2 * plane + 4);
  for (int64_t a = 0; a < L->natoms; a++) {
    out[3 * a + 0] = X[a];
    out[3 * a + 1] = Y[a];
    out[3 * a + 2] = Z[a];
  }
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
    const size_t frame_bytes = L->frame_bytes();
    volatile uint8_t sink = 0;
    for (int64_t f : batch) {
      if (f < 0 || f >= L->n_frames) continue;  // never touch out-of-range
      const uint8_t* ptr = L->frame_ptr(f);
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

  if (L->map_size >= 8 && std::memcmp(L->base + 4, "CORD", 4) == 0) {
    if (!parse_dcd_header(L->base, L->map_size, L)) {
      delete L;
      return nullptr;
    }
  } else {
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
  }
  L->worker = std::thread(prefetch_loop, L);
  *out_n_frames = L->n_frames;
  *out_floats_per_frame = L->floats_per_frame;
  return L;
}

void tl_close(void* handle) { delete static_cast<Loader*>(handle); }

// Gather `count` frames (by index) into `out` ([count, floats_per_frame],
// packed atom-major, caller-allocated). Multi-threaded for large batches.
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
    if (L->format == Format::NPY) {
      for (int64_t i = lo; i < hi; i++) {
        std::memcpy(out + i * fpf, L->data + indices[i] * fpf,
                    fpf * sizeof(float));
      }
    } else {
      for (int64_t i = lo; i < hi; i++) {
        gather_dcd_frame(L, indices[i], out + i * fpf);
      }
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
  if (start < 0 || count < 0 || start + count > L->n_frames) {
    set_error("range out of bounds");
    return -1;
  }
  if (L->format == Format::NPY) {
    std::memcpy(out, L->data + start * L->floats_per_frame,
                static_cast<size_t>(count) * L->floats_per_frame *
                    sizeof(float));
  } else {
    for (int64_t i = 0; i < count; i++) {
      gather_dcd_frame(L, start + i, out + i * L->floats_per_frame);
    }
  }
  return 0;
}

// Queue asynchronous prefetch of the given frames (returns immediately).
// Out-of-range indices are dropped (the worker re-checks too — a stale
// prefetch must never fault).
void tl_prefetch(void* handle, const int64_t* indices, int64_t count) {
  auto* L = static_cast<Loader*>(handle);
  {
    std::lock_guard<std::mutex> lock(L->mu);
    L->pending.clear();
    L->pending.reserve(count);
    for (int64_t i = 0; i < count; i++) {
      if (indices[i] >= 0 && indices[i] < L->n_frames) {
        L->pending.push_back(indices[i]);
      }
    }
  }
  L->cv.notify_one();
}

}  // extern "C"
