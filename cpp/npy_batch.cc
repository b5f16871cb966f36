// Native batch loader: read a batch's .npy feature files and write them
// into padded, bucketed arrays in one call — the data-loader hot path that
// the reference leaves to per-sample torch DataLoader workers
// (lightning/datasets/language/FastSpeech2Dataset.py reads one np.load per
// feature per sample). One ctypes call per (batch, feature) replaces
// B python np.load's + the pad loop, and releases the GIL while it reads.
//
// Supported dtypes: <f4, <f8, <i4, <i8 (C-order, npy format 1.0/2.0).
// All outputs are zero-initialised by the caller.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct NpyInfo {
  char dtype;      // 'f' or 'i'
  int itemsize;    // 4 or 8
  int64_t shape[2];
  int ndim;
  long data_offset;
};

// Parse the npy header of an open file. Returns false on malformed input.
bool parse_header(FILE* f, NpyInfo* info) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return false;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  int major = magic[6];
  uint32_t hlen = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) return false;
    hlen = b[0] | (b[1] << 8);
    info->data_offset = 10 + hlen;
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) return false;
    hlen = b[0] | (b[1] << 8) | (b[2] << 16) | ((uint32_t)b[3] << 24);
    info->data_offset = 12 + hlen;
  }
  std::string header(hlen, '\0');
  if (fread(&header[0], 1, hlen, f) != hlen) return false;

  size_t dpos = header.find("'descr'");
  if (dpos == std::string::npos) return false;
  size_t q1 = header.find('\'', dpos + 7);
  size_t q2 = header.find('\'', q1 + 1);
  std::string descr = header.substr(q1 + 1, q2 - q1 - 1);
  if (descr.size() < 3 || (descr[0] != '<' && descr[0] != '|')) return false;
  info->dtype = descr[1];
  info->itemsize = descr[2] - '0';
  if (info->dtype != 'f' && info->dtype != 'i') return false;
  if (info->itemsize != 4 && info->itemsize != 8) return false;
  bool fortran =
      header.find("'fortran_order': True") != std::string::npos;
  if (!fortran &&
      header.find("'fortran_order': False") == std::string::npos)
    return false;

  size_t spos = header.find("'shape'");
  if (spos == std::string::npos) return false;
  size_t p1 = header.find('(', spos);
  size_t p2 = header.find(')', p1);
  std::string shape = header.substr(p1 + 1, p2 - p1 - 1);
  info->ndim = 0;
  info->shape[0] = info->shape[1] = 1;
  const char* s = shape.c_str();
  char* end = nullptr;
  while (*s) {
    long v = strtol(s, &end, 10);
    if (end == s) break;
    // reject corrupt headers: negative/absurd dims would flow into vector
    // resizes and fread size math; >2-D arrays are unsupported (a silent
    // first-two-dims read would misinterpret the payload)
    if (v < 0 || v > (1L << 31) || info->ndim >= 2) return false;
    info->shape[info->ndim++] = v;
    s = end;
    while (*s == ',' || *s == ' ') ++s;
  }
  if (info->ndim == 0) return false;
  // a 2-D fortran-order payload is bit-identical to the C-order payload of
  // the reversed shape (np.save writes fortran_order=True for transposed
  // views, e.g. the reference's (n_mels, T) mel arrays)
  if (fortran && info->ndim == 2) {
    int64_t tmp = info->shape[0];
    info->shape[0] = info->shape[1];
    info->shape[1] = tmp;
  }
  return true;
}

// Read the payload as float64-agnostic doubles into dst (row-major),
// converting from the stored dtype. n = number of elements to read.
bool read_as_double(FILE* f, const NpyInfo& info, int64_t n,
                    std::vector<double>* dst) {
  // cap the element count (2 GB of doubles) so a corrupt-but-parsable
  // header cannot drive a runaway allocation; real features are ~100k max
  if (n < 0 || n > ((int64_t)1 << 28)) return false;
  dst->resize(n);
  std::vector<unsigned char> raw(n * info.itemsize);
  if (fread(raw.data(), info.itemsize, n, f) != (size_t)n) return false;
  if (info.dtype == 'f' && info.itemsize == 4) {
    const float* p = reinterpret_cast<const float*>(raw.data());
    for (int64_t i = 0; i < n; ++i) (*dst)[i] = p[i];
  } else if (info.dtype == 'f') {
    memcpy(dst->data(), raw.data(), n * 8);
  } else if (info.itemsize == 4) {
    const int32_t* p = reinterpret_cast<const int32_t*>(raw.data());
    for (int64_t i = 0; i < n; ++i) (*dst)[i] = p[i];
  } else {
    const int64_t* p = reinterpret_cast<const int64_t*>(raw.data());
    for (int64_t i = 0; i < n; ++i) (*dst)[i] = p[i];
  }
  return true;
}

struct FileTask {
  const char* path;
  int64_t row;     // batch index
};

}  // namespace

extern "C" {

// Read B 1-D npy files, apply y = (x - shift) * scale, zero-pad each to L,
// write float32 out[B, L] and int32 lens[B]. Returns 0 on success, else
// 1 + index of the failing file.
int64_t npy_pad_1d_f32(const char** paths, int64_t B, int64_t L,
                       double shift, double scale,
                       float* out, int32_t* lens) {
  int64_t status = 0;
  for (int64_t b = 0; b < B; ++b) {
    FILE* f = fopen(paths[b], "rb");
    NpyInfo info;
    if (!f) return b + 1;
    if (!parse_header(f, &info) || info.ndim != 1) { fclose(f); return b + 1; }
    int64_t n = info.shape[0] < L ? info.shape[0] : L;
    std::vector<double> buf;
    if (!read_as_double(f, info, n, &buf)) { fclose(f); return b + 1; }
    fclose(f);
    lens[b] = (int32_t)n;
    float* row = out + b * L;
    for (int64_t i = 0; i < n; ++i)
      row[i] = (float)((buf[i] - shift) * scale);
  }
  return status;
}

// Same for int32 output (durations, phoneme ids), with an additive offset.
int64_t npy_pad_1d_i32(const char** paths, int64_t B, int64_t L,
                       int32_t offset, int32_t* out, int32_t* lens) {
  for (int64_t b = 0; b < B; ++b) {
    FILE* f = fopen(paths[b], "rb");
    NpyInfo info;
    if (!f) return b + 1;
    if (!parse_header(f, &info) || info.ndim != 1) { fclose(f); return b + 1; }
    int64_t n = info.shape[0] < L ? info.shape[0] : L;
    std::vector<double> buf;
    if (!read_as_double(f, info, n, &buf)) { fclose(f); return b + 1; }
    fclose(f);
    lens[b] = (int32_t)n;
    int32_t* row = out + b * L;
    for (int64_t i = 0; i < n; ++i) row[i] = (int32_t)buf[i] + offset;
  }
  return 0;
}

// Read B 2-D npy files (T_i, D) — or (D, T_i) stored transposed like the
// reference's mel (template.py wav_to_mel_energy_pitch) when the first dim
// equals `maybe_transposed_dim` — truncate rows to trunc[b] (<=0: no
// truncation), zero-pad to T rows, write float32 out[B, T, D].
// Parallelised over files with a small thread pool (GIL is released by the
// ctypes caller, so reads overlap python work).
int64_t npy_pad_2d_f32(const char** paths, int64_t B, int64_t T, int64_t D,
                       int64_t maybe_transposed_dim, const int32_t* trunc,
                       float* out, int32_t* lens) {
  std::vector<int64_t> errs(B, 0);
  int n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;
  if (n_threads > 8) n_threads = 8;
  if ((int64_t)n_threads > B) n_threads = (int)B;

  auto work = [&](int tid) {
    for (int64_t b = tid; b < B; b += n_threads) {
      FILE* f = fopen(paths[b], "rb");
      NpyInfo info;
      if (!f) { errs[b] = 1; continue; }
      if (!parse_header(f, &info) || info.ndim != 2) {
        fclose(f); errs[b] = 1; continue;
      }
      bool transposed = (info.shape[1] != D && info.shape[0] == D &&
                         maybe_transposed_dim == info.shape[0]);
      int64_t rows = transposed ? info.shape[1] : info.shape[0];
      int64_t cols = transposed ? info.shape[0] : info.shape[1];
      if (cols != D) { fclose(f); errs[b] = 1; continue; }
      int64_t lim = (trunc && trunc[b] > 0 && trunc[b] < rows) ? trunc[b] : rows;
      if (lim > T) lim = T;
      std::vector<double> buf;
      // must read the whole stored array when transposed
      int64_t n_read = transposed ? info.shape[0] * info.shape[1] : lim * D;
      if (!read_as_double(f, info, n_read, &buf)) {
        fclose(f); errs[b] = 1; continue;
      }
      fclose(f);
      lens[b] = (int32_t)lim;
      float* dst = out + b * T * D;
      if (!transposed) {
        for (int64_t i = 0; i < lim * D; ++i) dst[i] = (float)buf[i];
      } else {
        for (int64_t t = 0; t < lim; ++t)
          for (int64_t d = 0; d < D; ++d)
            dst[t * D + d] = (float)buf[d * rows + t];
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 1; t < n_threads; ++t) pool.emplace_back(work, t);
  work(0);
  for (auto& th : pool) th.join();
  for (int64_t b = 0; b < B; ++b)
    if (errs[b]) return b + 1;
  return 0;
}

// Sum of a 1-D int npy file (duration totals) without exposing the array.
int64_t npy_sum_1d(const char* path) {
  FILE* f = fopen(path, "rb");
  NpyInfo info;
  if (!f) return -1;
  if (!parse_header(f, &info) || info.ndim != 1) { fclose(f); return -1; }
  std::vector<double> buf;
  if (!read_as_double(f, info, info.shape[0], &buf)) { fclose(f); return -1; }
  fclose(f);
  double s = 0;
  for (double v : buf) s += v;
  return (int64_t)s;
}

}  // extern "C"
