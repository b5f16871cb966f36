// Packed-shard batch reader (fscl_tpu/data/shards.py format): one call
// assembles a whole padded training batch from ONE shard file — a single
// open + B*5 pread-style reads instead of 5*B per-sample file opens
// (npy_batch.cc) or B python np.load loops. Outputs are zero-initialised
// by the caller; payload arrays are raw little-endian C-order
// (int32 phonemes/durations, float32 mel/pitch/energy).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

// Read `count` elements of `elem_size` at `off` into dst; false on short
// read or out-of-range offset.
bool read_at(FILE* f, int64_t off, void* dst, int64_t count,
             int64_t elem_size) {
  if (off < 0 || count < 0) return false;
#if defined(_WIN32)
  if (fseek(f, (long)off, SEEK_SET) != 0) return false;
#else
  if (fseeko(f, (off_t)off, SEEK_SET) != 0) return false;
#endif
  return fread(dst, (size_t)elem_size, (size_t)count, f) == (size_t)count;
}

}  // namespace

extern "C" {

// offs/rows: B x 5 arrays in feature order
// (phonemes, mel, pitch, energy, duration); offs are payload-relative,
// data_offset is the payload start within the file. mel rows are (T_i, 80).
// Returns 0 on success, else 1 + batch index of the failing record.
int64_t shard_pad_batch(const char* path, int64_t data_offset, int64_t B,
                        const int64_t* offs, const int64_t* rows,
                        int64_t L, int64_t T, int64_t pitch_len,
                        int64_t energy_len, int64_t n_mels,
                        int32_t* texts, float* mel, float* pitch,
                        float* energy, int32_t* dur) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  // per-feature output row strides and element sizes
  for (int64_t b = 0; b < B; ++b) {
    const int64_t* o = offs + b * 5;
    const int64_t* r = rows + b * 5;
    int64_t n;
    // phonemes -> texts[b, :min(r0, L)]
    n = r[0] < L ? r[0] : L;
    if (!read_at(f, data_offset + o[0], texts + b * L, n, 4)) {
      fclose(f);
      return b + 1;
    }
    // mel -> mel[b, :min(r1, T), :n_mels]
    n = r[1] < T ? r[1] : T;
    if (!read_at(f, data_offset + o[1], mel + b * T * n_mels, n * n_mels,
                 4)) {
      fclose(f);
      return b + 1;
    }
    // pitch -> pitch[b, :min(r2, pitch_len)]
    n = r[2] < pitch_len ? r[2] : pitch_len;
    if (!read_at(f, data_offset + o[2], pitch + b * pitch_len, n, 4)) {
      fclose(f);
      return b + 1;
    }
    // energy -> energy[b, :min(r3, energy_len)]
    n = r[3] < energy_len ? r[3] : energy_len;
    if (!read_at(f, data_offset + o[3], energy + b * energy_len, n, 4)) {
      fclose(f);
      return b + 1;
    }
    // duration -> dur[b, :min(r4, L)]
    n = r[4] < L ? r[4] : L;
    if (!read_at(f, data_offset + o[4], dur + b * L, n, 4)) {
      fclose(f);
      return b + 1;
    }
  }
  fclose(f);
  return 0;
}

}  // extern "C"

extern "C" {

// Generic padded 1-D batch read: B arrays of 4-byte elements at
// payload-relative offs with rows[i] elements each, into out[B, maxlen]
// (zero-initialised by the caller). Returns 0 or 1 + failing index.
int64_t shard_pad_rows(const char* path, int64_t data_offset, int64_t B,
                       const int64_t* offs, const int64_t* rows,
                       int64_t maxlen, void* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  char* dst = reinterpret_cast<char*>(out);
  for (int64_t b = 0; b < B; ++b) {
    int64_t n = rows[b] < maxlen ? rows[b] : maxlen;
    if (!read_at(f, data_offset + offs[b], dst + b * maxlen * 4, n, 4)) {
      fclose(f);
      return b + 1;
    }
  }
  fclose(f);
  return 0;
}

}  // extern "C"
