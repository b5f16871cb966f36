// YIN-style F0 extraction — C++ kernel behind fscl_tpu.dsp.pitch.
//
// Provides the native path for per-utterance pitch extraction during
// preprocessing (the reference depends on pyworld's C++ WORLD for this,
// requirements.txt; SURVEY §2.9 row "Pitch (F0) extraction").  Same contract
// as the numpy fallback in fscl_tpu/dsp/pitch.py: frame-synchronous F0 at
// the mel hop, 0 where unvoiced.
//
// Build: make -C cpp   ->  libfsclpitch.so  (ctypes, no pybind11 needed)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// wav: n samples; out_f0 must hold (1 + n / hop) floats.
// Returns number of frames written.
int64_t yin_f0(const float* wav, int64_t n, int32_t sr, int32_t hop,
               float fmin, float fmax, float threshold, int32_t frame_length,
               float* out_f0) {
  const int tau_min = std::max(2, (int)(sr / fmax));
  const int tau_max = std::min(frame_length - 1, (int)(sr / fmin));
  const int64_t n_frames = 1 + n / hop;
  const int half = frame_length / 2;
  const int win = frame_length;

  // zero-padded signal: [half | wav | half + frame_length]
  std::vector<double> x(n + 2 * half + frame_length, 0.0);
  for (int64_t i = 0; i < n; ++i) x[half + i] = wav[i];

  std::vector<double> d(tau_max + 1), cmnd(tau_max + 1);

  for (int64_t f = 0; f < n_frames; ++f) {
    const double* x0 = x.data() + f * hop;
    // difference function
    d[0] = 0.0;
    for (int tau = 1; tau <= tau_max; ++tau) {
      double acc = 0.0;
      for (int t = 0; t < win; ++t) {
        const double diff = x0[t] - x0[t + tau];
        acc += diff * diff;
      }
      d[tau] = acc;
    }
    // cumulative-mean-normalized difference
    double running = 0.0;
    cmnd[0] = 1.0;
    for (int tau = 1; tau <= tau_max; ++tau) {
      running += d[tau];
      cmnd[tau] = running > 1e-12 ? d[tau] * tau / running : 1.0;
    }
    // threshold pick
    int tau = -1;
    for (int t = tau_min; t <= tau_max; ++t) {
      if (cmnd[t] < threshold) {
        tau = t;
        while (tau + 1 <= tau_max && cmnd[tau + 1] < cmnd[tau]) ++tau;
        break;
      }
    }
    if (tau < 0) {
      // fall back to global minimum if plausibly voiced
      int best = tau_min;
      for (int t = tau_min + 1; t <= tau_max; ++t)
        if (cmnd[t] < cmnd[best]) best = t;
      if (cmnd[best] > 0.7) {
        out_f0[f] = 0.0f;
        continue;
      }
      tau = best;
    }
    // parabolic interpolation
    double tau_refined = tau;
    if (tau > 1 && tau < tau_max) {
      const double a = cmnd[tau - 1], b = cmnd[tau], c = cmnd[tau + 1];
      const double denom = a - 2 * b + c;
      if (std::fabs(denom) > 1e-12) {
        double shift = 0.5 * (a - c) / denom;
        shift = std::max(-1.0, std::min(1.0, shift));
        tau_refined = tau + shift;
      }
    }
    float f0 = (float)(sr / tau_refined);
    if (f0 < fmin || f0 > fmax) f0 = 0.0f;
    out_f0[f] = f0;
  }
  return n_frames;
}

}  // extern "C"
