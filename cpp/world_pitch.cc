// WORLD-style (DIO + StoneMask-role refinement) F0 extraction.
//
// The reference's preprocessing extracts F0 with pyworld (C++ WORLD DIO +
// StoneMask; reference requirements.txt:12, used by Parsers/template.py via
// dlhlp_lib wav_to_mel_energy_pitch). This is an independent implementation
// of the same algorithm family, written from the published DIO design:
//
//   1. decimate to a low working rate (all F0 information lives below
//      2*f0_ceil),
//   2. per half-octave band, low-pass with a Nuttall-windowed sinc at the
//      band's boundary frequency, so the band's fundamental becomes a
//      near-sinusoid,
//   3. derive FOUR period estimates per band from the filtered waveform
//      (negative/positive zero-crossing intervals, peak and dip intervals);
//      a frame's band candidate is the mean of the four interpolated
//      estimates and its reliability is their relative standard deviation,
//   4. per frame keep the most reliable in-range candidate; frames with no
//      reliable candidate are unvoiced,
//   5. contour fixing (drop isolated voiced frames, cut >20% jumps),
//   6. refinement (StoneMask's role): normalized autocorrelation around the
//      candidate period on the full-rate signal + parabolic interpolation.
//
// Same contract as yin_f0 in pitch.cc: frame-synchronous F0 at the mel hop,
// 0 where unvoiced.  Build: make -C cpp -> libfsclworld.so (ctypes).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

// Nuttall-windowed sinc low-pass, zero-phase (symmetric) FIR.
std::vector<double> lowpass_kernel(double cutoff_hz, double fs) {
  // half-length: two periods of the cutoff on each side
  const int half = std::max(8, (int)(2.0 * fs / cutoff_hz));
  const int len = 2 * half + 1;
  std::vector<double> h(len);
  const double fc = cutoff_hz / fs;  // normalized
  double sum = 0.0;
  for (int i = 0; i < len; ++i) {
    const int m = i - half;
    const double sinc =
        m == 0 ? 2.0 * fc : std::sin(2.0 * kPi * fc * m) / (kPi * m);
    const double t = (double)i / (len - 1);
    const double w = 0.355768 - 0.487396 * std::cos(2 * kPi * t) +
                     0.144232 * std::cos(4 * kPi * t) -
                     0.012604 * std::cos(6 * kPi * t);  // Nuttall
    h[i] = sinc * w;
    sum += h[i];
  }
  for (double& v : h) v /= sum;  // unit DC gain
  return h;
}

std::vector<double> convolve_same(const std::vector<double>& x,
                                  const std::vector<double>& h) {
  const int64_t n = (int64_t)x.size();
  const int64_t hl = (int64_t)h.size();
  const int64_t half = hl / 2;
  std::vector<double> y(n, 0.0);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t j0 = std::max<int64_t>(0, i - half);
    const int64_t j1 = std::min<int64_t>(n - 1, i + half);
    double acc = 0.0;
    for (int64_t j = j0; j <= j1; ++j) acc += x[j] * h[i - j + half];
    y[i] = acc;
  }
  return y;
}

// Event times (seconds) of one polarity of zero crossings of y.
void zero_crossings(const std::vector<double>& y, double fs, bool negative,
                    std::vector<double>* times) {
  times->clear();
  for (size_t k = 0; k + 1 < y.size(); ++k) {
    const bool cross = negative ? (y[k] > 0.0 && y[k + 1] <= 0.0)
                                : (y[k] < 0.0 && y[k + 1] >= 0.0);
    if (cross) {
      const double denom = y[k] - y[k + 1];
      const double frac = std::fabs(denom) > 1e-18 ? y[k] / denom : 0.5;
      times->push_back((k + frac) / fs);
    }
  }
}

// Interval track: f0 samples (1/interval) located at interval midpoints.
struct Track {
  std::vector<double> t;   // midpoint times
  std::vector<double> f0;  // 1 / interval
};

Track intervals_to_track(const std::vector<double>& ev) {
  Track tr;
  for (size_t i = 0; i + 1 < ev.size(); ++i) {
    const double dt = ev[i + 1] - ev[i];
    if (dt <= 0) continue;
    tr.t.push_back(0.5 * (ev[i] + ev[i + 1]));
    tr.f0.push_back(1.0 / dt);
  }
  return tr;
}

// Linear interpolation of a track at time t (clamped ends); nan if empty.
double track_at(const Track& tr, double t) {
  if (tr.t.size() < 2) return std::nan("");
  if (t <= tr.t.front()) return tr.f0.front();
  if (t >= tr.t.back()) return tr.f0.back();
  const auto it = std::upper_bound(tr.t.begin(), tr.t.end(), t);
  const size_t j = (size_t)(it - tr.t.begin());
  const double t0 = tr.t[j - 1], t1 = tr.t[j];
  const double a = (t - t0) / std::max(1e-12, t1 - t0);
  return tr.f0[j - 1] * (1 - a) + tr.f0[j] * a;
}

}  // namespace

extern "C" {

// DIO-style F0 with autocorrelation refinement.
// wav: n samples at sr; out_f0 must hold (1 + n / hop) floats.
// Returns the number of frames written.
int64_t world_f0(const float* wav, int64_t n, int32_t sr, int32_t hop,
                 float fmin, float fmax, float* out_f0) {
  const int64_t n_frames = 1 + n / hop;
  for (int64_t i = 0; i < n_frames; ++i) out_f0[i] = 0.0f;
  if (n < sr / 16) return n_frames;  // too short for any band

  // --- 1. decimate: keep >= 8*fmax of bandwidth
  int deci = std::max(1, (int)(sr / (8.0 * fmax)));
  const double fs = (double)sr / deci;
  std::vector<double> x;
  if (deci > 1) {
    std::vector<double> xin(n);
    for (int64_t i = 0; i < n; ++i) xin[i] = wav[i];
    auto aa = lowpass_kernel(0.4 * fs, sr);
    auto smooth = convolve_same(xin, aa);
    x.reserve(n / deci + 1);
    for (int64_t i = 0; i < n; i += deci) x.push_back(smooth[i]);
  } else {
    x.assign(wav, wav + n);
  }
  const int64_t nd = (int64_t)x.size();

  // --- 2. half-octave band boundaries
  std::vector<double> bands;
  for (double b = fmin * std::sqrt(2.0); b < fmax * 1.5; b *= std::sqrt(2.0))
    bands.push_back(b);

  const double frame_dt = (double)hop / sr;
  std::vector<double> best_f0(n_frames, 0.0), best_score(n_frames, 1e30);

  std::vector<double> ev;
  for (double boundary : bands) {
    auto h = lowpass_kernel(boundary, fs);
    if ((int64_t)h.size() >= nd) continue;
    auto y = convolve_same(x, h);
    // derivative signal for peaks/dips
    std::vector<double> dy(nd, 0.0);
    for (int64_t i = 0; i + 1 < nd; ++i) dy[i] = y[i + 1] - y[i];

    Track tracks[4];
    zero_crossings(y, fs, true, &ev);
    tracks[0] = intervals_to_track(ev);
    zero_crossings(y, fs, false, &ev);
    tracks[1] = intervals_to_track(ev);
    zero_crossings(dy, fs, true, &ev);   // peaks
    tracks[2] = intervals_to_track(ev);
    zero_crossings(dy, fs, false, &ev);  // dips
    tracks[3] = intervals_to_track(ev);

    for (int64_t f = 0; f < n_frames; ++f) {
      const double t = f * frame_dt;
      double est[4], mean = 0.0;
      bool ok = true;
      for (int k = 0; k < 4; ++k) {
        est[k] = track_at(tracks[k], t);
        if (!std::isfinite(est[k])) { ok = false; break; }
        mean += est[k];
      }
      if (!ok) continue;
      mean *= 0.25;
      // the band is meaningful only if its fundamental passed the filter:
      // candidate must sit in (boundary/2, boundary] up to tolerance
      if (mean < boundary * 0.45 || mean > boundary * 1.1) continue;
      if (mean < fmin || mean > fmax) continue;
      double var = 0.0;
      for (int k = 0; k < 4; ++k) var += (est[k] - mean) * (est[k] - mean);
      const double score = std::sqrt(var / 3.0) / mean;  // relative std
      if (score < best_score[f]) {
        best_score[f] = score;
        best_f0[f] = mean;
      }
    }
  }

  // --- 4. voicing decision
  const double kVoicedScore = 0.12;
  for (int64_t f = 0; f < n_frames; ++f)
    if (best_score[f] > kVoicedScore) best_f0[f] = 0.0;

  // --- 5. contour fixing: drop isolated voiced frames and >20% jumps
  std::vector<double> fixed(best_f0);
  for (int64_t f = 0; f < n_frames; ++f) {
    if (fixed[f] <= 0) continue;
    const double prev = f > 0 ? fixed[f - 1] : 0.0;
    const double next = f + 1 < n_frames ? best_f0[f + 1] : 0.0;
    if (prev <= 0 && next <= 0) fixed[f] = 0.0;  // isolated
  }
  for (int64_t f = 1; f < n_frames; ++f) {
    if (fixed[f] <= 0 || fixed[f - 1] <= 0) continue;
    const double rel = std::fabs(fixed[f] - fixed[f - 1]) / fixed[f - 1];
    if (rel > 0.2) {
      // keep whichever side agrees with its own next neighbour
      const double next = f + 1 < n_frames ? fixed[f + 1] : 0.0;
      if (!(next > 0 && std::fabs(fixed[f] - next) / fixed[f] < 0.2))
        fixed[f] = 0.0;
    }
  }

  // --- 6. refinement on the full-rate signal (StoneMask's role):
  // normalized autocorrelation around the candidate period.
  for (int64_t f = 0; f < n_frames; ++f) {
    const double f0c = fixed[f];
    if (f0c <= 0) continue;
    const double period = sr / f0c;
    const int tau_c = (int)std::lround(period);
    const int tau_lo = std::max(2, (int)(period * 0.85));
    const int tau_hi = std::min((int)(period * 1.15) + 1, (int)(sr / fmin));
    const int win = std::min<int64_t>((int)(3 * period), n);
    int64_t start = f * hop - win / 2;
    start = std::max<int64_t>(0, std::min(start, n - win - tau_hi - 1));
    if (start < 0 || win < 16) { out_f0[f] = (float)f0c; continue; }

    double best_r = -2.0;
    int best_tau = tau_c;
    std::vector<double> r(tau_hi + 2, -2.0);
    for (int tau = tau_lo; tau <= tau_hi; ++tau) {
      double num = 0.0, e0 = 0.0, e1 = 0.0;
      const float* a = wav + start;
      const float* b = wav + start + tau;
      for (int t = 0; t < win; ++t) {
        num += (double)a[t] * b[t];
        e0 += (double)a[t] * a[t];
        e1 += (double)b[t] * b[t];
      }
      const double denom = std::sqrt(e0 * e1) + 1e-12;
      r[tau] = num / denom;
      if (r[tau] > best_r) { best_r = r[tau]; best_tau = tau; }
    }
    double tau_ref = best_tau;
    if (best_tau > tau_lo && best_tau < tau_hi) {
      const double a = r[best_tau - 1], b = r[best_tau], c = r[best_tau + 1];
      const double denom = a - 2 * b + c;
      if (std::fabs(denom) > 1e-12) {
        double shift = 0.5 * (a - c) / denom;
        tau_ref = best_tau + std::max(-1.0, std::min(1.0, shift));
      }
    }
    double f0r = sr / tau_ref;
    if (best_r < 0.3 || f0r < fmin || f0r > fmax) f0r = 0.0;  // voicing re-check
    out_f0[f] = (float)f0r;
  }
  return n_frames;
}

}  // extern "C"
