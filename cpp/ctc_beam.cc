// Lexicon-free CTC beam-search decoder.
//
// TPU-native-framework replacement for the reference's native decoder:
// torchaudio.models.decoder.ctc_decoder (Flashlight C++), built at
// lightning/build.py:48-59 with lexicon=None (lexicon-free) — used by the
// PR systems' decoding path. Standard prefix beam search over framewise
// log-probabilities with a blank token; no LM (the reference passes none).
//
// Build: make -C cpp  ->  libfsclctc.so  (ctypes)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <map>
#include <utility>
#include <vector>

namespace {

constexpr double kNegInf = -std::numeric_limits<double>::infinity();

inline double logsumexp(double a, double b) {
  if (a == kNegInf) return b;
  if (b == kNegInf) return a;
  const double m = std::max(a, b);
  return m + std::log(std::exp(a - m) + std::exp(b - m));
}

struct Beam {
  std::vector<int32_t> prefix;
  double p_blank;     // prob of prefix ending in blank
  double p_non_blank; // prob of prefix ending in non-blank
  double total() const { return logsumexp(p_blank, p_non_blank); }
};

}  // namespace

extern "C" {

// logprobs: (T, C) row-major; blank id; beam width; token_min_logp prune.
// out_tokens: caller-allocated (max_out) int32; returns token count.
// out_score: final log-prob of the best hypothesis.
int64_t ctc_beam_decode(const float* logprobs, int64_t T, int64_t C,
                        int32_t blank, int32_t beam_width,
                        float token_min_logp, int32_t* out_tokens,
                        int64_t max_out, double* out_score) {
  std::vector<Beam> beams{{{}, 0.0, kNegInf}};

  for (int64_t t = 0; t < T; ++t) {
    const float* row = logprobs + t * C;
    // map from prefix -> (p_blank, p_non_blank)
    std::map<std::vector<int32_t>, std::pair<double, double>> next;

    for (const Beam& b : beams) {
      const double p_total = b.total();
      // extend with blank
      {
        auto& e = next.try_emplace(b.prefix,
                                   std::make_pair(kNegInf, kNegInf))
                      .first->second;
        e.first = logsumexp(e.first, p_total + row[blank]);
      }
      for (int32_t c = 0; c < C; ++c) {
        if (c == blank || row[c] < token_min_logp) continue;
        const double p_c = row[c];
        if (!b.prefix.empty() && b.prefix.back() == c) {
          // same symbol: extends non-blank only from blank-ending mass;
          // repeated symbol collapses into the same prefix otherwise
          auto& same = next.try_emplace(b.prefix,
                                        std::make_pair(kNegInf, kNegInf))
                           .first->second;
          same.second = logsumexp(same.second, b.p_non_blank + p_c);

          std::vector<int32_t> ext = b.prefix;
          ext.push_back(c);
          auto& e = next.try_emplace(std::move(ext),
                                     std::make_pair(kNegInf, kNegInf))
                        .first->second;
          e.second = logsumexp(e.second, b.p_blank + p_c);
        } else {
          std::vector<int32_t> ext = b.prefix;
          ext.push_back(c);
          auto& e = next.try_emplace(std::move(ext),
                                     std::make_pair(kNegInf, kNegInf))
                        .first->second;
          e.second = logsumexp(e.second, p_total + p_c);
        }
      }
    }

    // prune to beam width
    std::vector<Beam> pruned;
    pruned.reserve(next.size());
    for (auto& kv : next)
      pruned.push_back({kv.first, kv.second.first, kv.second.second});
    std::sort(pruned.begin(), pruned.end(),
              [](const Beam& a, const Beam& b) { return a.total() > b.total(); });
    if ((int64_t)pruned.size() > beam_width) pruned.resize(beam_width);
    beams = std::move(pruned);
  }

  const Beam& best = beams.front();
  *out_score = best.total();
  const int64_t n = std::min<int64_t>(best.prefix.size(), max_out);
  for (int64_t i = 0; i < n; ++i) out_tokens[i] = best.prefix[i];
  return n;
}

}  // extern "C"
