// fiber_host: native host-side kernels for FIBER-TPU.
//
// TPU-native counterpart of the reference's host/CUDA native code:
//  * CIDEr-D scorer (the SCST reward loop; reference vendors a Python
//    implementation, coarse_grained/fiber/modules/cider/ciderD/) —
//    n-gram TF-IDF cosine with length penalty, here over integer token
//    streams so the Python side only tokenizes once.
//  * greedy NMS (csrc/cpu/nms_cpu.cpp equivalent) for host-side eval
//    post-processing.
//
// Exposed through a plain C ABI for ctypes (no pybind dependency).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kMaxN = 4;

using NGramCounts = std::unordered_map<uint64_t, double>;

// Fowler–Noll–Vo style rolling hash over token ids for n-gram keys.
inline uint64_t hash_ngram(const int32_t* toks, int n) {
  uint64_t h = 1469598103934665603ull ^ static_cast<uint64_t>(n);
  for (int i = 0; i < n; ++i) {
    h ^= static_cast<uint64_t>(static_cast<uint32_t>(toks[i])) + 0x9e3779b9ull;
    h *= 1099511628211ull;
  }
  return h;
}

void count_ngrams(const int32_t* toks, int len, int n, NGramCounts* out) {
  for (int i = 0; i + n <= len; ++i) {
    (*out)[hash_ngram(toks + i, n)] += 1.0;
  }
}

struct CiderState {
  int max_n = kMaxN;
  double sigma = 6.0;
  // per image: reference n-gram counts (one map per n per ref)
  struct Ref {
    NGramCounts counts[kMaxN];
    int length = 0;
  };
  std::vector<std::vector<Ref>> refs;  // [image][ref]
  NGramCounts doc_freq[kMaxN];         // #ref-sets containing the ngram
  double log_num_images = 0.0;
  bool df_ready = false;
};

// TF-IDF vector norm + similarity helpers (CIDEr-D semantics: per-n
// cosine of clipped tf-idf vectors, gaussian length penalty).
struct TfIdf {
  NGramCounts vec[kMaxN];
  double norm[kMaxN] = {0, 0, 0, 0};
  int length = 0;
};

void tfidf_from_counts(const CiderState& st, const NGramCounts* counts,
                       int length, TfIdf* out) {
  out->length = length;
  for (int n = 0; n < st.max_n; ++n) {
    double sq = 0.0;
    for (const auto& kv : counts[n]) {
      auto it = st.doc_freq[n].find(kv.first);
      double df = (it == st.doc_freq[n].end()) ? 0.0 : it->second;
      double idf = st.log_num_images - std::log(std::max(1.0, df));
      double w = kv.second * idf;
      out->vec[n][kv.first] = w;
      sq += w * w;
    }
    out->norm[n] = std::sqrt(sq);
  }
}

double similarity(const CiderState& st, const TfIdf& cand,
                  const TfIdf& ref) {
  double total = 0.0;
  double delta = static_cast<double>(cand.length - ref.length);
  double len_pen =
      std::exp(-(delta * delta) / (2.0 * st.sigma * st.sigma));
  for (int n = 0; n < st.max_n; ++n) {
    double dot = 0.0;
    const NGramCounts& a = cand.vec[n];
    const NGramCounts& b = ref.vec[n];
    const NGramCounts& small = a.size() < b.size() ? a : b;
    const NGramCounts& big = a.size() < b.size() ? b : a;
    for (const auto& kv : small) {
      auto it = big.find(kv.first);
      if (it != big.end()) {
        // CIDEr-D clips candidate counts to reference counts; with
        // tf-idf weights this is min(w_cand, w_ref) * w_ref / ...
        // following the vendored scorer: min(a, b) * b
        double wa = a.count(kv.first) ? a.at(kv.first) : 0.0;
        double wb = b.count(kv.first) ? b.at(kv.first) : 0.0;
        dot += std::min(wa, wb) * wb;
      }
    }
    double denom = cand.norm[n] * ref.norm[n];
    if (denom > 1e-12) total += (dot / denom) * len_pen;
  }
  return total * 10.0 / st.max_n;  // x10 like CIDEr-D
}

}  // namespace

extern "C" {

void* cider_new(int max_n, double sigma) {
  auto* st = new CiderState();
  st->max_n = std::min(max_n, kMaxN);
  st->sigma = sigma;
  return st;
}

void cider_free(void* handle) { delete static_cast<CiderState*>(handle); }

// refs: flattened token stream; ref_offsets has num_refs+1 entries;
// ref_image has num_refs entries mapping each ref to an image index in
// [0, num_images).
void cider_set_refs(void* handle, const int32_t* tokens,
                    const int64_t* ref_offsets, const int32_t* ref_image,
                    int num_refs, int num_images) {
  auto* st = static_cast<CiderState*>(handle);
  st->refs.assign(num_images, {});
  for (int r = 0; r < num_refs; ++r) {
    const int32_t* t = tokens + ref_offsets[r];
    int len = static_cast<int>(ref_offsets[r + 1] - ref_offsets[r]);
    CiderState::Ref ref;
    ref.length = len;
    for (int n = 0; n < st->max_n; ++n)
      count_ngrams(t, len, n + 1, &ref.counts[n]);
    st->refs[ref_image[r]].push_back(std::move(ref));
  }
  // document frequency: an ngram counts once per image whose ref set
  // contains it
  for (int n = 0; n < st->max_n; ++n) st->doc_freq[n].clear();
  for (const auto& image_refs : st->refs) {
    NGramCounts seen[kMaxN];
    for (const auto& ref : image_refs)
      for (int n = 0; n < st->max_n; ++n)
        for (const auto& kv : ref.counts[n]) seen[n][kv.first] = 1.0;
    for (int n = 0; n < st->max_n; ++n)
      for (const auto& kv : seen[n]) st->doc_freq[n][kv.first] += 1.0;
  }
  st->log_num_images = std::log(std::max<size_t>(1, st->refs.size()));
  st->df_ready = true;
}

// Score candidates (one per image index) against their reference sets.
// cand_offsets: num_cands+1; cand_image: num_cands; out: num_cands.
void cider_score(void* handle, const int32_t* tokens,
                 const int64_t* cand_offsets, const int32_t* cand_image,
                 int num_cands, double* out) {
  auto* st = static_cast<CiderState*>(handle);
  for (int c = 0; c < num_cands; ++c) {
    const int32_t* t = tokens + cand_offsets[c];
    int len = static_cast<int>(cand_offsets[c + 1] - cand_offsets[c]);
    NGramCounts counts[kMaxN];
    for (int n = 0; n < st->max_n; ++n)
      count_ngrams(t, len, n + 1, &counts[n]);
    TfIdf cand;
    tfidf_from_counts(*st, counts, len, &cand);

    const auto& image_refs = st->refs[cand_image[c]];
    double score = 0.0;
    for (const auto& ref : image_refs) {
      TfIdf rv;
      tfidf_from_counts(*st, ref.counts, ref.length, &rv);
      score += similarity(*st, cand, rv);
    }
    out[c] = image_refs.empty() ? 0.0 : score / image_refs.size();
  }
}

// Greedy NMS: boxes (n, 4) xyxy row-major, scores (n).  Writes kept
// indices (score-descending) to `keep` and returns the count.
// Legacy +1 box extents and >=-threshold suppression: the exact
// semantics of the reference kernel (csrc/cpu/nms_cpu.cpp:22-61) and of
// the XLA path (fiber_tpu/detection/boxes.py nms / box_iou_legacy).
int nms_host(const float* boxes, const float* scores, int n,
             float iou_threshold, int max_outputs, int32_t* keep) {
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int a, int b) { return scores[a] > scores[b]; });
  std::vector<char> removed(n, 0);
  auto area = [&](int i) {
    float w = std::max(0.f, boxes[i * 4 + 2] - boxes[i * 4 + 0] + 1.f);
    float h = std::max(0.f, boxes[i * 4 + 3] - boxes[i * 4 + 1] + 1.f);
    return w * h;
  };
  int count = 0;
  for (int oi = 0; oi < n && count < max_outputs; ++oi) {
    int i = order[oi];
    if (removed[i]) continue;
    keep[count++] = i;
    for (int oj = oi + 1; oj < n; ++oj) {
      int j = order[oj];
      if (removed[j]) continue;
      float x1 = std::max(boxes[i * 4 + 0], boxes[j * 4 + 0]);
      float y1 = std::max(boxes[i * 4 + 1], boxes[j * 4 + 1]);
      float x2 = std::min(boxes[i * 4 + 2], boxes[j * 4 + 2]);
      float y2 = std::min(boxes[i * 4 + 3], boxes[j * 4 + 3]);
      float inter = std::max(0.f, x2 - x1 + 1.f) *
                    std::max(0.f, y2 - y1 + 1.f);
      float uni = area(i) + area(j) - inter;
      if (uni > 0 && inter / uni >= iou_threshold) removed[j] = 1;
    }
  }
  return count;
}

}  // extern "C"
