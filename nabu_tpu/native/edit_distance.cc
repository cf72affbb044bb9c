// Fast Levenshtein edit distance for error-rate scoring.
//
// Native (C++) replacement for the evaluator hot loop: the reference's
// decoder evaluator scores every dev/test utterance with an edit
// distance per validation pass (nabu/neuralnetworks/evaluators/); at
// WSJ scale that is thousands of O(n*m) DPs per validation, worth
// taking off the Python interpreter. Exposed through ctypes
// (nabu_tpu/native/__init__.py), with the numpy implementation in
// nabu_tpu/decoding/scorer.py as fallback and oracle.
//
// Build: see nabu_tpu/native/build.sh (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

// Edit distance between ref[0:n] and hyp[0:m] (int32 token ids).
int64_t edit_distance_i32(const int32_t* ref, int64_t n, const int32_t* hyp,
                          int64_t m) {
  if (n == 0) return m;
  if (m == 0) return n;
  std::vector<int64_t> prev(m + 1), cur(m + 1);
  for (int64_t j = 0; j <= m; ++j) prev[j] = j;
  for (int64_t i = 1; i <= n; ++i) {
    cur[0] = i;
    const int32_t r = ref[i - 1];
    for (int64_t j = 1; j <= m; ++j) {
      const int64_t sub = prev[j - 1] + (hyp[j - 1] != r);
      const int64_t del = prev[j] + 1;
      const int64_t ins = cur[j - 1] + 1;
      cur[j] = std::min(sub, std::min(del, ins));
    }
    std::swap(prev, cur);
  }
  return prev[m];
}

// Batch variant: sequences are packed back to back; offsets give the
// start of each sequence (offsets[i+1]-offsets[i] = length). Writes
// per-pair distances into out and returns total errors.
int64_t edit_distance_batch_i32(const int32_t* refs,
                                const int64_t* ref_offsets,
                                const int32_t* hyps,
                                const int64_t* hyp_offsets,
                                int64_t num_pairs, int64_t* out) {
  int64_t total = 0;
  for (int64_t i = 0; i < num_pairs; ++i) {
    const int64_t rn = ref_offsets[i + 1] - ref_offsets[i];
    const int64_t hm = hyp_offsets[i + 1] - hyp_offsets[i];
    const int64_t d = edit_distance_i32(refs + ref_offsets[i], rn,
                                        hyps + hyp_offsets[i], hm);
    if (out) out[i] = d;
    total += d;
  }
  return total;
}

}  // extern "C"
