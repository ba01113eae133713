// Native greedy detection-matching kernel for the mAP pipeline.
//
// Replaces the Python per-prediction loop in
// multigriddet_tpu/evaluation/metrics.py::_match_all_thresholds — the
// semantics are IDENTICAL (stable score-descending order, first-max-wins
// argmax over untaken gts per threshold, taken-mask tracked per
// threshold; the counterpart of the reference's
// match_predictions_to_gt, reference evaluation/metrics.py:73-218).
// At COCO scale (5k images x 80 classes x 10 thresholds) the Python
// loop spends ~10 s in tiny-ndarray overhead; this kernel does the same
// integer work in microseconds per (class, image) cell.
//
// Built into libmgdfastloader.so (see native/Makefile); bound via
// ctypes in multigriddet_tpu/evaluation/metrics.py with a pure-NumPy
// fallback when the library is absent.

#include <algorithm>
#include <cstdint>
#include <numeric>
#include <vector>

extern "C" {

// scores: [n] f32; ious: [n, m] f32 row-major; thresholds: [t] f64;
// tp_out: [t, n] u8 row-major (written 0/1).
void mgd_match_all_thresholds(const float* scores, int n,
                              const float* ious, int m,
                              const double* thresholds, int t,
                              uint8_t* tp_out) {
  for (int k = 0; k < t * n; ++k) tp_out[k] = 0;
  if (n == 0 || m == 0 || t == 0) return;

  // np.argsort(-scores, kind='stable'): descending, ties in index order
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return scores[a] > scores[b]; });

  std::vector<uint8_t> taken(static_cast<size_t>(t) * m, 0);
  for (int oi = 0; oi < n; ++oi) {
    const int i = order[oi];
    const float* row = ious + static_cast<size_t>(i) * m;
    for (int ti = 0; ti < t; ++ti) {
      uint8_t* tk = taken.data() + static_cast<size_t>(ti) * m;
      // first-max-wins argmax of (taken ? -1 : iou), like np.argmax
      double best = -2.0;
      int bj = -1;
      for (int j = 0; j < m; ++j) {
        const double v = tk[j] ? -1.0 : static_cast<double>(row[j]);
        if (v > best) {
          best = v;
          bj = j;
        }
      }
      if (bj >= 0 && best >= thresholds[ti]) {
        tp_out[static_cast<size_t>(ti) * n + i] = 1;
        tk[bj] = 1;
      }
    }
  }
}

}  // extern "C"
