// Host-side RLE codec hot paths (TPU-native replacement for the
// pycocotools C extension the reference depends on).
//
// Column-major (Fortran) run-length encoding over binary masks.  Called from
// Python through ctypes (llmseg_tpu/native/loader.py); the numpy fallback in
// ops/rle.py is the behavioural reference.
//
// Build: make -C llmseg_tpu/native   (produces librle.so)

#include <cstdint>
#include <cstring>

extern "C" {

// mask: (h, w) uint8, C-order.  counts_out must hold >= h*w + 1 entries.
// Returns the number of runs written (first run counts zeros).
int64_t rle_mask_to_counts(const uint8_t* mask, int64_t h, int64_t w,
                           int64_t* counts_out) {
  int64_t n = 0;
  int64_t run = 0;
  uint8_t cur = 0;  // first run counts zeros
  for (int64_t x = 0; x < w; ++x) {
    const uint8_t* col = mask + x;  // stride w walks down a column in C-order
    for (int64_t y = 0; y < h; ++y) {
      uint8_t v = col[y * w] ? 1 : 0;
      if (v == cur) {
        ++run;
      } else {
        counts_out[n++] = run;
        run = 1;
        cur = v;
      }
    }
  }
  counts_out[n++] = run;
  return n;
}

// counts: n runs; out: (h, w) uint8 C-order buffer (h*w entries).
// Returns 0 on success, -1 if counts do not sum to h*w.
int rle_counts_to_mask(const int64_t* counts, int64_t n, int64_t h, int64_t w,
                       uint8_t* out) {
  int64_t total = 0;
  for (int64_t i = 0; i < n; ++i) total += counts[i];
  if (total != h * w) return -1;
  int64_t pos = 0;  // column-major position
  uint8_t val = 0;
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = 0; j < counts[i]; ++j, ++pos) {
      if (val) {
        int64_t y = pos % h;
        int64_t x = pos / h;
        out[y * w + x] = 1;
      }
    }
    val ^= 1;
  }
  return 0;
}

// Batch IoU/IoP between one GT mask and K proposal masks, all (h, w) uint8.
// Replaces the reference's per-proposal Python loop (utils/utils.py:234-272)
// for the host-side label computation.  iop = intersection / proposal_area.
void mask_iou_iop(const uint8_t* gt, const uint8_t* props, int64_t k,
                  int64_t h, int64_t w, float* iou_out, float* iop_out) {
  int64_t hw = h * w;
  int64_t gt_area = 0;
  for (int64_t i = 0; i < hw; ++i) gt_area += gt[i] ? 1 : 0;
  for (int64_t p = 0; p < k; ++p) {
    const uint8_t* m = props + p * hw;
    int64_t inter = 0, parea = 0;
    for (int64_t i = 0; i < hw; ++i) {
      int64_t mv = m[i] ? 1 : 0;
      parea += mv;
      inter += (mv & (gt[i] ? 1 : 0));
    }
    int64_t uni = gt_area + parea - inter;
    iou_out[p] = uni > 0 ? (float)inter / (float)uni : 0.0f;
    iop_out[p] = parea > 0 ? (float)inter / (float)parea : 0.0f;
  }
}

}  // extern "C"
