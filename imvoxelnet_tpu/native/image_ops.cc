// Fused host-side image normalization + padding for the data loader.
//
// TPU-native equivalent of the reference's host preprocessing hot path
// (mmcv imnormalize + Pad in mmdet3d/datasets/pipelines, run inside torch
// DataLoader C++ workers): one pass over the uint8 image produces the
// normalized float32 tensor already placed in its zero-padded canvas,
// replacing two full-image float passes + an extra allocation per view in
// the Python pipeline.  Called via ctypes from `data/pipeline.py` (the call
// releases the GIL, so loader threads scale on many-core pod hosts).
//
// Bit-parity contract: identical IEEE f32 ops to the numpy path
// ((f32(u8) - f32 mean) / f32 std), asserted by tests/test_native.py.

#include <cstdint>
#include <cstring>

extern "C" {

// src: (h, w, 3) RGB uint8, C-contiguous.
// dst: (ph, pw, 3) float32, fully written (right/bottom zero padding).
void normalize_pad_u8(const uint8_t* src, int64_t h, int64_t w,
                      const float* mean, const float* stdv,
                      float* dst, int64_t ph, int64_t pw) {
  const float m0 = mean[0], m1 = mean[1], m2 = mean[2];
  const float s0 = stdv[0], s1 = stdv[1], s2 = stdv[2];
  for (int64_t y = 0; y < h; ++y) {
    const uint8_t* sp = src + y * w * 3;
    float* dp = dst + y * pw * 3;
    for (int64_t x = 0; x < w; ++x) {
      dp[3 * x + 0] = (static_cast<float>(sp[3 * x + 0]) - m0) / s0;
      dp[3 * x + 1] = (static_cast<float>(sp[3 * x + 1]) - m1) / s1;
      dp[3 * x + 2] = (static_cast<float>(sp[3 * x + 2]) - m2) / s2;
    }
    if (pw > w) {
      memset(dp + 3 * w, 0, sizeof(float) * 3 * (pw - w));
    }
  }
  if (ph > h) {
    memset(dst + h * pw * 3, 0, sizeof(float) * 3 * (ph - h) * pw);
  }
}

}  // extern "C"
