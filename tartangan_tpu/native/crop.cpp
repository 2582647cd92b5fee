// Native host-side batch assembly for the input pipeline.
//
// The per-step hot path on the host is gathering a shuffled batch of uint8
// images and taking per-sample random crops before the async device_put
// (data/image_bytes.py::ImageBytesDataset.batch). The reference does this
// per-item in Python/PIL (reference trainer.py:68-77); numpy vectorizes the
// gather but still loops rows in Python for the crop. This C++ kernel does
// the whole batch with tight row memcpys and OpenMP over samples, keeping
// the host comfortably ahead of the TPU step even at 256x256+ batch 128.
//
// Built as a plain shared library (no pybind11 in this image); loaded via
// ctypes with a pure-numpy fallback when the toolchain is unavailable.

#include <cstdint>
#include <cstring>

extern "C" {

// images:  (n_total, H, W, C) uint8, C-contiguous
// indices: (n,) int64 rows to gather
// ys, xs:  (n,) int32 crop offsets
// out:     (n, size, size, C) uint8, preallocated
void crop_batch_u8(const uint8_t* images, int64_t h, int64_t w, int64_t c,
                   const int64_t* indices, int64_t n,
                   const int32_t* ys, const int32_t* xs, int64_t size,
                   uint8_t* out) {
  const int64_t img_stride = h * w * c;
  const int64_t row_stride = w * c;
  const int64_t out_row = size * c;
  const int64_t out_img = size * out_row;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* src =
        images + indices[i] * img_stride + ys[i] * row_stride + xs[i] * c;
    uint8_t* dst = out + i * out_img;
    for (int64_t r = 0; r < size; ++r) {
      std::memcpy(dst + r * out_row, src + r * row_stride, out_row);
    }
  }
}

// Plain gather without crop (whole images).
void gather_batch_u8(const uint8_t* images, int64_t img_bytes,
                     const int64_t* indices, int64_t n, uint8_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(out + i * img_bytes, images + indices[i] * img_bytes,
                img_bytes);
  }
}

}  // extern "C"
