/* Native padded-batch assembly (the host data-path hot loop).
 *
 * The reference rides torch's C++ DataLoader/pad_sequence for this
 * (dataloader.py:45-47 + num_workers=2); our TPU framework keeps the same
 * split: Python owns dataset logic, this C layer owns the memory movement.
 *
 * pad_time_major: scatter B ragged [T_b, D] float32 arrays into a zeroed
 * time-major [L, B, D] buffer (the wire format every model consumes).
 * pad_batch_first: scatter B ragged [T_b] rows into [B, L] (umask/label).
 *
 * Exposed via ctypes (ser_tpu/native/__init__.py); built on first import
 * with cc -O3 -shared -fPIC.
 */

#include <stdint.h>
#include <string.h>

void pad_time_major(const float **srcs, const int32_t *lens, int32_t n_src,
                    int32_t B, int32_t D, int32_t L, float *out) {
  /* out may be uninitialized (np.empty): real rows are copied, padding rows
   * are zeroed explicitly — writing each output byte exactly once instead
   * of zero-fill-then-copy. B is the padded batch (row stride), n_src <= B
   * the number of real sequences. */
  /* t-outer/b-inner keeps output writes fully sequential (the out layout is
   * [L, B, D]); each source row read is a contiguous 4*D-byte block. */
  for (int32_t t = 0; t < L; ++t) {
    float *row = out + (size_t)t * B * D;
    for (int32_t b = 0; b < B; ++b) {
      if (b < n_src && t < lens[b]) {
        memcpy(row + (size_t)b * D, srcs[b] + (size_t)t * D,
               (size_t)D * sizeof(float));
      } else {
        memset(row + (size_t)b * D, 0, (size_t)D * sizeof(float));
      }
    }
  }
}

void pad_batch_first_f32(const float **srcs, const int32_t *lens, int32_t B,
                         int32_t L, float *out) {
  for (int32_t b = 0; b < B; ++b) {
    memcpy(out + (size_t)b * L, srcs[b], (size_t)lens[b] * sizeof(float));
  }
}

void pad_batch_first_i32(const int32_t **srcs, const int32_t *lens, int32_t B,
                         int32_t L, int32_t *out) {
  for (int32_t b = 0; b < B; ++b) {
    memcpy(out + (size_t)b * L, srcs[b], (size_t)lens[b] * sizeof(int32_t));
  }
}
