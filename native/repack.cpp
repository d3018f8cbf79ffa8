// Load-time weight repack: fused transpose + nibble-pack into the K-major
// kernel layout (tpullm/quant/kmajor.py). This is the hot generic stage of
// GGUF -> device preparation (the numpy path spends seconds per large
// tensor on the strided transpose); cache-blocked and OpenMP-parallel.
//
// Native counterpart of ggml's load-time repack (ggml-cpu/repack.cpp).
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC -o libtpullm_repack.so repack.cpp

#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

static const int TB = 64;  // transpose tile

extern "C" {

// grid (N, K) u8 values 0..15 -> out (K/2, N) u8 with half-split planes:
// out[r, n] = grid[n, r] | grid[n, K/2 + r] << 4
void tpr_pack_u4(const uint8_t *grid, int64_t N, int64_t K, uint8_t *out) {
  const int64_t H = K / 2;
#pragma omp parallel for schedule(static)
  for (int64_t r0 = 0; r0 < H; r0 += TB) {
    for (int64_t n0 = 0; n0 < N; n0 += TB) {
      int64_t r1 = r0 + TB < H ? r0 + TB : H;
      int64_t n1 = n0 + TB < N ? n0 + TB : N;
      for (int64_t n = n0; n < n1; n++) {
        const uint8_t *lo = grid + n * K;
        const uint8_t *hi = lo + H;
        for (int64_t r = r0; r < r1; r++) {
          out[r * N + n] = (uint8_t)(lo[r] | (hi[r] << 4));
        }
      }
    }
  }
}

// grid (N, K) i8 -> out (K, N) i8 (plain blocked transpose)
void tpr_pack_i8(const int8_t *grid, int64_t N, int64_t K, int8_t *out) {
#pragma omp parallel for schedule(static)
  for (int64_t r0 = 0; r0 < K; r0 += TB) {
    for (int64_t n0 = 0; n0 < N; n0 += TB) {
      int64_t r1 = r0 + TB < K ? r0 + TB : K;
      int64_t n1 = n0 + TB < N ? n0 + TB : N;
      for (int64_t n = n0; n < n1; n++) {
        const int8_t *src = grid + n * K;
        for (int64_t r = r0; r < r1; r++) {
          out[r * N + n] = src[r];
        }
      }
    }
  }
}

// a (N, G) f32 -> out (G, N) f32
void tpr_transpose_f32(const float *a, int64_t N, int64_t G, float *out) {
#pragma omp parallel for schedule(static)
  for (int64_t g0 = 0; g0 < G; g0 += TB) {
    for (int64_t n0 = 0; n0 < N; n0 += TB) {
      int64_t g1 = g0 + TB < G ? g0 + TB : G;
      int64_t n1 = n0 + TB < N ? n0 + TB : N;
      for (int64_t n = n0; n < n1; n++) {
        const float *src = a + n * G;
        for (int64_t g = g0; g < g1; g++) {
          out[g * N + n] = src[g];
        }
      }
    }
  }
}

}  // extern "C"
