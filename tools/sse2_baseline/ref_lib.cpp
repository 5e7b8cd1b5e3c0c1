// Verification library: runs the REFERENCE's own SSE2 pipeline (compiled in
// place from /root/reference, see harness.cpp for the include scheme) on one
// plane, so tests can check the framework's numerics="sse2" mode against the
// genuine article bit-for-bit (tests/test_sse2_numerics.py; skipped when the
// reference tree is absent).
//
// The pool is freshly zeroed per call — the framework's zero-defined
// contract — so this isolates the NUMERICS axis; the pool-carry axis is
// covered separately by the oracle's *_pool entry points.
//
// Constraints inherited from the reference's SSE2 code: w >= 16 (its
// left/middle/right block decomposition underflows otherwise) and
// dstStride % 16 == 0 (aligned row loads in the LEFT blocks).

#include <cstdint>
#include <cstring>

#ifndef REF_SSE2_SRC
#define REF_SSE2_SRC "/root/reference/src/SangNom2_SSE2.cpp"
#endif
#include REF_SSE2_SRC

namespace {

template <typename T, typename IType>
void run_plane(const T* src, T* dst, long w, long h_src, long dstStride,
               int offset, int dh, float aaf, long bufferStride,
               long bufferHeight, T* ext_pool = nullptr) {
  const long h_out = dh ? 2 * h_src : h_src;

  // GetFrame's field copy + boundary duplication
  // (reference src/SangNom2.cpp:361-391)
  if (dh) {
    for (long y = 0; y < h_src; ++y)
      std::memcpy(dst + (offset + 2 * y) * dstStride, src + y * dstStride,
                  w * sizeof(T));
  } else {
    for (long y = 0; y < h_src / 2; ++y)
      std::memcpy(dst + (offset + 2 * y) * dstStride,
                  src + (offset + 2 * y) * dstStride, w * sizeof(T));
  }
  if (offset == 0)
    std::memcpy(dst + (h_out - 1) * dstStride, dst + (h_out - 2) * dstStride,
                w * sizeof(T));
  else
    std::memcpy(dst, dst + dstStride, w * sizeof(T));

  // ext_pool: caller-owned SHARED pool carried across calls (the
  // reference's constructor-allocated pool, src/SangNom2.cpp:303-310) —
  // composing the SSE2 numerics with the pool-carry semantics.  nullptr:
  // fresh zero pool per call (the framework's zero-defined contract).
  T* pool = ext_pool;
  T* buffers[TOTAL_BUFFERS];
  if (!pool) {
    posix_memalign(
        reinterpret_cast<void**>(&pool), 64,
        sizeof(T) * bufferStride * (bufferHeight + 1) * TOTAL_BUFFERS);
    std::memset(pool, 0,
                sizeof(T) * bufferStride * (bufferHeight + 1) * TOTAL_BUFFERS);
  }
  for (int i = 0; i < TOTAL_BUFFERS; ++i)
    buffers[i] = pool + i * bufferStride * (bufferHeight + 1);
  IType* bufferLine;
  posix_memalign(reinterpret_cast<void**>(&bufferLine), 64,
                 sizeof(IType) * bufferStride);

  // the reference's SSE2 kernel stages, composed exactly as sangnom_sse
  // (reference src/SangNom2_SSE2.cpp:1258-1272)
  T* base = dst + offset * dstStride;
  prepareBuffers_sse<T, IType>(base, dstStride, w, h_out, bufferStride,
                               buffers);
  for (int i = 0; i < TOTAL_BUFFERS; ++i)
    processBuffers_sse(buffers[i], bufferLine, bufferStride, bufferHeight);
  finalizePlane_sse<T, IType>(base, dstStride, w, h_out, bufferStride,
                              static_cast<T>(aaf), buffers);

  if (!ext_pool) free(pool);
  free(bufferLine);
}

}  // namespace

extern "C" {

void ref_sse2_deint_u8(const uint8_t* src, uint8_t* dst, long w, long h_src,
                       long dstStride, int offset, int dh, float aaf,
                       long bufferStride, long bufferHeight) {
  run_plane<uint8_t, int16_t>(src, dst, w, h_src, dstStride, offset, dh, aaf,
                              bufferStride, bufferHeight);
}

void ref_sse2_deint_u16(const uint16_t* src, uint16_t* dst, long w,
                        long h_src, long dstStride, int offset, int dh,
                        float aaf, long bufferStride, long bufferHeight) {
  run_plane<uint16_t, int32_t>(src, dst, w, h_src, dstStride, offset, dh,
                               aaf, bufferStride, bufferHeight);
}

void ref_sse2_deint_f32(const float* src, float* dst, long w, long h_src,
                        long dstStride, int offset, int dh, float aaf,
                        long bufferStride, long bufferHeight) {
  run_plane<float, float>(src, dst, w, h_src, dstStride, offset, dh, aaf,
                          bufferStride, bufferHeight);
}

// Shared-pool variants: `pool` is caller-owned, 9*(bufferHeight+1)*
// bufferStride PIXEL-typed elements (the reference pools are T-typed),
// threaded by the caller through plane passes in order.
void ref_sse2_deint_u8_pool(const uint8_t* src, uint8_t* dst, long w,
                            long h_src, long dstStride, int offset, int dh,
                            float aaf, long bufferStride, long bufferHeight,
                            uint8_t* pool) {
  run_plane<uint8_t, int16_t>(src, dst, w, h_src, dstStride, offset, dh,
                              aaf, bufferStride, bufferHeight, pool);
}

void ref_sse2_deint_u16_pool(const uint16_t* src, uint16_t* dst, long w,
                             long h_src, long dstStride, int offset, int dh,
                             float aaf, long bufferStride, long bufferHeight,
                             uint16_t* pool) {
  run_plane<uint16_t, int32_t>(src, dst, w, h_src, dstStride, offset, dh,
                               aaf, bufferStride, bufferHeight, pool);
}

}  // extern "C"
