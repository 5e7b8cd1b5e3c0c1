// Measured single-core SSE2 baseline for BASELINE.md (VERDICT round-1 #3).
//
// Textually includes the REFERENCE's own SSE2 translation unit (path given
// at build time via -DREF_SSE2_SRC=...; nothing is copied into this repo)
// and times its actual pipeline — prepareBuffers_sse, 9x processBuffers_sse,
// finalizePlane_sse (the composition of SangNom2::sangnom_sse,
// reference src/SangNom2_SSE2.cpp:1258-1272) plus the GetFrame field copies
// (reference src/SangNom2.cpp:361-391) — on the bench.py headline workload:
// YUV420 8-bit 1920x540 -> 1080p via dh, order=1, aa=48, aac=0.
//
// Build (tools/sse2_baseline/Makefile):
//   g++ -O3 -std=c++17 harness.cpp -o sse2_baseline \
//       -DREF_SSE2_SRC='"/root/reference/src/SangNom2_SSE2.cpp"' -I.
// The shim avisynth.h in this directory satisfies the reference header's
// SDK includes; quoted-include resolution finds the real SangNom2.h next to
// the reference source.

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <vector>

#ifndef REF_SSE2_SRC
#define REF_SSE2_SRC "/root/reference/src/SangNom2_SSE2.cpp"
#endif
#include REF_SSE2_SRC

namespace {

constexpr int kAlign = 64;

template <class T>
T* aligned_new(size_t n) {
  void* p = nullptr;
  if (posix_memalign(&p, kAlign, n * sizeof(T))) return nullptr;
  std::memset(p, 0, n * sizeof(T));
  return static_cast<T*>(p);
}

// One plane of the reference's GetFrame work for the dh=true path:
// field copy + boundary duplication + the three SSE2 kernel stages
// (composition per reference src/SangNom2.cpp:361-391 and
// src/SangNom2_SSE2.cpp:1258-1272).
struct PlaneCtx {
  int w, h_src, h_out, bufferStride, bufferHeight;
  std::vector<uint8_t*> pool;      // 9 buffers, each (bufferHeight+1)*stride
  uint8_t* buffers[TOTAL_BUFFERS];
  int16_t* bufferLine;
  uint8_t* dst;

  PlaneCtx(int w_, int h_src_, int bufStride, int bufHeight)
      : w(w_), h_src(h_src_), h_out(2 * h_src_), bufferStride(bufStride),
        bufferHeight(bufHeight) {
    for (int i = 0; i < TOTAL_BUFFERS; ++i) {
      pool.push_back(
          aligned_new<uint8_t>(size_t(bufferStride) * (bufferHeight + 1)));
      buffers[i] = pool.back();
    }
    bufferLine = aligned_new<int16_t>(bufferStride);
    dst = aligned_new<uint8_t>(size_t(h_out) * w);
  }
  ~PlaneCtx() {
    for (auto* p : pool) free(p);
    free(bufferLine);
    free(dst);
  }

  void run(const uint8_t* src, int offset, float aaf) {
    // dh: copy the whole source as the kept field (BitBlt analogue)
    for (int y = 0; y < h_src; ++y)
      std::memcpy(dst + size_t(offset + 2 * y) * w, src + size_t(y) * w, w);
    // boundary missing line
    if (offset == 0)
      std::memcpy(dst + size_t(h_out - 1) * w, dst + size_t(h_out - 2) * w, w);
    else
      std::memcpy(dst, dst + w, w);
    // the reference's SSE2 kernel stages, exactly as sangnom_sse composes
    // them (bufferHeight is the LUMA-derived pool height for every plane)
    uint8_t* base = dst + size_t(offset) * w;
    prepareBuffers_sse<uint8_t, int16_t>(base, w, w, h_out, bufferStride,
                                         buffers);
    for (int i = 0; i < TOTAL_BUFFERS; ++i)
      processBuffers_sse(buffers[i], bufferLine, bufferStride, bufferHeight);
    finalizePlane_sse<uint8_t, int16_t>(base, w, w, h_out, bufferStride,
                                        static_cast<uint8_t>(aaf), buffers);
  }
};

}  // namespace

int main(int argc, char** argv) {
  const int W = 1920, H_SRC = 540;           // 1080i field -> 1080p via dh
  const int frames = argc > 1 ? std::atoi(argv[1]) : 50;
  const int trials = 3;

  // luma-derived buffer geometry (reference src/SangNom2.cpp:287-288)
  const int bufferStride = (W + 31) & ~31;
  const int bufferHeight = (2 * H_SRC + 1) >> 1;

  const float aa = 48.f, aac = 0.f;
  const float aafY = aa * 21.f / 16.f, aafC = aac * 21.f / 16.f;

  std::mt19937 rng(7);
  auto make_src = [&](int w, int h) {
    uint8_t* p = aligned_new<uint8_t>(size_t(w) * h);
    for (size_t i = 0; i < size_t(w) * h; ++i) p[i] = uint8_t(rng());
    return p;
  };
  uint8_t* srcY = make_src(W, H_SRC);
  uint8_t* srcU = make_src(W / 2, H_SRC / 2);
  uint8_t* srcV = make_src(W / 2, H_SRC / 2);

  PlaneCtx y(W, H_SRC, bufferStride, bufferHeight);
  PlaneCtx u(W / 2, H_SRC / 2, bufferStride, bufferHeight);
  PlaneCtx v(W / 2, H_SRC / 2, bufferStride, bufferHeight);

  double best = 1e30;
  for (int t = 0; t < trials; ++t) {
    auto t0 = std::chrono::steady_clock::now();
    for (int f = 0; f < frames; ++f) {
      y.run(srcY, 0, aafY);
      u.run(srcU, 0, aafC);
      v.run(srcV, 0, aafC);
    }
    double dt = std::chrono::duration<double>(
                    std::chrono::steady_clock::now() - t0)
                    .count() /
                frames;
    if (dt < best) best = dt;
  }
  // defeat dead-code elimination
  uint64_t sum = 0;
  for (size_t i = 0; i < size_t(y.h_out) * y.w; i += 97) sum += y.dst[i];

  std::printf(
      "{\"metric\": \"sse2_1080p_bob_dh_fps_single_core\", \"value\": %.2f, "
      "\"unit\": \"frames/s\", \"ms_per_frame\": %.3f, \"frames\": %d, "
      "\"checksum\": %llu}\n",
      1.0 / best, best * 1e3, frames, (unsigned long long)sum);
  free(srcY);
  free(srcU);
  free(srcV);
  return 0;
}
