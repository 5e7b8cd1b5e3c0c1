// Minimal AviSynth-SDK shim so the REFERENCE's own SSE2 translation unit
// (/root/reference/src/SangNom2_SSE2.cpp, which includes SangNom2.h, which
// includes avisynth.h) compiles standalone for baseline MEASUREMENT.
//
// This file contains no reference code — only the handful of declarations
// the reference header names.  Nothing here is ever executed: the harness
// calls the reference's internal stage functions directly and never
// constructs the filter object, so these types exist purely to satisfy the
// parser.
#pragma once

#include <cstdint>
#include <cstdlib>

#ifndef AVS_FORCEINLINE
#define AVS_FORCEINLINE inline
#endif
#ifndef _MSC_VER
#ifndef __stdcall
#define __stdcall
#endif
#endif

enum {
  CACHE_GET_MTMODE = 0,
  MT_MULTI_INSTANCE = 0,
};

struct IScriptEnvironment;
struct PVideoFrame {};
struct PClip {};
struct GenericVideoFilter {};
