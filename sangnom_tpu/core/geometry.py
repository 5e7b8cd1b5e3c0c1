"""Scratch-buffer geometry and threshold precompute.

Replicates the reference constructor's derived quantities exactly, because
they are observable in the output (reference src/SangNom2.cpp:275-310):

- The 9 directional-error buffers are allocated with a stride rounded up to a
  32-byte alignment (reference src/SangNom2.cpp:16, 287).  The horizontal
  7-tap smoothing pass runs over — and clamps its taps at — that *padded*
  stride, not the plane width (reference src/SangNom2.cpp:136-152 iterate
  ``x in [0, bufferStride)``), so the padding columns are observable in the
  last <=3 output columns.  The reference leaves them uninitialized; this
  framework's contract defines them (and buffer rows 0 and H/2, likewise
  never written — reference src/SangNom2.cpp:79 vs 129-133) as ZERO.
- Buffer geometry is computed once from the LUMA plane and reused for chroma
  (reference src/SangNom2.cpp:287-288), so chroma error maps see zero padding
  out to the luma-derived stride.
- The `aa`/`aac` thresholds are pre-scaled by 21/16 (the smoothing stage sums
  21 taps but divides by 16) and by bit depth (reference src/SangNom2.cpp:
  280-282), then truncated to the pixel type when passed to the kernel
  (reference src/SangNom2.cpp:272 passes float ``aaf`` as ``const T``).
"""

from __future__ import annotations

import numpy as np

from sangnom_tpu.core.formats import VideoFormat

# Scratch alignment in bytes (reference src/SangNom2.cpp:16).
ALIGNMENT_BYTES = 32


def buffer_stride_elems(luma_width: int, component_size: int) -> int:
    """Error-buffer stride in *elements*.

    The reference computes ``bufferStride = ceil32(width) * ComponentSize``
    in bytes (reference src/SangNom2.cpp:287) — note it rounds the width in
    pixels up to 32 first, so the element stride is ceil32(width) for every
    component size.
    """
    del component_size  # stride is 32-pixel aligned regardless of depth
    return -(-luma_width // 32) * 32


def buffer_height(output_height: int) -> int:
    """Number of kept-field lines: ``(height + 1) >> 1`` computed AFTER any
    `dh` height doubling (reference src/SangNom2.cpp:284-288)."""
    return (output_height + 1) >> 1


def scaled_aa_thresholds(aa: int, aac: int, fmt: VideoFormat) -> list[float]:
    """Per-plane anti-aliasing thresholds, float32-exact.

    Reference src/SangNom2.cpp:280-282: ``aaf[i] = aa_i * 21.0f / 16.0f``
    times ``1 << (bits - 8)`` for integer formats, divided by 256 for float.
    The arithmetic is single-precision in the reference; replicate with
    np.float32 so truncation edge cases match bit-for-bit.
    """
    aa_per_plane = [aa, aac, aac]
    out: list[float] = []
    for i in range(min(fmt.num_planes, 3)):
        v = np.float32(aa_per_plane[i]) * np.float32(21.0) / np.float32(16.0)
        if fmt.component_size < 4:
            v = v * np.float32(1 << (fmt.bits - 8))
        else:
            v = v / np.float32(256.0)
        out.append(float(v))
    return out


def aaf_as_pixel(aaf: float, fmt: VideoFormat):
    """The threshold as the kernel sees it: the reference passes the float
    ``aaf`` as ``const T`` (reference src/SangNom2.cpp:272), i.e. truncated
    toward zero for integer pixel types."""
    if fmt.is_float:
        return np.float32(aaf)
    return int(aaf)  # float->unsigned conversion truncates toward zero
