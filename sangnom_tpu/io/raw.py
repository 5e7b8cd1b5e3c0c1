"""Raw planar frame I/O (headerless; geometry supplied by the caller).

The escape hatch for formats y4m cannot carry (float planes, alpha) and for
interop with `ffmpeg -f rawvideo` pipelines.
"""

from __future__ import annotations

from typing import BinaryIO, Union

import numpy as np

from sangnom_tpu.core.clip import Clip
from sangnom_tpu.core.formats import VideoFormat, get_format
from sangnom_tpu.io.common import CHUNK_FRAMES, _open, readinto_full


def frame_size_bytes(fmt: VideoFormat, width: int, height: int) -> int:
    return sum(
        pw * ph * fmt.component_size
        for pw, ph in (fmt.plane_dims(width, height, i) for i in range(fmt.num_planes))
    )


def read_raw(
    f: Union[str, BinaryIO],
    format: VideoFormat | str,
    width: int,
    height: int,
    max_frames: int | None = None,
    **clip_kw,
) -> Clip:
    """Read back-to-back planar frames until EOF (or max_frames).

    Frames stream directly into preallocated per-plane arrays (one copy;
    same discipline as the y4m reader, results/io_bench_r03.txt)."""
    fmt = get_format(format) if isinstance(format, str) else format
    geom = [fmt.plane_dims(width, height, i) for i in range(fmt.num_planes)]
    dt = fmt.dtype.newbyteorder("<") if fmt.component_size > 1 else fmt.dtype
    fbytes = [pw * ph * dt.itemsize for pw, ph in geom]

    fh, close = _open(f, "rb")
    try:
        chunks = []
        total = 0
        while max_frames is None or total < max_frames:
            cap = (CHUNK_FRAMES if max_frames is None
                   else min(CHUNK_FRAMES, max_frames - total))
            arrs = [np.empty((cap, ph, pw), dt) for pw, ph in geom]
            views = [memoryview(a).cast("B") for a in arrs]
            got = 0
            eof = False
            for i in range(cap):
                for k, (v, fb) in enumerate(zip(views, fbytes)):
                    n = readinto_full(fh, v[i * fb : (i + 1) * fb])
                    if n < fb:
                        if k == 0 and n == 0:
                            eof = True
                            break
                        raise ValueError("truncated raw frame")
                if eof:
                    break
                got += 1
            if got:
                chunks.append([a[:got] for a in arrs])
                total += got
            if eof or got < cap:
                break
        if not chunks:
            raise ValueError("raw stream contains no complete frames")
        planes = (
            chunks[0] if len(chunks) == 1
            else [np.concatenate([c[k] for c in chunks])
                  for k in range(len(geom))]
        )
        return Clip.from_numpy(planes, fmt, **clip_kw)
    finally:
        if close:
            fh.close()


def write_raw(f: Union[str, BinaryIO], clip: Clip) -> None:
    """Write back-to-back planar frames (little-endian for >8-bit).

    One fetch+convert per plane for the whole clip, zero-copy per-frame
    writes (same discipline as write_y4m_frames)."""
    fh, close = _open(f, "wb")
    dt = clip.format.dtype.newbyteorder("<") if clip.format.component_size > 1 \
        else clip.format.dtype
    try:
        arrs = [
            np.ascontiguousarray(np.asarray(p)).astype(dt, copy=False)
            for p in clip.planes
        ]
        for n in range(clip.num_frames):
            for p in arrs:
                fh.write(p[n].data)
    finally:
        if close:
            fh.close()
