"""Raw planar frame I/O (headerless; geometry supplied by the caller).

The escape hatch for formats y4m cannot carry (float planes, alpha) and for
interop with `ffmpeg -f rawvideo` pipelines.
"""

from __future__ import annotations

from typing import BinaryIO, Union

import numpy as np

from sangnom_tpu.core.clip import Clip
from sangnom_tpu.core.formats import VideoFormat, get_format
from sangnom_tpu.io.common import _open


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
    """Read back-to-back planar frames until EOF (or max_frames)."""
    fmt = get_format(format) if isinstance(format, str) else format
    geom = [fmt.plane_dims(width, height, i) for i in range(fmt.num_planes)]
    nbytes = frame_size_bytes(fmt, width, height)
    dt = fmt.dtype.newbyteorder("<") if fmt.component_size > 1 else fmt.dtype

    fh, close = _open(f, "rb")
    try:
        frames = []
        while max_frames is None or len(frames) < max_frames:
            buf = fh.read(nbytes)
            if not buf:
                break
            if len(buf) < nbytes:
                raise ValueError("truncated raw frame")
            planes, off = [], 0
            for pw, ph in geom:
                n = pw * ph
                planes.append(
                    np.frombuffer(buf, dt, count=n, offset=off).reshape(ph, pw)
                )
                off += n * dt.itemsize
            frames.append(planes)
        if not frames:
            raise ValueError("raw stream contains no complete frames")
        stacked = [
            np.stack([fr[i] for fr in frames]).astype(fmt.dtype)
            for i in range(fmt.num_planes)
        ]
        return Clip.from_numpy(stacked, fmt, **clip_kw)
    finally:
        if close:
            fh.close()


def write_raw(f: Union[str, BinaryIO], clip: Clip) -> None:
    """Write back-to-back planar frames (little-endian for >8-bit)."""
    fh, close = _open(f, "wb")
    dt = clip.format.dtype.newbyteorder("<") if clip.format.component_size > 1 \
        else clip.format.dtype
    try:
        arrs = [np.asarray(p) for p in clip.planes]
        for n in range(clip.num_frames):
            for p in arrs:
                fh.write(np.ascontiguousarray(p[n]).astype(dt).tobytes())
    finally:
        if close:
            fh.close()
