"""Shared I/O plumbing for the y4m and raw readers/writers."""

from typing import BinaryIO, Union

# Preallocation granularity (frames) for unknown-length stream reads: big
# enough to amortize the per-chunk concatenate, small enough that the trim
# waste on short clips stays bounded (~0.5 GB at 1080p 4:2:0).
CHUNK_FRAMES = 256


def _open(f: Union[str, BinaryIO], mode: str):
    """(file_handle, we_opened_it): open paths, pass handles through."""
    if isinstance(f, (str, bytes)):
        return open(f, mode), True
    return f, False


def readinto_full(fh, view: memoryview) -> int:
    """Fill a writable memoryview from ``fh``, looping over short reads
    (pipes and sockets deliver partial buffers); returns bytes read —
    less than ``len(view)`` only at EOF.  Falls back to read()+copy for
    handles without readinto (rare; any file-like object works)."""
    readinto = getattr(fh, "readinto", None)
    if readinto is None:
        data = fh.read(len(view))
        view[: len(data)] = data
        return len(data)
    got = 0
    while got < len(view):
        n = readinto(view[got:])
        if not n:
            break
        got += n
    return got
