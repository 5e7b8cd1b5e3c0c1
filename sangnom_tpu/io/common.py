"""Shared I/O plumbing for the y4m and raw readers/writers."""

from typing import BinaryIO, Union


def _open(f: Union[str, BinaryIO], mode: str):
    """(file_handle, we_opened_it): open paths, pass handles through."""
    if isinstance(f, (str, bytes)):
        return open(f, mode), True
    return f, False
