"""Native visibility IO: C++ chunked binary store + streaming loader."""

from .visio import (
    VisStore,
    stream_visibility_chunks,
    write_visibility,
    write_visibility_arrays,
)

__all__ = [
    "VisStore",
    "stream_visibility_chunks",
    "write_visibility",
    "write_visibility_arrays",
]
