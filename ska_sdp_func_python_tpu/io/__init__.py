"""Native visibility IO: C++ chunked binary store + streaming loader."""

from .visio import VisStore, stream_visibility_chunks, write_visibility

__all__ = ["VisStore", "stream_visibility_chunks", "write_visibility"]
