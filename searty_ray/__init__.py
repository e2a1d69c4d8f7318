"""searty_ray — Ray-Data-native inverted-index build + BM25 query engine."""

from __future__ import annotations


def _tune_allocator() -> None:
    """Keep large numpy buffers inside the process heap.

    glibc serves >128KB allocations via mmap and munmaps them on free, so
    every sizeable numpy temporary pays first-touch page faults again — on
    this class of sandboxed hosts that is the dominant cost of the encode
    stage (measured ~40×).  Raising M_MMAP_THRESHOLD/M_TRIM_THRESHOLD makes
    freed buffers reusable.  Runs once per process (drivers AND Ray workers
    import this package).
    """
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
    except Exception:  # noqa: BLE001 — non-glibc platforms: harmless no-op
        pass


_tune_allocator()