"""Runtime glibc malloc tuning for slow-first-touch sandboxes.

This container's memory backing charges ~0.5ms per first-touch page fault
(~100s per GB of fresh pages). glibc serves large allocations via mmap
and munmaps them on free, so every large numpy temporary repays the
first-touch cost. Raising M_MMAP_THRESHOLD/M_TRIM_THRESHOLD keeps big
buffers in the heap arena where pages are reused — the fault cost is paid
once per high-water-mark byte instead of once per allocation.

No-op (with a broad except) on non-glibc platforms.
"""

from __future__ import annotations

_applied = False


def tune_malloc() -> None:
    global _applied
    if _applied:
        return
    _applied = True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD = -1
        M_MMAP_THRESHOLD = -3
        one_gib = 1 << 30
        libc.mallopt(M_MMAP_THRESHOLD, one_gib)
        libc.mallopt(M_TRIM_THRESHOLD, one_gib)
    except Exception:
        pass


tune_malloc()
