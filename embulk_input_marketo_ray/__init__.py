"""embulk_input_marketo_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-expression of treasure-data/embulk-input-marketo's
semantics (watermark-sliced incremental pulls, paged fetch, per-object
dedup, metadata-driven schema evolution, exactly-once-style resume) as
an idiomatic Ray Data pipeline over a Parquet change-event table of
source-code repositories keyed ``(repo, path)`` with commit order as
the monotonic version.

Reference semantics are cited per-module as ``file:line`` relative to
``/root/reference/`` (embulk-input-marketo v0.6.29). No reference code
is copied; the execution engine is Ray Data (Dataset -> map_batches
over zero-copy Arrow -> hash-bucketed groupby merge -> exactly-once
Parquet sink).
"""

__version__ = "0.1.0"


def _tune_malloc() -> None:
    """Keep large numpy/Arrow heap buffers on the reusable glibc arena.

    On this class of virtualized host (Firecracker-style lazy memory),
    faulting a FRESH mmap region costs ~0.3-1 ms per 4 KiB page — a
    single new 43 MB gather destination measured 4-12 s inside a Ray
    worker, ~200x the memcpy cost. glibc munmaps >128 KiB allocations
    on free, so every sizable per-batch buffer re-faults from scratch.
    Raising M_MMAP_THRESHOLD/M_TRIM_THRESHOLD keeps those buffers on
    the sbrk arena: pages fault once per worker, then every subsequent
    batch reuses them (measured steady-state 0.02-0.3 s for the same
    gather). Runs at import time, so it applies to the driver AND to
    every Ray worker that deserializes one of this package's stage
    functions. RSS impact: each worker retains its high-water arena
    (bounded by per-batch working set x a small constant).
    """
    import ctypes

    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(ctypes.c_int(M_MMAP_THRESHOLD), ctypes.c_int(512 << 20))
        libc.mallopt(ctypes.c_int(M_TRIM_THRESHOLD), ctypes.c_int(512 << 20))
    except Exception:
        pass  # non-glibc platform: default allocator behavior


_tune_malloc()
