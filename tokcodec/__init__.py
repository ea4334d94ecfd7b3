"""tokcodec — a Ray-Data-native per-column lightweight-compression engine.

Built from scratch over `ray.data.Dataset` + zero-copy Arrow batches.
Capability surface mirrors `nevillelyh/parquet-extra` (schema system with
repetition, projection pushdown, predicate pushdown, schema inference,
round-trip encode/decode equality — see SURVEY.md §2) re-expressed in
idiomatic Ray Data, plus the codec engine itself (dictionary, RLE, FSST,
bit-packing, frame-of-reference with auto-selection) that the reference
delegated to parquet-mr internals.

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the caller (driver, bench.py, CLI, test fixture).
"""

__version__ = "0.1.0"


def _disable_numpy_thp_madvise() -> None:
    """Turn off numpy's madvise(MADV_HUGEPAGE) on large allocations.

    This sandbox VM restores from a hypervisor snapshot with lazily
    faulted guest memory.  A 4 KiB first-touch fault is served at
    ~900 MB/s, but a 2 MiB transparent-huge-page fault is served at
    ~7 MB/s — so numpy's default THP hint (policy [madvise] on this
    kernel) made every first touch of a large array ~130x slower
    (measured 2026-08-17: np.ones over 128 MB fresh = 18.6 s with the
    hint, 0.08 s without).  Every entry path (driver, Ray workers,
    tests, bench) imports tokcodec, so toggling here fixes all
    processes regardless of env-var propagation.  Harmless on healthy
    hosts: THP saves TLB misses worth a few percent at most, while the
    downside here is two orders of magnitude.  No-op if the private
    numpy hook moves (then NUMPY_MADVISE_HUGEPAGE=0 is the fallback)."""
    try:
        try:
            from numpy._core import multiarray as _ma  # numpy >= 2
        except ImportError:  # pragma: no cover - numpy 1.x layout
            from numpy.core import multiarray as _ma  # type: ignore
        _ma._set_madvise_hugepage(False)
    except Exception:  # pragma: no cover - future numpy without the hook
        pass


_disable_numpy_thp_madvise()


def _tune_malloc_for_lazy_guest_memory() -> None:
    """Keep large buffers in the (already-faulted) heap arena instead
    of fresh mmaps.

    Same root cause as the THP fix: this VM's guest memory is lazily
    faulted from a hypervisor snapshot, and fault service degrades to
    single-digit MB/s under load.  glibc returns every large (>128 KB)
    allocation's mmap to the OS on free, so EVERY numpy temporary in a
    hot loop re-faults its pages — measured 2026-08-17: a reused 200 MB
    array cost 1.6-12.9 s per iteration with default malloc vs 0.00 s
    with a raised mmap/trim threshold (warm-heap reuse).  Raise both
    thresholds to 2 GB via mallopt (runtime, this process) and export
    the glibc env knobs so Ray workers / subprocesses start with the
    same behavior.  Trade-off: a worker may hold its peak arena (~GBs
    for the heaviest tasks) instead of returning it — acceptable on a
    128 GiB single-node box and irrelevant on healthy hosts."""
    import ctypes
    import os

    thr = (1 << 31) - 1  # 2 GiB - 1: mallopt takes a C int
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(thr))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(thr))
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(ctypes.c_int(-3), ctypes.c_int(thr))  # M_MMAP_THRESHOLD
        libc.mallopt(ctypes.c_int(-1), ctypes.c_int(thr))  # M_TRIM_THRESHOLD
    except Exception:  # pragma: no cover - non-glibc platform
        pass


_tune_malloc_for_lazy_guest_memory()

from tokcodec.schema import Schema, Field, Repetition, Type  # noqa: F401
