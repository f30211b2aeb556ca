"""Small shared utilities."""

from __future__ import annotations


def default_pool_size(reserve: int = 2) -> int:
    """Actor-pool size that leaves CPU headroom for read/write/shuffle stages.

    A pool that reserves every CPU starves the other operators and can stall
    the streaming executor entirely (observed with a 4-actor pool on a 4-CPU
    cluster feeding from read_parquet)."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(1, cpus - reserve)


_worker_tuned = False


def limit_arrow_threads() -> None:
    """Per-worker tuning for memory-heavy batch fns. Idempotent.

    1. Pin pyarrow's internal pool to 1 thread: each Ray task owns one CPU
       slot, but Arrow spawns os.cpu_count() threads per WORKER PROCESS —
       30 concurrent tasks ran ~960 compute threads (measured 4x slowdown).
    2. Make allocators RETAIN freed memory: profiling showed 74% of CPU in
       the KERNEL — glibc munmaps every >128KB block immediately and
       jemalloc decays dirty pages, so every batch re-faulted ~0.5 GB and
       zone-lock contention made 30 concurrent emits 6.5x slower per task
       than 8 (reproduced outside Ray). mallopt(M_MMAP_THRESHOLD, 1GB) +
       mallopt(M_TRIM_THRESHOLD, inf) + jemalloc decay off keep pages in
       the worker's arenas."""
    global _worker_tuned
    if _worker_tuned:
        return
    _worker_tuned = True
    import pyarrow as pa

    if pa.cpu_count() != 1:
        pa.set_cpu_count(1)
    try:
        pa.jemalloc_set_decay_ms(-1)  # retain pages in arrow's jemalloc pool
    except Exception:
        pass
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:
        pass


def embedding_matrix(col, dtype=None):
    """Arrow ``list<floatN>`` column → ``(n, d)`` ndarray, zero-copy.

    Flattens the Arrow list buffer and reshapes — no per-row Python lists
    (``to_pylist`` creates n lists × d Python floats; measured 10-50x
    slower on the ANN / near-dup / SemDeDup hot stages). Accepts Array or
    ChunkedArray, list or fixed_size_list; validates the lists are
    rectangular. ``dtype`` defaults to float64 (cast only if needed —
    float64 input stays zero-copy)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if dtype is None:
        dtype = np.float64
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype)
    lens = pc.list_value_length(col)
    d = int(pc.min(lens).as_py())
    if int(pc.max(lens).as_py()) != d:
        raise ValueError("embedding lists are ragged (unequal lengths)")
    flat = col.flatten()
    vals = flat.to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(vals, dtype=dtype).reshape(n, d)
