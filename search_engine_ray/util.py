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
