"""Small shared helpers."""

from __future__ import annotations


def pool_size(requested: int) -> int:
    """Clamp an actor-pool size so the pool can never starve the upstream
    read/map tasks (a pool reserving every CPU deadlocks a small cluster)."""
    import ray

    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    return max(1, min(requested, ncpu - 2))
