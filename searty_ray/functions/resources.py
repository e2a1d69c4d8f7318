"""Cluster-resource-derived stage sizing.

Actor-pool ``concurrency`` must track the node/cluster, not a hardcoded
constant (a fixed pool of 2 starves a 32-CPU node; 32 actors drown a
4-CPU laptop).  Helpers here read ``ray.cluster_resources()`` the same way
``pipelines/build.py`` sizes its reader blocks.
"""

from __future__ import annotations

import ray


def cluster_cpus(default: int = 8) -> int:
    try:
        return int(ray.cluster_resources().get("CPU", default)) or default
    except Exception:
        return default


def actor_pool(num_cpus_per_actor: int = 1, min_actors: int = 2) -> tuple[int, int]:
    """(min, max) autoscaling actor-pool size for ``map_batches(Cls,
    concurrency=...)``: scales up to the cluster's CPU slots, never below
    ``min_actors`` (pipelining across 2 actors hides per-batch latency even
    on tiny hosts)."""
    cpus = max(1, cluster_cpus() // max(1, num_cpus_per_actor))
    return (min(min_actors, cpus), max(min_actors, cpus))
