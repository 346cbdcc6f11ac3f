"""Small shared helpers."""

from __future__ import annotations


def safe_concurrency(requested: int, reserve: int = 1) -> int:
    """Cap an actor pool's size at cluster_cpus - reserve.

    A pool that reserves every CPU starves the upstream read/shuffle tasks
    and deadlocks the streaming executor (observed: a 4-actor pool on a
    4-CPU cluster left the ReadParquet task permanently backpressured).
    """
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 2)) if ray.is_initialized() else 2
    return max(1, min(requested, cpus - reserve))


def safe_partitions(requested: int, rows: int | None = None,
                    min_rows_per_partition: int = 4096) -> int:
    """Cap a join/shuffle's num_partitions at the cluster CPU count and,
    when a side's row count is known, at the DATA size.

    Every Dataset.join partition is a resident aggregator actor; a
    partition count above the CPU count on a small session just serializes
    (or wedges) the exchange. Multi-node clusters report more CPUs and
    keep the requested width.

    The ``rows`` hint (pass the SMALLER side's count when you have it)
    matters for correctness, not just speed: a hash partition that
    receives zero rows of one side is built schema-less, and the
    per-partition Arrow join then fails with "No match ... for key field
    reference" — tiny or skewed inputs MUST collapse to fewer partitions.
    """
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 2)) if ray.is_initialized() else 2
    cap = max(1, min(requested, cpus))
    if rows is not None:
        cap = max(1, min(cap, int(rows) // min_rows_per_partition + 1))
    return cap
