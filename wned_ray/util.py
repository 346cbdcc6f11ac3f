"""Small shared helpers."""

from __future__ import annotations


def semi_join_or_filter(ds, cols, keep_ds, key_col: str,
                        num_partitions: int = 16, keep: bool = True):
    """Distributed OR-membership filter: rows of ``ds`` where ANY of
    ``cols`` appears in ``keep_ds[key_col]`` are kept (``keep=True``)
    or dropped (``keep=False``, NOR semantics) — the semi/anti-join
    fallback for broadcast keep-sets past their driver cap (the
    documented contract of every ``ray.put`` membership site:
    SCALE.md "small sides broadcast once ... each with a size bound
    and a distributed fallback").

    One left-outer marker join per probe column; ``keep_ds`` MUST be
    distinct on ``key_col`` or matched rows duplicate."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    marks = []
    out = ds
    for i, c in enumerate(cols):
        m = f"__sj_m{i}"

        def add_mark(b: pa.Table, _m=m, _c=c) -> pa.Table:
            t = pa.table({_c: b[key_col]}) if key_col != _c else \
                pa.table({_c: b[_c]})
            return t.append_column(
                _m, pa.array(np.ones(t.num_rows, np.int8)))

        k = keep_ds.map_batches(add_mark, batch_format="pyarrow")
        out = out.join(k, join_type="left_outer",
                       num_partitions=num_partitions, on=(c,))
        marks.append(m)

    def fin(b: pa.Table) -> pa.Table:
        any_mark = None
        for m in marks:
            x = pc.is_valid(b[m])
            any_mark = x if any_mark is None else pc.or_(any_mark, x)
        return b.filter(any_mark if keep
                        else pc.invert(any_mark)).drop_columns(marks)

    return out.map_batches(fin, batch_format="pyarrow")


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
