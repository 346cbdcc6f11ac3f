"""Redirect/synonym resolution over the alias dim table (J6/A4).

The reference composes alias -> redirect -> entity so that variant
surfaces reach the canonical entity (``KBExtractor.resolveRedirect``,
``/root/reference/src/ca/ualberta/entitylinking/kb/KBExtractor.java:190-235``):
for every alias row whose alias string is the TARGET of one or more
redirects, it emits an extra alias row per redirecting surface, carrying
the same entity. (The reference applies this to ``source=disambig`` rows
only because its other sources are already redirect-resolved upstream;
here the composition applies to every row — the graft's aliases table is
the single candidate source.)

Two forms, one semantics:

- ``resolve_redirects_table`` — plain pyarrow/pandas for the dim-table
  path (the aliases table is vocabulary-sized and broadcast via
  ``ray.put``; resolving it driver-side before the broadcast is the
  cheap, shuffle-free shape).
- ``resolve_redirects`` — Ray Dataset hash join + union for callers that
  keep aliases distributed (e.g. a KB-scale alias corpus).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def resolve_redirects_table(alias: pa.Table, redirects: pa.Table) -> pa.Table:
    """alias (entity, alias, source, freq) x redirects (from_alias,
    to_alias) -> alias plus one row per (redirect, matching alias row):
    (entity, from_alias, 'redirect', freq)."""
    adf = alias.select(["entity", "alias", "source", "freq"]).to_pandas()
    rdf = redirects.select(["from_alias", "to_alias"]).to_pandas()
    extra = adf.merge(rdf, left_on="alias", right_on="to_alias", how="inner")
    extra = pd.DataFrame({
        "entity": extra["entity"],
        "alias": extra["from_alias"],
        "source": "redirect",
        "freq": extra["freq"],
    })
    out = pd.concat([adf, extra], ignore_index=True)
    # a redirect surface that already exists as a direct alias of the same
    # entity must not double its freq mass: keep the direct row
    out = out.drop_duplicates(subset=["entity", "alias"], keep="first")
    return pa.Table.from_pandas(out, preserve_index=False)


def resolve_redirects(alias_ds, redirects_ds, num_partitions: int = 16):
    """Distributed twin of ``resolve_redirects_table``: hash join on the
    redirect target + union with the original rows. Anti-duplicate rule is
    applied with a groupby-first on (entity, alias)."""
    extra = redirects_ds.join(
        alias_ds.rename_columns({"alias": "to_alias"}),
        join_type="inner", num_partitions=num_partitions, on=("to_alias",))

    def emit(batch: pa.Table) -> pa.Table:
        return pa.table({
            "entity": batch["entity"],
            "alias": batch["from_alias"],
            "source": pa.array(["redirect"] * batch.num_rows, pa.string()),
            "freq": batch["freq"],
            "is_direct": pa.array([0] * batch.num_rows, pa.int64()),
        })

    def mark(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "is_direct", pa.array([1] * batch.num_rows, pa.int64()))

    direct = alias_ds.map_batches(mark, batch_format="pyarrow")
    unioned = direct.union(extra.map_batches(emit, batch_format="pyarrow"))

    # keep the direct row when a redirect collides with an existing alias
    # of the same entity: max(is_direct) picks it, and the direct row's
    # (source, freq) ride along via the per-group sort+first
    def first_per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["is_direct", "source", "freq"],
                          ascending=[False, True, True])
        return g.head(1)[["entity", "alias", "source", "freq"]]

    return (unioned.groupby(["entity", "alias"])
            .map_groups(first_per_key, batch_format="pandas"))
