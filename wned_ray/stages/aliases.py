"""Alias dim-table construction ops: redirect/synonym resolution (J6/A4)
and anchor-text alias mining (M3/M5).

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


def merge_alias_tables(base: pa.Table, mined: pa.Table) -> pa.Table:
    """Union a mined alias table into the base dim table: freq mass ADDS
    per (entity, alias) — an anchor occurrence is independent evidence on
    top of the KB-sourced count (``KBExtractor.extractAlias`` merges its
    sources the same way) — and the base row's source label wins when
    both exist."""
    a = base.select(["entity", "alias", "source", "freq"]).to_pandas()
    b = mined.select(["entity", "alias", "source", "freq"]).to_pandas()
    a["_rank"] = 0
    b["_rank"] = 1
    out = pd.concat([a, b], ignore_index=True)
    out = (out.sort_values(["entity", "alias", "_rank"])
           .groupby(["entity", "alias"], as_index=False)
           .agg(source=("source", "first"), freq=("freq", "sum")))
    return pa.Table.from_pandas(
        out[["entity", "alias", "source", "freq"]], preserve_index=False)


def _anchor_batch(batch: pa.Table, text_col: str) -> pa.Table:
    """One batch of anchor-marked text -> PARTIALLY AGGREGATED
    (entity, alias, freq) rows: parse all ``[[target|anchor]]`` links,
    normalize the anchor to the alias-lookup key, and combine duplicate
    pairs within the batch so the global groupby shuffles the combined
    counts, not one row per link occurrence."""
    from wned_ray.functions.anchors import parse_anchors
    from wned_ray.functions.textnorm import normalize_names

    _, target, anchor = parse_anchors(batch[text_col])
    if len(target) == 0:
        return pa.table({"entity": pa.array([], pa.string()),
                         "alias": pa.array([], pa.string()),
                         "freq": pa.array([], pa.int64())})
    alias = normalize_names(anchor)
    df = pd.DataFrame({"entity": target.to_pandas(),
                       "alias": alias.to_pandas()})
    agg = df.groupby(["entity", "alias"], as_index=False).size()
    return pa.table({"entity": pa.array(agg["entity"], pa.string()),
                     "alias": pa.array(agg["alias"], pa.string()),
                     "freq": pa.array(agg["size"], pa.int64())})


def mine_anchor_aliases(ds, text_col: str = "text"):
    """Corpus text -> (entity, alias, source='anchor', freq) alias rows
    (M3, ``KBExtractor.extractAlias`` anchor-text source,
    ``…/kb/KBExtractor.java:98-167``; link parsing M5,
    ``WikiTextParser.parseLinks:135-170``).

    Shape: stateless flat-map with an in-batch combiner, then ONE small
    groupby over the (entity, alias) vocabulary — the shuffled volume is
    |distinct pairs per batch|, not |link occurrences|, so the stage
    stays a partial-aggregate pattern at corpus scale."""
    from ray.data.aggregate import Sum

    pairs = ds.map_batches(lambda b: _anchor_batch(b, text_col),
                           batch_format="pyarrow")
    out = (pairs.groupby(["entity", "alias"])
           .aggregate(Sum("freq", alias_name="freq")))
    return out.map_batches(
        lambda b: b.append_column(
            "source", pa.array(["anchor"] * b.num_rows, pa.string()))
        .select(["entity", "alias", "source", "freq"]),
        batch_format="pyarrow")
