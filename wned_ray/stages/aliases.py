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

import numpy as np
import pandas as pd
import pyarrow as pa


def resolve_redirects_table(alias: pa.Table, redirects: pa.Table) -> pa.Table:
    """alias (entity, alias, source, freq) x redirects (from_alias,
    to_alias) -> alias plus one row per (entity, redirecting surface):
    (entity, from_alias, 'redirect', sum of the target alias rows' freq).

    Base rows pass through UNTOUCHED — an (entity, alias) pair may
    legitimately appear once per source ('name', 'link', ...) and each
    row's freq mass must survive (``build_alias_candidates`` sums them
    into the prior). A redirect surface that already exists as a direct
    alias of the same entity is dropped from the redirect side only (the
    direct rows carry the evidence; no double count)."""
    adf = alias.select(["entity", "alias", "source", "freq"]).to_pandas()
    rdf = redirects.select(["from_alias", "to_alias"]).to_pandas()
    extra = adf.merge(rdf, left_on="alias", right_on="to_alias", how="inner")
    extra = (extra.groupby(["entity", "from_alias"], as_index=False)
             .agg(freq=("freq", "sum"))
             .rename(columns={"from_alias": "alias"}))
    extra["source"] = "redirect"
    # anti-join: drop redirect rows colliding with an existing direct pair
    direct_keys = adf[["entity", "alias"]].drop_duplicates()
    extra = extra.merge(direct_keys, on=["entity", "alias"], how="left",
                        indicator=True)
    extra = extra.loc[extra["_merge"] == "left_only",
                      ["entity", "alias", "source", "freq"]]
    out = pd.concat([adf, extra], ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def resolve_redirects(alias_ds, redirects_ds, num_partitions: int = 16):
    """Distributed twin of ``resolve_redirects_table``: hash join on the
    redirect target, a (entity, redirect surface) groupby-sum, then a
    groupby-based anti-join so redirect rows colliding with a direct
    (entity, alias) pair are dropped. Direct rows stream through
    UNTOUCHED (no shuffle) — their multi-source freq rows all survive."""
    extra = redirects_ds.join(
        alias_ds.rename_columns({"alias": "to_alias"}),
        join_type="inner", num_partitions=num_partitions, on=("to_alias",))

    def emit(batch: pa.Table) -> pa.Table:
        return pa.table({
            "entity": batch["entity"],
            "alias": batch["from_alias"],
            "freq": batch["freq"],
            "is_direct": pa.array([0] * batch.num_rows, pa.int64()),
        })

    def keys_only(batch: pa.Table) -> pa.Table:
        return pa.table({
            "entity": batch["entity"],
            "alias": batch["alias"],
            "freq": pa.array([0] * batch.num_rows, batch["freq"].type),
            "is_direct": pa.array([1] * batch.num_rows, pa.int64()),
        })

    marked = (alias_ds.map_batches(keys_only, batch_format="pyarrow")
              .union(extra.map_batches(emit, batch_format="pyarrow")))

    # per (entity, alias): emit one summed redirect row unless any direct
    # marker is present (group size is tiny: redirect rows + key markers)
    def redirect_only(g: pd.DataFrame) -> pd.DataFrame:
        if (g["is_direct"] == 1).any():
            g = g.iloc[0:0]
        out = g.iloc[:1][["entity", "alias"]].copy()
        out["source"] = ["redirect"] * len(out)      # positional, index-safe
        out["freq"] = np.full(len(out), g["freq"].sum() if len(g) else 0,
                              dtype=np.int64)
        return out[["entity", "alias", "source", "freq"]]

    redirect_rows = (marked.groupby(["entity", "alias"])
                     .map_groups(redirect_only, batch_format="pandas"))
    direct = alias_ds.select_columns(["entity", "alias", "source", "freq"])
    return direct.union(redirect_rows)


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
