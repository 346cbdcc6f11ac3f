"""Driver contract for the wned_ray engine.

``entry()`` runs the flagship record-linkage pipeline on the t1 synthetic
transcript corpus (the BASELINE.json ``input_hint`` shape). ``queries()``
exposes one callable per implemented operator/pipeline from SURVEY.md §2;
SQL-expressible ones have a DuckDB oracle in ``oracle_sql()`` (same
column names both sides); the ER/near-dup/ANN pipelines that are not
ANSI-SQL-expressible are rows-only checks.

Ray is initialised by the driver BEFORE this module is imported — nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np

_ROUND = 6  # float columns rounded identically in Ray results and oracle SQL


# --------------------------------------------------------------- helpers

def _rd():
    import ray.data as rd

    return rd


def _corpus_for(sf_dir: str):
    """Map the driver's sf_dir to a synthetic transcript corpus tier."""
    from wned_ray.synth import T1, T2, ensure_corpus

    sf = os.path.basename(os.path.normpath(sf_dir or ""))
    spec = T1 if sf.endswith("0.001") else T2
    return ensure_corpus(spec)


_LINKAGE_CACHE: dict[tuple, tuple] = {}


_SESSION_FALLBACK = {"up": False, "key": "<none>"}


def _session_key() -> str:
    """Current Ray session id — cached Datasets hold object refs that die
    with the session, so a cache hit across sessions would return handles
    to freed object-store data (ADVICE.md round 1).

    The fallback (private session_name API gone) is a uuid regenerated
    whenever ray.is_initialized() flips False->True — never a constant
    shared by all sessions, which would silently serve stale handles
    (ADVICE.md round 2)."""
    import ray

    if not ray.is_initialized():
        _SESSION_FALLBACK["up"] = False
        return "<none>"
    if not _SESSION_FALLBACK["up"]:
        import uuid

        _SESSION_FALLBACK["up"] = True
        _SESSION_FALLBACK["key"] = f"<fallback:{uuid.uuid4().hex}>"
    try:
        return ray._private.worker._global_node.session_name
    except Exception:
        return _SESSION_FALLBACK["key"]


def _linkage(sf_dir: str):
    """Run (or reuse) the flagship pipeline for this sf_dir.

    The driver calls each ``er_*`` query independently; the pipeline's
    persisted stage Datasets are reusable within the Ray session, so one
    run serves all six ER queries instead of six full re-executions.
    """
    key = (sf_dir, _session_key())
    cached = _LINKAGE_CACHE.get(key)
    if cached is not None:
        return cached

    from wned_ray.config import PipelineConfig
    from wned_ray.pipelines.link import run_linkage

    corpus = _corpus_for(sf_dir)
    cfg = PipelineConfig()
    out = run_linkage(corpus["transcripts"], corpus["aliases"],
                      corpus["graph_edges"], cfg,
                      redirects_path=corpus.get("redirects"))
    _LINKAGE_CACHE.clear()          # one session's handles at a time
    _LINKAGE_CACHE[key] = (corpus, cfg, out)
    return corpus, cfg, out


# ----------------------------------------------------------------- entry

def entry() -> Any:
    """Flagship: full blocking + scoring + clustering on the t1 corpus."""
    from wned_ray.synth import T1, ensure_corpus
    from wned_ray.config import PipelineConfig
    from wned_ray.pipelines.link import run_linkage

    corpus = ensure_corpus(T1)
    cfg = PipelineConfig()
    out = run_linkage(corpus["transcripts"], corpus["aliases"],
                      corpus["graph_edges"], cfg,
                      redirects_path=corpus.get("redirects"))
    return out["clusters"]


# --------------------------------------------------------------- queries

def _q_normalize_text(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def norm(batch: pa.Table) -> pa.Table:
        x = pc.utf8_lower(batch["text"])
        x = pc.replace_substring_regex(x, r"\s+", " ")
        x = pc.utf8_trim_whitespace(x)
        return pa.table({"doc_id": batch["doc_id"], "norm_text": x})

    return ds.map_batches(norm, batch_format="pyarrow")


def _q_filter_events(sf_dir: str):
    """M1 + read pruning: the predicate is pushed INTO the parquet scan
    (row-group statistics pruning + scan-level row filtering), not
    applied as a post-read map — at corpus scale only matching row
    groups leave storage."""
    import pyarrow.dataset as pads

    return _rd().read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "value"],
        filter=((pads.field("event_type") == "click")
                & (pads.field("value") > 10.0)))


def _q_edge_aggregate(sf_dir: str):
    from ray.data.aggregate import Count

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])
    return (ds.groupby(["user_id", "event_type"])
            .aggregate(Count(alias_name="weight")))


def _q_alias_prior(sf_dir: str):
    import pandas as pd
    import pyarrow as pa

    from ray.data.aggregate import Count

    ds = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_returnflag", "l_linestatus"])
    freq = (ds.groupby(["l_returnflag", "l_linestatus"])
            .aggregate(Count(alias_name="freq")))

    # normalize per alias (= l_linestatus): freq / sum(freq) — G2 semantics;
    # the alias-marginal is tiny, so broadcast it into a vectorized divide.
    # prior exposed as integer micro-units so the value hash is float-proof.
    fdf = freq.to_pandas()
    tot = fdf.groupby("l_linestatus")["freq"].transform("sum")
    fdf["prior_micro"] = (fdf["freq"] / tot * 1_000_000).round().astype("int64")
    fdf = fdf.rename(columns={"l_returnflag": "entity", "l_linestatus": "alias"})
    return pa.Table.from_pandas(
        fdf[["entity", "alias", "freq", "prior_micro"]], preserve_index=False)


def _q_topk_parts(sf_dir: str):
    ds = _rd().read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_name", "p_retailprice"])
    return ds.sort(["p_retailprice", "p_partkey"], descending=[True, False]).limit(20)


def _q_left_join_customers_orders(sf_dir: str):
    """LEFT OUTER join through Ray's native hash-join operator (the
    J-family's outer form — customers with no orders keep a 0 count)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    cust = _rd().read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey"])
    # filter the right side so zero-match customers EXIST (30 at
    # sf0.01) and the outer semantics is actually falsifiable
    orders = (_rd().read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_custkey", "o_orderkey",
                                          "o_totalprice"])
              .filter(expr="o_totalprice > 300000.0")
              .select_columns(["o_custkey", "o_orderkey"]))
    j = cust.join(orders, join_type="left_outer", num_partitions=8,
                  on=("c_custkey",), right_on=("o_custkey",))

    def flag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": batch["c_custkey"],
            "hit": pc.cast(pc.is_valid(batch["o_orderkey"]), pa.int64()),
        })

    return (j.map_batches(flag, batch_format="pyarrow")
            .groupby("c_custkey")
            .aggregate(Sum("hit", alias_name="n_orders")))


def _q_join_orders_customers(sf_dir: str):
    import pandas as pd
    import pyarrow as pa
    import ray

    from ray.data.aggregate import Count, Sum

    # broadcast small dim side (customer), probe in map_batches — J1 pattern
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    # broadcast the dim as parallel Arrow arrays; probe via the C++
    # index_in/take hash kernels, zero-copy from plasma — no Python dict
    ref = ray.put((cust["c_custkey"].combine_chunks(),
                   cust["c_mktsegment"].combine_chunks()))

    class Probe:
        def __init__(self):
            self.keys, self.segs = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            idx = pc.index_in(batch["o_custkey"], value_set=self.keys)
            return pa.table({
                "c_mktsegment": self.segs.take(idx),
                "o_totalprice": batch["o_totalprice"],
            })

    orders = _rd().read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_totalprice"])
    joined = orders.map_batches(Probe, batch_format="pyarrow", concurrency=2)
    out = (joined.groupby("c_mktsegment")
           .aggregate(Count(alias_name="n_orders"),
                      Sum("o_totalprice", alias_name="total_price")))

    def r(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # whole-dollar int64 so summation-order ULP noise can't break the hash
        usd = pc.cast(pc.round(batch["total_price"]), pa.int64())
        return (batch.drop(["total_price"])
                .append_column("total_price_usd", usd))

    return out.map_batches(r, batch_format="pyarrow")


def _q_customers_without_orders(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    # anti-join against customers holding a high-value order (the plain
    # "no orders at all" set is empty at every sf — every customer orders)
    t = pq.read_table(f"{sf_dir}/orders.parquet",
                      columns=["o_custkey", "o_totalprice"])
    import pyarrow.compute as _pc

    big = t.filter(_pc.greater(t["o_totalprice"], 300_000.0))
    key_set = pa.array(sorted(set(big["o_custkey"].to_pylist())))
    ds = _rd().read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_name"])

    def anti(batch: pa.Table) -> pa.Table:   # broadcast anti-join (J7)
        return batch.filter(
            pc.invert(pc.is_in(batch["c_custkey"], value_set=key_set)))

    return ds.map_batches(anti, batch_format="pyarrow")


def _q_distinct_sources(sf_dir: str):
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
    return ds.groupby("source").count().select_columns(["source"])


def _q_exact_dedup_docs(sf_dir: str):
    from ray.data.aggregate import Count, Min

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return (ds.groupby("text")
            .aggregate(Min("doc_id", alias_name="keep_id"),
                       Count(alias_name="n_dups")))


def _q_token_count(sf_dir: str):
    from wned_ray.pipelines.datawork import token_count

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return token_count(ds).select_columns(["doc_id", "n_tokens"])


def _q_doc_quality(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    from wned_ray.pipelines.datawork import quality_scores

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    q = quality_scores(ds).select_columns(
        ["doc_id", "n_chars", "n_tokens", "punct_ratio", "upper_ratio"])

    def r(batch: pa.Table) -> pa.Table:
        return (batch
                .set_column(batch.schema.get_field_index("punct_ratio"),
                            "punct_ratio",
                            pc.round(batch["punct_ratio"], ndigits=_ROUND))
                .set_column(batch.schema.get_field_index("upper_ratio"),
                            "upper_ratio",
                            pc.round(batch["upper_ratio"], ndigits=_ROUND)))

    return q.map_batches(r, batch_format="pyarrow")


def _q_idf_terms(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    from wned_ray.pipelines.datawork import idf_table

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    t = idf_table(ds)

    def r(batch: pa.Table) -> pa.Table:
        micro = pc.cast(pc.round(pc.multiply(batch["idf"], 1_000_000.0)),
                        pa.int64())
        return pa.table({"term": batch["term"], "df": batch["df"],
                         "idf_micro": micro})

    return t.map_batches(r, batch_format="pyarrow")


def _q_tfidf_top_terms(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from wned_ray.pipelines.datawork import idf_table, tfidf_top_terms

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    idf = pa.Table.from_pandas(idf_table(ds).to_pandas(),
                               preserve_index=False)
    top = tfidf_top_terms(ds, ray.put(idf), k=5)

    def r(batch: pa.Table) -> pa.Table:
        micro = pc.cast(pc.round(pc.multiply(batch["tfidf"], 1_000_000.0)),
                        pa.int64())
        return pa.table({"doc_id": batch["doc_id"], "term": batch["term"],
                         "tf": pc.cast(batch["tf"], pa.int64()),
                         "tfidf_micro": micro})

    return top.map_batches(r, batch_format="pyarrow")


def _q_abbrev_tokens(sf_dir: str):
    """M12 analog (abbreviation detector, ``…/cs/MentionExpansion.java:
    126-158``): abbreviation-shaped tokens — single word, 2-10 chars,
    >=2 uppercase letters — extracted and counted corpus-wide (the
    documents table is all-lowercase, so this runs over the orders
    priority strings, the only mixed-case text in the fixture set)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count

    ds = _rd().read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_orderpriority"])

    def ab(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch["o_orderpriority"], r"\s+")
        flat = pc.list_flatten(toks)
        ln = pc.utf8_length(flat)
        n_upper = pc.count_substring_regex(flat, "[A-Z]")
        keep = pc.and_(pc.and_(pc.greater_equal(ln, 2), pc.less_equal(ln, 10)),
                       pc.greater_equal(n_upper, 2))
        return pa.table({"token": flat.filter(keep)})

    return (ds.map_batches(ab, batch_format="pyarrow")
            .groupby("token").aggregate(Count(alias_name="n")))


def _q_per_user_top_event(sf_dir: str):
    """G3/G4 analog: per-group top-1 by value (deterministic tie-break)."""
    import pandas as pd

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "value"])

    def head1(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["value", "event_id"],
                             ascending=[False, True]).head(1)

    out = ds.groupby("user_id").map_groups(head1, batch_format="pandas")

    def r(batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        return pa.table({
            "user_id": batch["user_id"],
            "event_id": batch["event_id"],
            "value_e4": pc.cast(pc.round(pc.multiply(batch["value"], 10_000.0)),
                                pa.int64()),
        })

    return out.map_batches(r, batch_format="pyarrow")


def _q_lineitem_pricing_summary(sf_dir: str):
    """TPC-H Q1-style multi-aggregate (sum/avg/count per flag+status)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    ds = _rd().read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"])

    def pre(batch: pa.Table) -> pa.Table:
        disc = pc.multiply(batch["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return batch.append_column("disc_price", disc)

    agg = (ds.map_batches(pre, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("l_quantity", alias_name="sum_qty"),
                      Sum("l_extendedprice", alias_name="sum_base"),
                      Sum("disc_price", alias_name="sum_disc"),
                      Count(alias_name="n_rows")))

    def r(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "sum_qty": pc.cast(pc.round(batch["sum_qty"]), pa.int64()),
            "sum_base_usd": pc.cast(pc.round(batch["sum_base"]), pa.int64()),
            "sum_disc_usd": pc.cast(pc.round(batch["sum_disc"]), pa.int64()),
            "n_rows": batch["n_rows"],
        })

    return agg.map_batches(r, batch_format="pyarrow")


def _q_events_daily(sf_dir: str):
    """Content-window aggregate analog: per-day, per-type counts + sums."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type", "value"])

    def day(batch: pa.Table) -> pa.Table:
        d = pc.cast(pc.floor_temporal(batch["ts"], unit="day"), pa.date32())
        return pa.table({"day": pc.cast(d, pa.string()),
                         "event_type": batch["event_type"],
                         "value": batch["value"]})

    agg = (ds.map_batches(day, batch_format="pyarrow")
           .groupby(["day", "event_type"])
           .aggregate(Count(alias_name="n_events"),
                      Sum("value", alias_name="sum_value")))

    def r(batch: pa.Table) -> pa.Table:
        return pa.table({
            "day": batch["day"], "event_type": batch["event_type"],
            "n_events": batch["n_events"],
            "sum_value_e2": pc.cast(
                pc.round(pc.multiply(batch["sum_value"], 100.0)), pa.int64()),
        })

    return agg.map_batches(r, batch_format="pyarrow")


def _q_union_region_nation(sf_dir: str):
    """Set-op family in one result: UNION ALL of region+nation names,
    plus distributed INTERSECT / EXCEPT (ANSI DISTINCT semantics, one
    shuffle each — datawork.set_op) over two overlapping nation-name
    slices. Rows carry an ``op`` tag."""
    import pyarrow as pa

    from wned_ray.pipelines.datawork import set_op

    r = _rd().read_parquet(f"{sf_dir}/region.parquet", columns=["r_name"])
    n = _rd().read_parquet(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])

    def rn(b: pa.Table) -> pa.Table:
        return pa.table({"name": b[b.column_names[-1]]})

    def tagged(op: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({"name": b["n_name" if "n_name" in
                                       b.column_names else "name"],
                             "op": pa.array([op] * len(b))})
        return f

    union_all = (r.map_batches(rn, batch_format="pyarrow")
                 .union(n.map_batches(rn, batch_format="pyarrow"))
                 .map_batches(tagged("union_all"), batch_format="pyarrow"))
    lo = n.filter(expr="n_nationkey < 15")
    hi = n.filter(expr="n_nationkey >= 5")
    inter = set_op(lo, hi, "n_name", "intersect").rename_columns(
        {"n_name": "name"}).map_batches(tagged("intersect"),
                                        batch_format="pyarrow")
    exc = set_op(lo, hi, "n_name", "except").rename_columns(
        {"n_name": "name"}).map_batches(tagged("except"),
                                        batch_format="pyarrow")
    return union_all.union(inter).union(exc)


def _q_cooccur_pairs(sf_dir: str):
    """M4 analog: distinct event_type pairs per user, counted corpus-wide."""
    import pyarrow as pa

    from ray.data.aggregate import Count

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])
    distinct = ds.groupby(["user_id", "event_type"]).count().select_columns(
        ["user_id", "event_type"])
    left = distinct.rename_columns({"event_type": "type_a"})
    right = distinct.rename_columns({"event_type": "type_b"})
    joined = left.join(right, join_type="inner", num_partitions=8,
                       on=("user_id",))

    def canon(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.less(batch["type_a"], batch["type_b"]))

    pairs = joined.map_batches(canon, batch_format="pyarrow")
    return (pairs.groupby(["type_a", "type_b"])
            .aggregate(Count(alias_name="weight")))


def _q_grouped_norm(sf_dir: str):
    """G9 analog: per event_type share of total value (sum-normalized)."""
    import pandas as pd
    import pyarrow as pa

    from ray.data.aggregate import Sum

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])
    s = ds.groupby("event_type").aggregate(Sum("value", alias_name="sum_value"))
    df = s.to_pandas()
    df["share_micro"] = (df["sum_value"] / df["sum_value"].sum()
                         * 1_000_000).round().astype("int64")
    df["sum_value_int"] = df["sum_value"].round().astype("int64")
    return pa.Table.from_pandas(df[["event_type", "sum_value_int",
                                    "share_micro"]], preserve_index=False)


def _q_knn(sf_dir: str):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from wned_ray.pipelines.datawork import knn_search

    ds = _rd().read_parquet(f"{sf_dir}/embeddings.parquet")
    head = pq.read_table(f"{sf_dir}/embeddings.parquet").slice(0, 3)
    q_ids = np.asarray(head["vec_id"].to_pylist())
    qm = np.asarray(head["embedding"].to_pylist(), dtype=np.float64)
    out = knn_search(ds, q_ids, qm, k=5).to_pandas()
    # 4-decimal integer units: dot-product accumulation-order noise (~1e-15)
    # cannot flip a 1e-4 bucket, so the value hash is reproducible vs SQL
    out["cos_e4"] = (out["cos"] * 10_000).round().astype("int64")
    out = out[["query_id", "vec_id", "cos_e4"]].sort_values(
        ["query_id", "vec_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# ------------------------- ER pipeline queries (rows-only, non-SQL) ------

def _q_er_blocking(sf_dir: str):
    _, _, out = _linkage(sf_dir)
    return out["blocking"].select_columns(
        ["norm_mention", "n_mentions", "block_key", "band_idx"])


def _q_er_blocking_quality(sf_dir: str):
    """Blocking-scheme evaluation (Christen 2012 ch. 4): reduction ratio
    (share of the quadratic pair space pruned) + pair completeness
    (share of TRUE matches the candidate graph CONNECTS, transitively —
    the pair generator emits spanning structures, not the quadratic
    set) for the LSH/token blocking tier, against the fixture's
    expected_clusters gold. Rows-only (the blocker isn't
    SQL-expressible). Complements the F1 gates: the pairwise labels
    mirror the blocking tier by construction, so true pairs whose
    surfaces never co-block are invisible to F1 — this row measures
    exactly that residual."""
    import pandas as pd

    from wned_ray.stages.evaluate import blocking_quality

    corpus, _, out = _linkage(sf_dir)
    gold = _rd().read_parquet(corpus["expected_clusters"])
    m = blocking_quality(out["pairs"], gold)
    m["reduction_ratio_e6"] = int(round(m.pop("reduction_ratio") * 1e6))
    m["pair_completeness_e6"] = int(round(
        m.pop("pair_completeness") * 1e6))
    return pd.DataFrame([m])


def _q_er_pairs(sf_dir: str):
    _, _, out = _linkage(sf_dir)
    return out["pairs"].select_columns(["id_a", "id_b", "block_key"])


def _q_er_scores(sf_dir: str):
    _, _, out = _linkage(sf_dir)
    return out["scores"]


def _q_er_clusters(sf_dir: str):
    _, _, out = _linkage(sf_dir)
    return out["clusters"]


def _q_er_metrics(sf_dir: str):
    import pandas as pd

    from wned_ray.stages.evaluate import pairwise_metrics

    corpus, cfg, out = _linkage(sf_dir)
    labels = _rd().read_parquet(corpus["labels"])
    m = pairwise_metrics(labels, out["clusters"])
    return pd.DataFrame([m])


_RESOLVE_CACHE: dict[tuple, Any] = {}


def _q_er_resolve(sf_dir: str):
    import pyarrow.parquet as pq
    import ray

    from wned_ray.config import PipelineConfig
    from wned_ray.stages.normalize import prepare
    from wned_ray.stages.resolve import resolve_conversations

    # er_resolve and er_resolve_accuracy share one resolver run per
    # (sf_dir, Ray session) — same discipline as _LINKAGE_CACHE
    key = (sf_dir, _session_key())
    cached = _RESOLVE_CACHE.get(key)
    if cached is not None:
        return cached

    corpus = _corpus_for(sf_dir)
    cfg = PipelineConfig()
    from wned_ray.stages.aliases import resolve_redirects_table

    prepared = prepare(_rd().read_parquet(corpus["transcripts"]), cfg)
    alias_ref = ray.put(resolve_redirects_table(
        pq.read_table(corpus["aliases"]),
        pq.read_table(corpus["redirects"])))
    graph_ref = ray.put(pq.read_table(corpus["graph_edges"]))
    out = resolve_conversations(prepared, alias_ref, graph_ref,
                                cfg).materialize()
    _RESOLVE_CACHE.clear()
    _RESOLVE_CACHE[key] = out
    return out


def _q_er_resolve_accuracy(sf_dir: str):
    """Gold check for the iterative greedy resolver (K11/K4): hash-join
    the resolved (mention_id -> entity_id) assignments to the fixture's
    ``expected_clusters`` gold labels, tally agreement per batch, and
    reduce to ONE accuracy row. Rows-only driver check (resolution is
    iterative, not SQL-expressible); the T1 unit-test twin asserts
    accuracy >= 0.95 against the same gold table."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    corpus = _corpus_for(sf_dir)
    got = _q_er_resolve(sf_dir).select_columns(
        ["mention_id", "entity_id"]).rename_columns(
        {"entity_id": "entity_got"})
    want = _rd().read_parquet(
        corpus["expected_clusters"],
        columns=["mention_id", "entity_id"]).rename_columns(
        {"entity_id": "entity_want"})
    j = got.join(want, join_type="inner", num_partitions=8,
                 on=("mention_id",))

    def tally(batch: pa.Table) -> pa.Table:
        ok = pc.sum(pc.cast(pc.equal(batch["entity_got"],
                                     batch["entity_want"]),
                            pa.int64())).as_py() or 0
        return pa.table({"n_correct": pa.array([ok], pa.int64()),
                         "n_total": pa.array([batch.num_rows], pa.int64())})

    agg = (j.map_batches(tally, batch_format="pyarrow")
           .aggregate(Sum("n_correct", alias_name="n_correct"),
                      Sum("n_total", alias_name="n_total")))
    n_ok, n = int(agg["n_correct"]), int(agg["n_total"])
    return pd.DataFrame([{
        "n_correct": n_ok, "n_total": n,
        "accuracy_e4": int(round(10000 * n_ok / n)) if n else 0,
    }])


def _q_er_resolve_strategies(sf_dir: str):
    """The reference's PrefStrategy x useIterative A/B surface
    (WNEDConfig.java:25-33, SemanticSignatureEL linkingImplUnified
    {Iterative:576-723, Uniterative:472-568}): one resolver run per
    strategy over the same prepared input, one accuracy row each.
    Rows-only (iterative resolution is not SQL-expressible); the pytest
    twin asserts every strategy clears the prior-only sanity floor."""
    from dataclasses import replace

    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    from wned_ray.config import PipelineConfig
    from wned_ray.stages.aliases import resolve_redirects_table
    from wned_ray.stages.normalize import prepare
    from wned_ray.stages.resolve import resolve_conversations

    corpus = _corpus_for(sf_dir)
    base = PipelineConfig()
    prepared = prepare(_rd().read_parquet(corpus["transcripts"]),
                       base).materialize()     # pin: consumed per strategy
    alias_ref = ray.put(resolve_redirects_table(
        pq.read_table(corpus["aliases"]),
        pq.read_table(corpus["redirects"])))
    graph_ref = ray.put(pq.read_table(corpus["graph_edges"]))
    gold = (pq.read_table(corpus["expected_clusters"],
                          columns=["mention_id", "entity_id"])
            .to_pandas().set_index("mention_id")["entity_id"])

    variants = [
        ("PRIOR_PROB_iter", {}),
        ("UNIFORM_iter", {"pref_strategy": "UNIFORM"}),
        ("CTX_SIM_iter", {"pref_strategy": "CTX_SIM"}),
        ("RANDOM_iter", {"pref_strategy": "RANDOM"}),
        ("TFIDF_mention_iter", {"mention_pref": "TFIDF"}),
        ("PRIOR_PROB_oneshot", {"iterative": False}),
        # reference-default candidate prune (CSUtils PRUNE_LIMIT=3):
        # union of top-3 by ctx-sim and top-3 by prior per mention
        ("CTX_SIM_prune3", {"pref_strategy": "CTX_SIM",
                            "candidate_prune_limit": 3}),
    ]
    rows = []
    for name, kw in variants:
        cfg = replace(base, **kw)
        got = (resolve_conversations(prepared, alias_ref, graph_ref, cfg)
               .to_pandas().set_index("mention_id")["entity_id"])
        m = got.to_frame("got").join(gold.to_frame("want"), how="inner")
        rows.append({
            "strategy": name,
            "n_total": len(m),
            "n_correct": int((m["got"] == m["want"]).sum()),
            "accuracy_e4": int(round(10000 * (m["got"] == m["want"]).mean()))
            if len(m) else 0,
        })
    return pd.DataFrame(rows)


_HARD_CACHE: dict[tuple, tuple] = {}


def _hard_linkage():
    """Run (or reuse) the flagship pipeline on the ADVERSARIAL tier —
    shared first words across topics, ambiguous bare names, prior-trap
    nicknames (synth.CorpusSpec.hard docs). The tier exists because the
    friendly generator cannot produce false positives by construction
    (round-2 VERDICT): here precision is falsifiable (~20% of labeled
    pairs are negatives at shared blocking keys)."""
    from wned_ray.pipelines.link import run_linkage
    from wned_ray.synth import HARD, config_for, ensure_corpus

    key = ("hard", _session_key())
    cached = _HARD_CACHE.get(key)
    if cached is not None:
        return cached
    corpus = ensure_corpus(HARD)
    cfg = config_for(HARD)
    out = run_linkage(corpus["transcripts"], corpus["aliases"],
                      corpus["graph_edges"], cfg,
                      redirects_path=corpus.get("redirects"))
    _HARD_CACHE.clear()
    _HARD_CACHE[key] = (corpus, cfg, out)
    return corpus, cfg, out


def _q_er_metrics_hard(sf_dir: str):
    """Pairwise micro/macro P/R/F1 on the hard tier (sf_dir-independent
    fixture, like the friendly er_metrics but with real negatives)."""
    import pandas as pd

    from wned_ray.stages.evaluate import pairwise_metrics

    corpus, cfg, out = _hard_linkage()
    labels = _rd().read_parquet(corpus["labels"])
    return pd.DataFrame([pairwise_metrics(labels, out["clusters"])])


def _q_er_resolve_prior_vs_full(sf_dir: str):
    """PriorProbEL twin (``…/experiment/PriorProbEL.java:50-329``, argmax
    prior at :133-148): resolver accuracy under prior-only scoring next
    to the full (prior + PPR doc-signature) resolver, on the hard tier —
    the reference's own sanity floor (SURVEY §5.2). The nickname
    surfaces' alias rows favor the WRONG entity 2:1, so prior-only is
    structurally below full; the row quantifies the semantic kernel's
    lift."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    from wned_ray.stages.aliases import resolve_redirects_table
    from wned_ray.stages.resolve import resolve_conversations

    # reuse the cached hard-tier linkage's materialized prepared stage —
    # no second full prepare pass per driver sweep
    corpus, cfg, out = _hard_linkage()
    prepared = out["prepared"]
    alias_ref = ray.put(resolve_redirects_table(
        pq.read_table(corpus["aliases"]), pq.read_table(corpus["redirects"])))
    graph_ref = ray.put(pq.read_table(corpus["graph_edges"]))
    gold = _rd().read_parquet(corpus["expected_clusters"],
                              columns=["mention_id", "entity_id"]
                              ).rename_columns({"entity_id": "entity_want"})

    def acc(prior_only: bool) -> tuple[int, int]:
        got = resolve_conversations(
            prepared, alias_ref, graph_ref, cfg, prior_only=prior_only
        ).select_columns(["mention_id", "entity_id"]).rename_columns(
            {"entity_id": "entity_got"})
        j = got.join(gold, join_type="inner", num_partitions=8,
                     on=("mention_id",))

        import pyarrow as pa
        import pyarrow.compute as pc
        from ray.data.aggregate import Sum

        def tally(batch: pa.Table) -> pa.Table:
            ok = pc.sum(pc.cast(pc.equal(batch["entity_got"],
                                         batch["entity_want"]),
                                pa.int64())).as_py() or 0
            return pa.table({"ok": pa.array([ok], pa.int64()),
                             "n": pa.array([batch.num_rows], pa.int64())})

        agg = (j.map_batches(tally, batch_format="pyarrow")
               .aggregate(Sum("ok", alias_name="ok"),
                          Sum("n", alias_name="n")))
        return int(agg["ok"]), int(agg["n"])

    full_ok, n = acc(prior_only=False)
    prior_ok, _ = acc(prior_only=True)
    return pd.DataFrame([{
        "n_total": n,
        "full_correct": full_ok,
        "prior_correct": prior_ok,
        "full_acc_e4": int(round(10000 * full_ok / n)) if n else 0,
        "prior_acc_e4": int(round(10000 * prior_ok / n)) if n else 0,
        "sem_lift_e4": int(round(10000 * (full_ok - prior_ok) / n)) if n else 0,
    }])


def _q_er_fit_weights(sf_dir: str):
    """A5 learned ranker through the driver: fit BOTH ranker analogs
    from the hard tier's labeled pairs x scored pairs — the pointwise
    least-squares fit (fusion.fit_config) and the RankNet-style
    pairwise logistic fit (fusion.fit_config_pairwise, the honest
    L2RPredictor training analog: the reference trains a RankLib
    learning-to-rank model) — one row each, with the training-pair
    count. The pytest twins re-run the pipeline under each fitted
    config and assert the F1 gate."""
    import pandas as pd

    from wned_ray.functions.fusion import fit_config, fit_config_pairwise

    corpus, cfg, out = _hard_linkage()
    labels_df = _rd().read_parquet(corpus["labels"]).to_pandas()
    scores_df = out["scores"].to_pandas()
    n = len(labels_df.merge(scores_df[["id_a", "id_b"]],
                            on=["id_a", "id_b"]))
    rows = []
    for fitter, name in ((fit_config, "pointwise_lstsq"),
                         (fit_config_pairwise, "pairwise_ranknet")):
        fitted = fitter(scores_df, labels_df, cfg)
        rows.append({
            "fit": name,
            "train_pairs": n,
            "prior_weight_e4": int(round(fitted.prior_weight * 10000)),
            "local_weight_e4": int(round(fitted.local_weight * 10000)),
            "name_weight_e4": int(round(fitted.name_weight * 10000)),
            "threshold_e4": int(round(fitted.match_threshold * 10000)),
        })
    return pd.DataFrame(rows)


def _q_er_rel_modes(sf_dir: str):
    """K7 full surface through the scorer: score one deterministic
    all-pairs sample of in-graph alias surfaces under the PPR kernel
    and EVERY Milne-Witten link-set mode (cfg.rel_mode — in/out/both x
    binary/counted, undirect pair, the two reference quirk modes); one
    row per mode with the mean semantic feature. Falsifiable surface
    check: the directed modes require the DirectedCSR twin in scorer
    state, and a mode that silently fell back to PPR would duplicate
    its row."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from wned_ray.stages.scoring import NormPairScorer, build_scorer_state
    from wned_ray.state.graph import MW_MODES
    from wned_ray.synth import HARD, config_for, ensure_corpus

    corpus = ensure_corpus(HARD)
    alias_t = pq.read_table(corpus["aliases"])
    graph_t = pq.read_table(corpus["graph_edges"])
    rows = []
    for mode in ["ppr"] + sorted(MW_MODES):
        cfg = config_for(HARD, rel_mode=mode)
        state = build_scorer_state(alias_t, graph_t, cfg)
        names = [str(a) for a, g in zip(state["alias_names"],
                                        state["top_gid"]) if g >= 0][:40]
        na, nb = zip(*[(x, y) for i, x in enumerate(names)
                       for y in names[i + 1:]])
        tbl = pa.table({
            "norm_a": pa.array(na, pa.string()),
            "norm_b": pa.array(nb, pa.string()),
            "block_key": pa.array([0] * len(na), pa.int64()),
        })
        out = NormPairScorer(cfg=cfg, state_ref=state)(tbl)
        sem = out["sem_sim"].to_numpy(zero_copy_only=False)
        rows.append({
            "rel_mode": mode,
            "pairs": len(na),
            "mean_sem_e6": int(round(float(sem.mean()) * 1e6)),
        })
    return pd.DataFrame(rows)


def _q_er_nil_accuracy(sf_dir: str):
    """Model-based NIL decision (K12, NILPredictor.java:26-62 analog):
    fit the calibrated logistic over the 4-feature vector on the hard
    tier's labeled x scored pairs, re-run the linkage with
    cfg.nil_model set (matched = P(match) >= 0.5 instead of the
    score threshold), and report (a) pairwise micro-F1 under the
    model decision and (b) NIL accuracy proper — the fraction of
    gold-NIL mentions (synth's no-entity turns, entity_id == 'NIL'
    in expected_clusters) left as singletons by the model-decided
    clustering."""
    import pandas as pd

    from wned_ray.functions.fusion import fit_nil_model
    from wned_ray.pipelines.link import run_linkage
    from wned_ray.stages.evaluate import pairwise_metrics

    corpus, cfg, out = _hard_linkage()
    labels_df = _rd().read_parquet(corpus["labels"]).to_pandas()
    scores_df = out["scores"].to_pandas()
    d = labels_df.merge(
        scores_df[["id_a", "id_b", "prior", "local", "sem_sim",
                   "name_sim"]], on=["id_a", "id_b"], how="inner")
    model = fit_nil_model(
        d[["prior", "local", "sem_sim", "name_sim"]].to_numpy(),
        d["is_match"].to_numpy())
    from dataclasses import replace
    nil_cfg = replace(cfg, nil_model=model)
    rerun = run_linkage(corpus["transcripts"], corpus["aliases"],
                        corpus["graph_edges"], nil_cfg,
                        redirects_path=corpus.get("redirects"))
    m = pairwise_metrics(_rd().read_parquet(corpus["labels"]),
                         rerun["clusters"])
    exp = _rd().read_parquet(corpus["expected_clusters"]).to_pandas()
    got = rerun["clusters"].to_pandas()
    sizes = got.groupby("cluster_id")["mention_id"].transform("size")
    got["singleton"] = sizes == 1
    nil = exp[exp["entity_id"] == "NIL"].merge(
        got[["mention_id", "singleton"]], on="mention_id", how="left")
    # gold-NIL turns have no mention surface, so absence from the
    # clustering output also counts as (vacuously) singleton
    nil_ok = nil["singleton"].fillna(True).mean() if len(nil) else 1.0
    return pd.DataFrame([{
        "train_pairs": len(d),
        "micro_f1_e6": int(round(m["micro_f1"] * 1e6)),
        "gold_nil_mentions": len(nil),
        "nil_singleton_rate_e6": int(round(float(nil_ok) * 1e6)),
    }])


def _q_er_increment(sf_dir: str):
    """Incremental linkage gate (pipelines/increment.py): split the tier
    corpus 80/10/10 by conversation, link the base, then CHAIN two
    increments (each consumes the previous call's merged ``state`` — the
    append-mostly usage) and compare the final merged assignment against
    a full rerun of the whole corpus. ``agree_rate_e6`` must be
    1_000_000 (exact equivalence; global_promote off — the one
    documented divergence is the corpus-wide promotion pass)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from wned_ray.config import PipelineConfig
    from wned_ray.pipelines.increment import run_linkage_increment
    from wned_ray.pipelines.link import run_linkage

    corpus = _corpus_for(sf_dir)
    cfg = PipelineConfig(global_promote=False)

    t = pq.read_table(corpus["transcripts"])
    convs = sorted(set(t["conv_id"].to_pylist()))
    n = len(convs)
    cuts = [0, max(1, int(n * 0.8)), max(2, int(n * 0.9)), n]
    split_dir = os.path.join(
        "/tmp/wned_ray_fixtures",
        f"incchain_{os.path.basename(corpus['transcripts']).split('.')[0]}"
        f"_{t.num_rows}")
    os.makedirs(split_dir, exist_ok=True)
    parts = []
    for i in range(3):
        cset = pa.array(convs[cuts[i]:cuts[i + 1]])
        p = os.path.join(split_dir, f"part{i}.parquet")
        pq.write_table(
            t.filter(pc.is_in(t["conv_id"], value_set=cset)), p)
        parts.append(p)

    full = run_linkage(corpus["transcripts"], corpus["aliases"],
                       corpus["graph_edges"], cfg,
                       redirects_path=corpus.get("redirects"))
    state = run_linkage(parts[0], corpus["aliases"],
                        corpus["graph_edges"], cfg,
                        redirects_path=corpus.get("redirects"))
    delta_mentions = scored_pairs = 0
    for p in parts[1:]:
        inc = run_linkage_increment(state, p, corpus["aliases"],
                                    corpus["graph_edges"], cfg,
                                    redirects_path=corpus.get("redirects"))
        delta_mentions += int(inc["prepared"].count())
        scored_pairs += int(inc["scores"].count())
        state = inc["state"]

    got = state["clusters"].to_pandas()
    want = full["clusters"].to_pandas()
    merged = got.merge(want, on="mention_id", suffixes=("_inc", "_full"))
    agree = (merged["cluster_id_inc"] == merged["cluster_id_full"]).mean()
    return pd.DataFrame([{
        "mentions": len(want),
        "chained_deltas": 2,
        "delta_mentions": delta_mentions,
        "scored_pairs": scored_pairs,
        "agree_rate_e6": int(round(agree * 1_000_000)),
    }])


def _q_alias_redirect_resolved(sf_dir: str):
    """J6/A4: redirect composition over the alias dim table (the Ray
    Dataset twin of the dim-table path used inside run_linkage)."""
    from wned_ray.stages.aliases import resolve_redirects

    corpus = _corpus_for(sf_dir)
    aliases = _rd().read_parquet(corpus["aliases"])
    redirects = _rd().read_parquet(corpus["redirects"])
    return resolve_redirects(aliases, redirects, num_partitions=8)


def _q_sessionize_events(sf_dir: str):
    """Gap-based sessionization over the events stream (windowed
    per-key operator: one hash shuffle + vectorized per-group diff)."""
    from wned_ray.pipelines.datawork import sessionize

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts"])
    return sessionize(ds, gap_minutes=30.0)


def _q_asof_click_before_purchase(sf_dir: str):
    """Backward as-of join: each purchase event joined to the same user's
    latest strictly-earlier click (custom operator — tag + union + one
    hash shuffle + vectorized per-group merge)."""
    from wned_ray.pipelines.datawork import asof_join

    # two pushdown reads beat one shared read: both branches of a shared
    # lazy Dataset re-execute the full scan anyway, and the read-level
    # filter prunes row groups before any bytes leave storage
    import pyarrow.dataset as pads

    cols = ["event_id", "user_id", "ts", "event_type"]
    purchases = _rd().read_parquet(
        f"{sf_dir}/events.parquet", columns=cols,
        filter=(pads.field("event_type") == "purchase"))
    clicks = _rd().read_parquet(
        f"{sf_dir}/events.parquet", columns=cols,
        filter=(pads.field("event_type") == "click"))
    return asof_join(purchases, clicks, key_col="user_id", ts_col="ts",
                     id_col="event_id", out_col="prev_click_id")


def _q_range_join_clicks(sf_dir: str):
    """Range (interval) join: per purchase, count the same user's clicks
    in the preceding hour (custom operator — tag + union + one hash
    shuffle + per-group vectorized searchsorted sweep)."""
    from wned_ray.pipelines.datawork import range_join_count

    import pyarrow.dataset as pads

    cols = ["event_id", "user_id", "ts", "event_type"]
    purchases = _rd().read_parquet(
        f"{sf_dir}/events.parquet", columns=cols,
        filter=(pads.field("event_type") == "purchase"))
    clicks = _rd().read_parquet(
        f"{sf_dir}/events.parquet", columns=cols,
        filter=(pads.field("event_type") == "click"))
    return range_join_count(purchases, clicks, key_col="user_id",
                            ts_col="ts", id_col="event_id",
                            lo_minutes=60.0, hi_minutes=0.0,
                            out_col="n_clicks_1h")


def _q_windowed_events(sf_dir: str):
    """Tumbling-window aggregate (6h windows): vectorized epoch-bucket
    assignment with a per-batch Arrow combiner, then ONE groupby shuffle
    sized |keys x windows|, not |events|."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from wned_ray.pipelines.datawork import windowed_aggregate

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type", "value"])
    agg = windowed_aggregate(ds, window_minutes=360.0)

    def r(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "window_start": batch["window_start"],
            "n_events": batch["n_events"],
            "sum_value_e2": pc.cast(
                pc.round(pc.multiply(batch["sum_value"], 100.0)), pa.int64()),
        })

    return agg.map_batches(r, batch_format="pyarrow")


def _q_sliding_window_events(sf_dir: str):
    """SLIDING-window aggregate (6h windows every 1h): vectorized
    per-event window explode + per-batch Arrow combiner, then ONE groupby
    shuffle sized |keys x windows|."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from wned_ray.pipelines.datawork import sliding_window_aggregate

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type", "value"])
    agg = sliding_window_aggregate(ds, width_minutes=360.0,
                                   step_minutes=60.0)

    def r(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "window_start": batch["window_start"],
            "n_events": batch["n_events"],
            "sum_value_e2": pc.cast(
                pc.round(pc.multiply(batch["sum_value"], 100.0)), pa.int64()),
        })

    return agg.map_batches(r, batch_format="pyarrow")


def _q_hash_sample_docs(sf_dir: str):
    """Deterministic hash sampling (10% of documents, seed 7): pure
    function of (id, seed), so re-runs and the SQL twin agree exactly."""
    from wned_ray.pipelines.datawork import hash_sample

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang", "n_chars"])
    return hash_sample(ds, id_col="doc_id", rate_pct=10.0, seed=7)


def _q_stratified_sample_docs(sf_dir: str):
    """Deterministic stratified sample: 10 docs per lang with the
    smallest Knuth id-hash — the row_number()-OVER SQL twin agrees on
    the exact rows."""
    from wned_ray.pipelines.datawork import stratified_sample_k

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang", "n_chars"])
    return stratified_sample_k(ds, key_col="lang", id_col="doc_id",
                               k=10, seed=7)


def _q_bm25_docs(sf_dir: str):
    """Okapi BM25 top-20 over documents for a fixed term query —
    shuffle-free two-pass ranking (dim-sized stats exchange only)."""
    from wned_ray.pipelines.datawork import bm25_topk

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return bm25_topk(ds, ["hash", "join", "vector", "stream"], k=20)


def _q_corr_lineitem(sf_dir: str):
    """Per-returnflag Pearson corr(quantity, extendedprice) via the
    six-sums combiner — one dim-sized exchange, input never shuffled."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from wned_ray.pipelines.datawork import grouped_corr

    ds = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_returnflag", "l_quantity",
                                     "l_extendedprice"])
    out = grouped_corr(ds, "l_returnflag", "l_quantity", "l_extendedprice")

    def e6(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "n": batch["n"],
            "corr_e6": pc.cast(pc.round(pc.multiply(batch["corr"],
                                                    1_000_000.0)),
                               pa.int64()),
        })

    return out.map_batches(e6, batch_format="pyarrow")


def _q_rollup_events(sf_dir: str):
    """GROUP BY ROLLUP(event_type, user_id): one finest-grain shuffle,
    coarser levels re-aggregated from the dim-sized finest result."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from wned_ray.pipelines.datawork import rollup_aggregate

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id", "value"])
    out = rollup_aggregate(ds, keys=["event_type", "user_id"])

    def r(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "user_id": batch["user_id"],
            "n_events": batch["n_events"],
            "sum_value_e2": pc.cast(
                pc.round(pc.multiply(batch["sum_value"], 100.0)), pa.int64()),
        })

    return out.map_batches(r, batch_format="pyarrow")


def _q_cube_events(sf_dir: str):
    """GROUP BY CUBE(event_type, user_id): all key subsets from ONE
    finest-grain shuffle + dim-sized re-aggregation."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from wned_ray.pipelines.datawork import cube_aggregate

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id", "value"])
    out = cube_aggregate(ds, keys=["event_type", "user_id"])

    def r(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "user_id": batch["user_id"],
            "n_events": batch["n_events"],
            "sum_value_e2": pc.cast(
                pc.round(pc.multiply(batch["sum_value"], 100.0)), pa.int64()),
        })

    return out.map_batches(r, batch_format="pyarrow")


def _q_pivot_events(sf_dir: str):
    """PIVOT: per-user counts, one column per event type (the SQL
    count-FILTER shape; fixed value list keeps the schema static)."""
    from wned_ray.pipelines.datawork import pivot_counts

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])
    return pivot_counts(ds, key_col="user_id", pivot_col="event_type",
                        values=["click", "view", "purchase", "signup", "error"])


def _q_row_numbers(sf_dir: str):
    """ROW_NUMBER() OVER (PARTITION BY user ORDER BY ts, id)."""
    from wned_ray.pipelines.datawork import row_numbers

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts"])
    return row_numbers(ds)


def _q_hll_distinct_terms(sf_dir: str):
    """Approximate distinct-term count via mergeable HyperLogLog register
    blobs (values never leave the workers), shipped NEXT TO the exact
    distributed distinct count. Fully SQL-oracled: hash_mode='md5' makes
    the registers (and hence the estimate) bit-reproducible in DuckDB —
    first 8 md5 bytes, p=12, small/large-range corrections included —
    so the driver value-hash checks the sketch itself, not just rows
    (round-3 VERDICT task 3)."""
    import pandas as pd
    import pyarrow as pa

    from wned_ray.pipelines.datawork import (_tokenize_lower, distinct_count,
                                             hll_count_distinct)

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def toks(batch: pa.Table) -> pa.Table:
        flat, _ = _tokenize_lower(batch["text"])
        return pa.table({"term": flat})

    terms = ds.map_batches(toks, batch_format="pyarrow")
    est = hll_count_distinct(terms, "term", hash_mode="md5")
    exact = distinct_count(terms, "term")
    return pd.DataFrame([{"estimate_int": int(round(est["estimate"])),
                          "exact_int": int(exact), "p": est["p"]}])


def _q_full_outer_join(sf_dir: str):
    """Native FULL OUTER hash join (Dataset.join join_type='full_outer')
    with unmatched rows on BOTH sides (high-value orders vs low-balance
    customers), classified per row and reduced to one checkable summary
    — n_both / n_left_only / n_right_only plus value sums per class."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    orders = (_rd().read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_custkey", "o_totalprice"])
              .filter(expr="o_totalprice > 420000.0")
              .groupby("o_custkey")
              .aggregate(Sum("o_totalprice", alias_name="big_total")))
    cust = (_rd().read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey", "c_acctbal"])
            .filter(expr="c_acctbal < 1000.0"))

    def ren(batch: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": batch["c_custkey"],
                         "c_acctbal": batch["c_acctbal"]})

    j = orders.join(cust.map_batches(ren, batch_format="pyarrow"),
                    join_type="full_outer", num_partitions=8,
                    on=("o_custkey",))

    def classify(batch: pa.Table) -> pa.Table:
        has_l = pc.is_valid(batch["big_total"])
        has_r = pc.is_valid(batch["c_acctbal"])
        both = pc.and_(has_l, has_r)
        lo = pc.and_(has_l, pc.invert(has_r))
        ro = pc.and_(pc.invert(has_l), has_r)

        def n(m):
            return pa.array([pc.sum(pc.cast(m, pa.int64())).as_py() or 0],
                            pa.int64())

        tot = pc.if_else(has_l, batch["big_total"], pa.scalar(0.0))
        return pa.table({
            "n_both": n(both), "n_left_only": n(lo), "n_right_only": n(ro),
            "left_total": pa.array([pc.sum(tot).as_py() or 0.0],
                                   pa.float64()),
        })

    agg = (j.map_batches(classify, batch_format="pyarrow")
           .aggregate(Sum("n_both", alias_name="n_both"),
                      Sum("n_left_only", alias_name="n_left_only"),
                      Sum("n_right_only", alias_name="n_right_only"),
                      Sum("left_total", alias_name="left_total")))
    import pandas as pd

    # round the TOTAL once (whole dollars) — per-batch rounding would be
    # irreproducible in the SQL twin
    return pd.DataFrame([{
        "n_both": int(agg["n_both"]),
        "n_left_only": int(agg["n_left_only"]),
        "n_right_only": int(agg["n_right_only"]),
        "left_total_usd": int(round(agg["left_total"])),
    }])


def _q_scrub_pii_docs(sf_dir: str):
    """PII redaction (email / IPv4 / SSN / phone-run → typed tokens) with
    per-category counts — datawork.scrub_pii. Arrow and DuckDB both run
    RE2, so the oracle twin (generated from the SAME pattern list,
    staged identically) is byte-identical on the scrubbed text."""
    from wned_ray.pipelines.datawork import scrub_pii

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return scrub_pii(ds, id_col="doc_id")


def _pii_oracle_sql() -> str:
    """Staged-CTE twin of scrub_pii, generated from _PII_PATTERNS so the
    two can never drift: each category is counted on the PREVIOUS
    stage's text, exactly as the Ray kernel does."""
    from wned_ray.pipelines.datawork import _PII_PATTERNS

    inner = "SELECT doc_id, text AS t FROM documents"
    done: list = []
    for name, pat, tok in _PII_PATTERNS:
        carry = ", ".join(["doc_id"] + [f"n_{x}" for x in done])
        inner = (f"SELECT {carry}, "
                 f"length(regexp_extract_all(t, '{pat}')) AS n_{name}, "
                 f"regexp_replace(t, '{pat}', '{tok}', 'g') AS t "
                 f"FROM ({inner})")
        done.append(name)
    cnts = ", ".join(f"n_{x}" for x in done)
    return f"SELECT doc_id, t AS text_scrubbed, {cnts} FROM ({inner})"


def _q_weighted_sample_docs(sf_dir: str):
    """Weighted sampling without replacement (Efraimidis–Spirakis),
    inclusion probability ∝ n_chars, hash-derived uniforms — the
    selection is a pure function of (doc_id, seed) and bit-reproducible
    in DuckDB, so the exact 64-row sample is value-hash oracled."""
    from wned_ray.pipelines.datawork import weighted_sample_k

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "n_chars"])
    return weighted_sample_k(ds, id_col="doc_id", weight_col="n_chars",
                             k=64, seed=0)


def _q_quantile_sketch_events(sf_dir: str):
    """Per-event-type APPROXIMATE value quantiles via mergeable t-digest
    centroid blobs (datawork.group_quantile_sketch — the scale path for
    keys whose history outgrows a worker), shipped NEXT TO the exact
    per-key quantiles so the error is visible in the row. Rows-only: the
    clustering isn't SQL-expressible; the q(1−q) rank-error bound is
    pytest-gated (tests/test_tdigest.py) and estimates are
    deterministic (canonical one-shot re-cluster merge)."""
    from wned_ray.pipelines.datawork import (group_quantile_sketch,
                                             group_quantiles)

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])
    sk = (group_quantile_sketch(ds, "event_type", "value")
          .to_pandas().rename(columns={"value_e4": "est_e4"}))
    ex = (group_quantiles(ds, "event_type", "value")
          .to_pandas().rename(columns={"value_e4": "exact_e4"}))
    out = (sk.merge(ex, on=["event_type", "quantile"])
           .sort_values(["event_type", "quantile"]).reset_index(drop=True))
    return out


def _q_salted_join_orders(sf_dir: str):
    """The SAME orders⨝customer aggregate as join_orders_customers, but
    through datawork.salted_join — the skew-resilient distributed hash
    join (per-row fact salt, dim replicated per salt, exchange keyed on
    (key, salt)) for when the dim side is too big to broadcast and the
    fact keys are Zipf-skewed. Identical oracle SQL: the salting must be
    invisible in the result."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum
    from wned_ray.pipelines.datawork import salted_join

    orders = _rd().read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_totalprice"])
    cust = _rd().read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_mktsegment"])

    def ren(batch: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": batch["c_custkey"],
                         "c_mktsegment": batch["c_mktsegment"]})

    joined = salted_join(orders, cust.map_batches(ren,
                                                  batch_format="pyarrow"),
                         on="o_custkey", salt=4, num_partitions=8)
    out = (joined.groupby("c_mktsegment")
           .aggregate(Count(alias_name="n_orders"),
                      Sum("o_totalprice", alias_name="total_price")))

    def r(batch: pa.Table) -> pa.Table:
        usd = pc.cast(pc.round(batch["total_price"]), pa.int64())
        return (batch.drop(["total_price"])
                .append_column("total_price_usd", usd))

    return out.map_batches(r, batch_format="pyarrow")


def _q_hll_group_distinct(sf_dir: str):
    """Per-group approximate COUNT(DISTINCT user_id) GROUP BY event_type
    via mergeable HyperLogLog register strips (datawork.
    hll_group_distinct) — the sketch GROUP BY shape: each batch ships one
    4 KB register blob per key present, never the values. md5 hash mode
    keeps the per-group registers (and hence estimates) bit-reproducible
    in DuckDB, and the exact per-group distinct rides along, so both
    columns are value-hash checkable."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from wned_ray.pipelines.datawork import hll_group_distinct

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id"])

    def as_str(batch: pa.Table) -> pa.Table:
        return pa.table({"event_type": batch["event_type"],
                         "u": pc.cast(batch["user_id"], pa.string())})

    sds = ds.map_batches(as_str, batch_format="pyarrow")
    est = hll_group_distinct(sds, "event_type", "u", hash_mode="md5")

    def uniq_pairs(batch: pa.Table) -> pa.Table:
        return batch.group_by(["event_type", "u"]).aggregate([])

    exact = (sds.map_batches(uniq_pairs, batch_format="pyarrow")
             .groupby(["event_type", "u"]).count()
             .groupby("event_type").count())

    e1 = est.to_pandas()                       # dim-sized (n event types)
    e2 = exact.to_pandas().rename(columns={"count()": "exact_int"})
    out = (e1.merge(e2[["event_type", "exact_int"]], on="event_type")
           .sort_values("event_type").reset_index(drop=True))
    out["exact_int"] = out["exact_int"].astype("int64")
    out["p"] = 12
    return pd.DataFrame(out)


def _q_curated_docs(sf_dir: str):
    """Full corpus-curation flow (lang filter -> quality filter -> exact
    dedup -> MinHash near-dup removal -> lang-partitioned parquet).
    Rows-only: the MinHash stage is not SQL-expressible; its building
    blocks each have their own oracle."""
    import os
    import shutil

    from wned_ray.pipelines.curate import curate_corpus

    out_dir = os.path.join("/tmp/wned_curated",
                           os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(out_dir, ignore_errors=True)
    curate_corpus(f"{sf_dir}/documents.parquet", out_dir,
                  lang_keep=("en", "de", "fr"), min_tokens=5,
                  max_punct_ratio=0.2, jaccard_threshold=0.8,
                  num_partitions=8)
    return (_rd().read_parquet(out_dir)
            .select_columns(["doc_id", "lang_pred"]))


def _q_curated_docs_sql(sf_dir: str):
    """SQL-expressible slice of the curation funnel (round-3 VERDICT
    task 10): quality thresholds (min tokens, max punct ratio) + exact
    dedup keep-min — the same stages ``pipelines/curate.py`` composes,
    minus the heuristic lang-id and approximate MinHash steps, so the
    driver can value-hash-check the curation plumbing end to end."""
    from wned_ray.pipelines.datawork import (bloom_semi_join, exact_dedup,
                                             quality_scores)

    docs = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])
    good = (quality_scores(docs)
            .filter(expr="n_tokens >= 5 and punct_ratio <= 0.2")
            .select_columns(["doc_id", "text", "n_tokens"]))
    keeps = exact_dedup(good, id_col="doc_id")
    kept = bloom_semi_join(good, keeps, on="doc_id", key_col="keep_id",
                           num_partitions=8)
    return kept.select_columns(["doc_id", "n_tokens"])


def _q_bloom_semi_join_orders(sf_dir: str):
    """Bloom-pushdown semi-join: orders of BUILDING-segment customers.
    The filter is built distributed from the key side and pre-filters
    order batches before the hash-shuffle join (exact result — false
    positives die in the join)."""
    from wned_ray.pipelines.datawork import bloom_semi_join

    import pyarrow.dataset as pads

    orders = _rd().read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
    cust = _rd().read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        filter=(pads.field("c_mktsegment") == "BUILDING"))
    return bloom_semi_join(orders, cust, on="o_custkey",
                           key_col="c_custkey", num_partitions=8)


def _q_window_funcs_events(sf_dir: str):
    """Per-user ordered window functions (running sum, lag, lead,
    first_value, dense_rank over value DESC, ntile(4)) — the ANSI
    window-frame family: one hash shuffle + vectorized sort/cumsum/shift
    per group."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from wned_ray.pipelines.datawork import ordered_window_funcs

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts", "value"])
    out = ordered_window_funcs(ds)

    def r(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "cum_value_e2": pc.cast(
                pc.round(pc.multiply(batch["cum_value"], 100.0)), pa.int64()),
            "prev_id": batch["prev_id"],
            "next_id": batch["next_id"],
            "first_id": batch["first_id"],
            "dense_rank_value": batch["dense_rank_value"],
            "tile": batch["tile"],
        })

    return out.map_batches(r, batch_format="pyarrow")


def _q_heavy_hitter_terms(sf_dir: str):
    """Exact heavy-hitter terms via a mergeable Misra-Gries sketch plus
    an exact verify pass over the sketch's candidate superset — bounded
    shuffle state regardless of vocabulary size."""
    from wned_ray.pipelines.datawork import heavy_hitter_terms

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["text"])
    return heavy_hitter_terms(ds, k=8192, min_freq=100)


def _q_event_value_quantiles(sf_dir: str):
    """Per-key exact quantiles (quantile_cont semantics) over the event
    value stream: one hash shuffle + one vectorized np.quantile per key."""
    from wned_ray.pipelines.datawork import group_quantiles

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])
    return group_quantiles(ds, key_col="event_type", val_col="value",
                           qs=(0.25, 0.5, 0.9, 0.99))


def _q_anchor_aliases(sf_dir: str):
    """M3/M5: mine (entity, alias, freq) rows from [[target|anchor]] wiki
    markup in the corpus transcripts (KBExtractor's anchor-text alias
    source). Rows-only check (the transcripts table is not a DuckDB view);
    the mined-pairs-subset-of-dim-aliases invariant is unit-tested."""
    from wned_ray.stages.aliases import mine_anchor_aliases

    corpus = _corpus_for(sf_dir)
    return mine_anchor_aliases(
        _rd().read_parquet(corpus["transcripts"], columns=["text"]))


def _q_minhash_dedup(sf_dir: str):
    from wned_ray.pipelines.datawork import minhash_candidates, verify_jaccard

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    cands = minhash_candidates(ds, id_col="doc_id", num_partitions=8)
    return verify_jaccard(cands, ds, id_col="doc_id", threshold=0.9,
                          num_partitions=8).select_columns(["id_a", "id_b"])


def _q_ngram_jaccard_dedup(sf_dir: str):
    """Exact all-pairs word-trigram Jaccard near-dups — the SQL-oracled
    member of the dedup family (minhash/simhash are its approximations)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from wned_ray.pipelines.datawork import ngram_jaccard_dedup

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = ngram_jaccard_dedup(ds, id_col="doc_id", n=3, threshold=0.8,
                              num_partitions=8)

    def micro(batch: pa.Table) -> pa.Table:
        return pa.table({
            "id_a": batch["id_a"], "id_b": batch["id_b"],
            "jaccard_micro": pc.cast(
                pc.round(pc.multiply(batch["jaccard"], 1_000_000.0)),
                pa.int64()),
        })

    return out.map_batches(micro, batch_format="pyarrow").sort(["id_a", "id_b"])


def _q_simhash(sf_dir: str):
    from wned_ray.pipelines.datawork import simhash

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return simhash(ds, id_col="doc_id")


def _q_simhash_dups(sf_dir: str):
    """Banded simhash near-dup pairs (Manku-style, Hamming <= 3) — the
    band groupby/join on simhash-derived keys is the caller shape the
    int63 key masking exists for."""
    from wned_ray.pipelines.datawork import simhash_near_dup

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return simhash_near_dup(ds, id_col="doc_id")


def _q_fingerprint(sf_dir: str):
    from wned_ray.pipelines.datawork import fingerprint

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return fingerprint(ds, id_col="doc_id")


def _q_lang_id(sf_dir: str):
    from wned_ray.pipelines.datawork import lang_id

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "lang"])
    return lang_id(ds).select_columns(["doc_id", "lang", "lang_pred"])


def _q_ann_lsh(sf_dir: str):
    """LSH-bucketed ANN (scale path next to brute-force knn_embeddings);
    rows-only check — approximate by construction."""
    import pyarrow.parquet as pq

    from wned_ray.pipelines.datawork import ann_lsh

    ds = _rd().read_parquet(f"{sf_dir}/embeddings.parquet")
    head = pq.read_table(f"{sf_dir}/embeddings.parquet").slice(0, 3)
    q_ids = np.asarray(head["vec_id"].to_pylist())
    qm = np.asarray(head["embedding"].to_pylist(), dtype=np.float64)
    return ann_lsh(ds, q_ids, qm, k=5).select_columns(
        ["query_id", "vec_id"])


def _q_ann_ivf(sf_dir: str):
    """IVF (k-means coarse quantizer) ANN — the second scale path;
    rows-only check — approximate by construction, unit-tested for
    recall vs brute force on clustered data."""
    import pyarrow.parquet as pq

    from wned_ray.pipelines.datawork import ann_ivf

    ds = _rd().read_parquet(f"{sf_dir}/embeddings.parquet")
    head = pq.read_table(f"{sf_dir}/embeddings.parquet").slice(0, 3)
    q_ids = np.asarray(head["vec_id"].to_pylist())
    qm = np.asarray(head["embedding"].to_pylist(), dtype=np.float64)
    return ann_ivf(ds, q_ids, qm, k=5).select_columns(
        ["query_id", "vec_id"])


def _q_ann_pq(sf_dir: str):
    """Product-quantization ANN (ADC lookup-table scan + in-batch exact
    rerank) — the third scale path; rows-only check — approximate by
    construction, unit-tested for recall vs brute force."""
    import pyarrow.parquet as pq

    from wned_ray.pipelines.datawork import ann_pq

    ds = _rd().read_parquet(f"{sf_dir}/embeddings.parquet")
    head = pq.read_table(f"{sf_dir}/embeddings.parquet").slice(0, 3)
    q_ids = np.asarray(head["vec_id"].to_pylist())
    qm = np.asarray(head["embedding"].to_pylist(), dtype=np.float64)
    return ann_pq(ds, q_ids, qm, k=5).select_columns(
        ["query_id", "vec_id"])


def _q_ann_embeddings(sf_dir: str):
    """All three ANN scale paths (LSH multiprobe + IVF + PQ) in one
    registered query, tagged by ``method`` — consolidates rows-only
    entries so more of the query surface fits inside the driver's
    50-entry sweep window; each path keeps its own recall unit tests.
    The pipelines run SEQUENTIALLY and concat driver-side (results are
    top-k-sized); a lazy union would co-schedule the actor pools and
    can deadlock on a small CPU budget."""
    import pandas as pd

    lsh = _q_ann_lsh(sf_dir).to_pandas()
    ivf = _q_ann_ivf(sf_dir).to_pandas()
    pq_ = _q_ann_pq(sf_dir).to_pandas()
    lsh["method"] = "lsh"
    ivf["method"] = "ivf"
    pq_["method"] = "pq"
    return pd.concat([lsh, ivf, pq_], ignore_index=True)


def _q_embedding_near_dup(sf_dir: str):
    """Exact brute-force variant (oracle-checkable vs DuckDB
    list_cosine_similarity); the LSH-bucketed scale path is unit-tested
    against this one on planted near-dups. The testdata embeddings are
    near-orthogonal (max pairwise cosine ~0.51), so the threshold sits at
    0.4 to actually exercise the pair path. Only the id pair is emitted —
    cosine values differ between numpy and DuckDB in the last ulps."""
    from wned_ray.pipelines.datawork import embedding_near_dup

    ds = _rd().read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    return (embedding_near_dup(ds, threshold=0.4, method="exact")
            .select_columns(["id_a", "id_b"]))


def _q_media_features(sf_dir: str):
    """Multimodal plumbing: documents' bytes as opaque payloads through the
    actor-pool decode stub."""
    import pyarrow as pa

    from wned_ray.pipelines.datawork import decode_media

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def to_payload(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "media_id": batch["doc_id"],
            "payload": pc.cast(batch["text"], pa.binary()),
            "kind": pa.array(["text"] * batch.num_rows),
        })

    media = ds.map_batches(to_payload, batch_format="pyarrow")
    out = decode_media(media, feature_dim=8)
    return out.select_columns(["media_id", "kind", "feature_dim"])


def _q_media_resize_frames(sf_dir: str):
    """REAL image resize + frame sampling (the brief's resize /
    frame-sample media stages): synthesize a deterministic per-doc
    multi-frame PNM stream (pixel values keyed by doc_id; the codec-free
    video analog), sample every 2nd frame, nearest-neighbor resize each
    kept frame to 4x4, and re-decode the resized bytes through the PNM
    feature extractor to prove the re-encoded payloads are valid.
    Rows-only (binary media is not SQL-expressible); exact-pixel
    assertions live in test_media_resize_and_frame_sample."""
    import numpy as np
    import pyarrow as pa

    from wned_ray.pipelines.datawork import (decode_media, resize_media,
                                             sample_frames)

    ds = (_rd().read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"]).limit(64))

    def to_stream(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        payloads = []
        for d in ids:
            frames = []
            for f in range(5):                 # 5 frames of 8x8 RGB
                v = (d * 31 + f * 7) % 256
                px = np.full((8, 8, 3), v, np.uint8)
                frames.append(b"P6\n8 8\n255\n" + px.tobytes())
            payloads.append(b"".join(frames))
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "payload": pa.array(payloads, pa.binary())})

    stream = ds.map_batches(to_stream, batch_format="pyarrow")
    kept = sample_frames(stream, every_n=2)     # frames 0, 2, 4

    def as_media(batch: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": batch["media_id"],
            "frame_idx": batch["frame_idx"],
            "payload": batch["frame"],
        })

    resized = resize_media(kept.map_batches(as_media,
                                            batch_format="pyarrow"),
                           out_w=4, out_h=4)

    def with_kind(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "kind", pa.array(["image"] * batch.num_rows))

    feats = decode_media(resized.map_batches(with_kind,
                                             batch_format="pyarrow"),
                         feature_dim=8, fake=False)
    return feats.select_columns(["media_id", "kind", "feature_dim"])


def _q_media_wav_features(sf_dir: str):
    """REAL multimodal decode (not the fake path): synthesize a
    deterministic per-doc WAV payload (stdlib wave; tone frequency keyed
    by doc_id) and extract physical audio features — duration, rate,
    RMS, peak, zero-crossing rate — through the actor-pool stage with
    fake=False."""
    import io
    import wave

    import numpy as np
    import pyarrow as pa

    from wned_ray.pipelines.datawork import decode_media

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])

    def to_wav(batch: pa.Table) -> pa.Table:
        payloads = []
        for did in batch["doc_id"].to_pylist():
            sr = 4000
            freq = 200 + (int(did) % 17) * 50
            t = np.arange(sr // 4) / sr           # 0.25 s tone
            pcm = (np.sin(2 * np.pi * freq * t) * 16383).astype(np.int16)
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sr)
                w.writeframes(pcm.tobytes())
            payloads.append(buf.getvalue())
        return pa.table({"media_id": batch["doc_id"],
                         "payload": pa.array(payloads, pa.binary()),
                         "kind": pa.array(["audio"] * batch.num_rows)})

    media = ds.map_batches(to_wav, batch_format="pyarrow")
    out = decode_media(media, feature_dim=8, fake=False)

    def project(batch):
        import pandas as pd

        f = np.stack([np.asarray(x) for x in batch["features"]])
        return pd.DataFrame({
            "media_id": batch["media_id"],
            "duration_e3": np.round(f[:, 0] * 1000).astype("int64"),
            "rms_e4": np.round(f[:, 3] * 10000).astype("int64"),
            "zcr_e4": np.round(f[:, 5] * 10000).astype("int64"),
        })

    return out.map_batches(project, batch_format="pandas")


def _q_multiway_join_revenue(sf_dir: str):
    """TPC-H Q5-shaped 5-table join: lineitem ⋈ orders via the native
    distributed hash join (both sides fact-sized), customer / supplier /
    nation-region as broadcast probe LUTs (dim-sized, shipped once via
    ``ray.put``), revenue per nation for one region + date window with
    the Q5 local-supplier predicate (supplier nation == customer
    nation). The planning shape IS the point: two big tables meet in
    ONE shuffle; every dim rides along as a broadcast."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from ray.data.aggregate import Sum

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    asia = reg.filter(pc.equal(reg["r_name"], "ASIA"))["r_regionkey"]
    nat_asia = nat.filter(pc.is_in(nat["n_regionkey"], value_set=asia))
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    cust = cust.filter(pc.is_in(cust["c_nationkey"],
                                value_set=nat_asia["n_nationkey"]))
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    ref = ray.put((cust["c_custkey"].combine_chunks(),
                   pc.cast(cust["c_nationkey"], pa.int32()).combine_chunks(),
                   supp["s_suppkey"].combine_chunks(),
                   pc.cast(supp["s_nationkey"], pa.int32()).combine_chunks()))

    import datetime as _dt

    cutoff = pa.scalar(_dt.datetime(1998, 1, 1), pa.timestamp("us"))

    class OrderSide:
        def __init__(self):
            self.ckeys, self.cnat, _, _ = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            batch = batch.filter(pc.less(batch["o_orderdate"], cutoff))
            idx = pc.index_in(batch["o_custkey"], value_set=self.ckeys)
            t = pa.table({"o_orderkey": batch["o_orderkey"],
                          "c_nat": self.cnat.take(idx)})
            return t.filter(pc.is_valid(t["c_nat"]))   # region semi-join

    class LineSide:
        def __init__(self):
            _, _, self.skeys, self.snat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            idx = pc.index_in(batch["l_suppkey"], value_set=self.skeys)
            rev = pc.multiply(batch["l_extendedprice"],
                              pc.subtract(pa.scalar(1.0),
                                          batch["l_discount"]))
            return pa.table({"l_orderkey": batch["l_orderkey"],
                             "s_nat": self.snat.take(idx),
                             "revenue": rev})

    orders = (_rd().read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_orderkey", "o_custkey",
                                          "o_orderdate"])
              .map_batches(OrderSide, batch_format="pyarrow",
                           concurrency=2)
              .select_columns(["o_orderkey", "c_nat"]))
    line = (_rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_suppkey",
                                        "l_extendedprice", "l_discount"])
            .map_batches(LineSide, batch_format="pyarrow", concurrency=2))
    j = line.join(orders, join_type="inner", num_partitions=8,
                  on=("l_orderkey",), right_on=("o_orderkey",))

    nat_lut = ray.put((pc.cast(nat_asia["n_nationkey"],
                               pa.int32()).combine_chunks(),
                       nat_asia["n_name"].combine_chunks()))

    class Local:
        def __init__(self):
            self.nkeys, self.nnames = ray.get(nat_lut)

        def __call__(self, batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.equal(batch["c_nat"], batch["s_nat"]))
            idx = pc.index_in(t["c_nat"], value_set=self.nkeys)
            return pa.table({"n_name": self.nnames.take(idx),
                             "revenue": t["revenue"]})

    agg = (j.map_batches(Local, batch_format="pyarrow", concurrency=2)
           .groupby("n_name")
           .aggregate(Sum("revenue", alias_name="revenue")))

    def r(batch: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": batch["n_name"],
            "revenue_usd": pc.cast(pc.round(batch["revenue"]), pa.int64()),
        })

    return agg.map_batches(r, batch_format="pyarrow")


def _q_cross_join_nation_types(sf_dir: str):
    """CROSS JOIN with a broadcast small side (analytics
    .broadcast_cross_join): every nation × every distinct event type.
    The distinct side is computed distributed, collected dim-sized."""
    import pyarrow as pa

    from wned_ray.pipelines.analytics import broadcast_cross_join

    types = (_rd().read_parquet(f"{sf_dir}/events.parquet",
                                columns=["event_type"])
             .groupby("event_type").count()
             .select_columns(["event_type"]).take_all())   # dim-sized
    small = pa.table({"event_type":
                      pa.array(sorted(r["event_type"] for r in types))})
    ds = _rd().read_parquet(f"{sf_dir}/nation.parquet",
                            columns=["n_name"])
    return broadcast_cross_join(ds, small)


def _q_string_agg_sources(sf_dir: str):
    """Grouped string/list aggregation (analytics.string_agg_by_key):
    per language, the sorted distinct sources concatenated — ANSI
    ``string_agg(DISTINCT source, ',' ORDER BY source)``."""
    from wned_ray.pipelines.analytics import string_agg_by_key

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["lang", "source"])
    return string_agg_by_key(ds, "lang", "source", sep=",",
                             out_col="sources")


def _q_histogram_events(sf_dir: str):
    """Fixed-width histogram (analytics.histogram_fixed): 20 buckets of
    25.0 over event value, edge-clamped, zero counts included."""
    from wned_ray.pipelines.analytics import histogram_fixed

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    return histogram_fixed(ds, "value", lo=0.0, hi=500.0, nbins=20)


def _q_grouping_sets_events(sf_dir: str):
    """GROUP BY GROUPING SETS ((event_type, day), (day), ()) — the
    generalization rollup/cube now delegate to; this set list is
    neither a rollup nor a cube."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from wned_ray.pipelines.datawork import grouping_sets_aggregate

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts", "value"])

    def day(batch: pa.Table) -> pa.Table:
        d = pc.cast(pc.floor_temporal(batch["ts"], unit="day"), pa.date32())
        return pa.table({"event_type": batch["event_type"],
                         "day": pc.cast(d, pa.string()),
                         "value": batch["value"]})

    out = grouping_sets_aggregate(
        ds.map_batches(day, batch_format="pyarrow"),
        keys=["event_type", "day"],
        sets=[("event_type", "day"), ("day",), ()])

    def r(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"], "day": batch["day"],
            "n_events": batch["n_events"],
            "sum_value_e2": pc.cast(
                pc.round(pc.multiply(batch["sum_value"], 100.0)), pa.int64()),
        })

    return out.map_batches(r, batch_format="pyarrow")


def _q_explode_doc_terms(sf_dir: str):
    """Regex explode (analytics.explode_matches): one row per long-word
    match with its 1-based per-document position — SQL ``unnest`` +
    ``generate_subscripts``. The flatten is Arrow-offset-native."""
    from wned_ray.pipelines.analytics import explode_matches

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return explode_matches(ds, "doc_id", "text", r"[a-z]{7,}")


def _q_canonical_docs(sf_dir: str):
    """ER survivorship / golden records (analytics.golden_records):
    group by the 4-token blocking head key, elect min-id keep,
    longest-text representative, per-attribute mode — the canonical
    post-linkage step, SQL-oracled end to end."""
    from wned_ray.pipelines.analytics import golden_records

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "lang", "source"])
    return golden_records(ds)


def _q_kmeans_embeddings(sf_dir: str):
    """Distributed Lloyd's k-means over the embedding column
    (analytics.kmeans): seeded md5 init, broadcast centroids, per-batch
    partial-sum reduction. Deterministic — exactness vs a single-process
    numpy reference is pytest-gated (no tractable SQL twin)."""
    from wned_ray.pipelines.analytics import kmeans

    ds = _rd().read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    assign, _ = kmeans(ds, k=8, n_iter=5, seed=7)
    return assign


def _q_funnel_events(sf_dir: str):
    """Ordered funnel (analytics.funnel_counts): users completing
    view -> click -> purchase with each step strictly after the
    previous one's greedy-earliest completion."""
    from wned_ray.pipelines.analytics import funnel_counts

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])
    return funnel_counts(ds, steps=["view", "click", "purchase"])


def _q_cohort_retention(sf_dir: str):
    """Cohort retention (analytics.cohort_retention): distinct users
    active N weeks after their first-event week, per Monday-start
    cohort week."""
    from wned_ray.pipelines.analytics import cohort_retention

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])
    return cohort_retention(ds)


def _q_event_paths(sf_dir: str):
    """Per-(user, day) ordered event-type path counts
    (analytics.event_paths) — top-paths analysis over transcripts."""
    from wned_ray.pipelines.analytics import event_paths

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type",
                                     "event_id"])
    return event_paths(ds)


def _q_transition_counts(sf_dir: str):
    """First-order Markov transition edges over each user's ordered
    stream (analytics.transition_counts) — the reference's windowed
    co-occurrence edge extraction recast as an ordered-lag edge list."""
    from wned_ray.pipelines.analytics import transition_counts

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type",
                                     "event_id"])
    return transition_counts(ds)


def _q_unpivot_part(sf_dir: str):
    """UNPIVOT / melt (analytics.unpivot): one row per (part, numeric
    column), mixed int/double value columns cast to one float64."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from wned_ray.pipelines.analytics import unpivot

    ds = _rd().read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_size",
                                     "p_retailprice"])
    out = unpivot(ds, id_cols=["p_partkey"],
                  value_cols=["p_size", "p_retailprice"])

    def r(batch: pa.Table) -> pa.Table:
        return pa.table({
            "p_partkey": batch["p_partkey"], "name": batch["name"],
            "value_e2": pc.cast(pc.round(
                pc.multiply(batch["value"], 100.0)), pa.int64()),
        })

    return out.map_batches(r, batch_format="pyarrow")


def _q_decontaminate_docs(sf_dir: str):
    """Benchmark decontamination (datawork.decontaminate): eval set =
    docs with doc_id % 10 == 0, train = the rest; a train doc is
    contaminated when it shares any word 4-gram with the eval set. Eval
    grams broadcast once via ray.put; the train side is one stateless
    no-shuffle map."""
    import pyarrow as pa

    from wned_ray.pipelines.datawork import decontaminate

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def _mod10(is_eval: bool):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % 10 == 0) if is_eval else (ids % 10 != 0)
            return batch.filter(pa.array(m))
        return f

    train = ds.map_batches(_mod10(False), batch_format="pyarrow")
    ev = ds.map_batches(_mod10(True), batch_format="pyarrow")
    return (decontaminate(train, ev, n=4)
            .select_columns(["doc_id", "n_hit_grams", "contaminated"]))


def _q_repetition_docs(sf_dir: str):
    """Gopher-style repetition quality signals
    (datawork.repetition_signals): top-word / duplicate-word / top-2-gram
    fractions per doc, single stateless pass."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from wned_ray.pipelines.datawork import repetition_signals

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = repetition_signals(ds)

    def r(batch: pa.Table) -> pa.Table:
        cols = {"doc_id": batch["doc_id"], "n_tokens": batch["n_tokens"]}
        for c in ("top_word_frac", "dup_word_frac", "top_bigram_frac"):
            cols[c] = pc.round(batch[c], ndigits=_ROUND)
        return pa.table(cols)

    return out.map_batches(r, batch_format="pyarrow")


def _q_dup_span_docs(sf_dir: str):
    """Duplicated-span statistics (datawork.dup_span_stats): per doc, the
    count and fraction of its distinct word 5-grams appearing in more
    than one doc — the Lee et al. exact-substring-dedup signal."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from wned_ray.pipelines.datawork import dup_span_stats

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = dup_span_stats(ds, n=5)

    def r(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"], "n_grams": batch["n_grams"],
            "n_dup_grams": batch["n_dup_grams"],
            "dup_frac": pc.round(batch["dup_frac"], ndigits=_ROUND),
        })

    return out.map_batches(r, batch_format="pyarrow")


def _q_rolling_window_events(sf_dir: str):
    """Rolling ROWS-frame avg/max over each user's ordered events
    (datawork.rolling_window_agg, window=4) — the sliding-frame ANSI
    window shape; one key shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from wned_ray.pipelines.datawork import rolling_window_agg

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts", "value"])
    out = rolling_window_agg(ds, window=4)

    def r(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"], "user_id": batch["user_id"],
            "roll_avg": pc.round(batch["roll_avg"], ndigits=_ROUND),
            "roll_max": pc.round(batch["roll_max"], ndigits=_ROUND),
        })

    return out.map_batches(r, batch_format="pyarrow")


def _q_bpe_token_count_docs(sf_dir: str):
    """Whitespace + BPE-ish (GPT-2-style pre-tokenizer regex) token
    counts per doc (datawork.bpe_token_count) — the tokenizer-cost proxy
    of the training-data brief; identical RE2 pattern in the oracle."""
    from wned_ray.pipelines.datawork import bpe_token_count

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return bpe_token_count(ds).select_columns(
        ["doc_id", "n_ws_tokens", "n_bpe_tokens"])


def _q_er_bcubed(sf_dir: str):
    """B-cubed precision/recall/F1 of the flagship linkage clustering vs
    gold entity classes (evaluate.bcubed_metrics) — the per-mention ER
    clustering metric beside the pairwise gates; cell-table reduction,
    nothing per-mention on the driver. Rows-only (clustering is not
    SQL-expressible); the hand-worked example is pytest-gated."""
    import pandas as pd

    from wned_ray.stages.evaluate import bcubed_metrics

    corpus, cfg, out = _linkage(sf_dir)
    gold = _rd().read_parquet(corpus["expected_clusters"])
    # two gold definitions: the transitive closure of the gold matched
    # pairs (the linkage's exact expectation — B3 should be 1.0) and the
    # underlying global entity (cross-conversation mentions the labeled
    # pair universe never connects — recall < 1 here is honest scope,
    # not error; see BASELINE.md)
    rows = []
    for name, g in [
        ("expected_cluster",
         gold.select_columns(["mention_id", "cluster_id"])
         .rename_columns({"cluster_id": "entity_id"})),
        ("entity", gold.select_columns(["mention_id", "entity_id"])),
    ]:
        rows.append({"gold": name, **bcubed_metrics(out["clusters"], g)})
    return pd.DataFrame(rows)


def _q_er_ari(sf_dir: str):
    """Adjusted Rand Index of the flagship linkage clustering vs the
    same two gold definitions as er_bcubed (evaluate.adjusted_rand_index)
    — the chance-corrected pair-counting clustering metric (Hubert &
    Arabie 1985). Same one-join contingency-cell reduction; four scalars
    reach the driver. Rows-only; the 4/7 hand example is pytest-gated."""
    import pandas as pd

    from wned_ray.stages.evaluate import adjusted_rand_index

    corpus, cfg, out = _linkage(sf_dir)
    gold = _rd().read_parquet(corpus["expected_clusters"])
    rows = []
    for name, g in [
        ("expected_cluster",
         gold.select_columns(["mention_id", "cluster_id"])
         .rename_columns({"cluster_id": "entity_id"})),
        ("entity", gold.select_columns(["mention_id", "entity_id"])),
    ]:
        m = adjusted_rand_index(out["clusters"], g)
        rows.append({"gold": name, "ari": m["ari"],
                     "n_mentions": m["n_mentions"]})
    return pd.DataFrame(rows)


def _q_er_pr_curve(sf_dir: str):
    """Precision/recall threshold sweep over the hard tier's labeled x
    scored pairs (evaluate.pr_curve) — the evidence behind
    match_threshold, beside the fitted variant (er_fit_weights).
    Rows-only; exactness vs a single-process sweep is pytest-gated."""
    from wned_ray.stages.evaluate import pr_curve

    corpus, cfg, out = _hard_linkage()
    labels = _rd().read_parquet(corpus["labels"])
    return pr_curve(labels, out["scores"], n_bins=20)


def _q_er_fs_em(sf_dir: str):
    """Unsupervised Fellegi-Sunter probabilistic linkage
    (scoring.fs_em_fit / functions.fellegi): EM over the 2^F agreement-
    pattern counts fits lambda and per-feature m/u WITHOUT labels — the
    label-free complement to er_fit_weights, and the regime a brand-new
    100 TB corpus is actually in. Reports the learned parameters and
    the posterior-0.5 classification's P/R/F1 against the hard tier's
    held-out labels (labels used for EVALUATION only, never fitting).
    Rows-only; EM parameter recovery is pytest-gated on a generative
    model with known m/u."""
    import pandas as pd

    from wned_ray.stages.scoring import fs_classify, fs_em_fit

    corpus, cfg, out = _hard_linkage()
    fit = fs_em_fit(out["scores"])
    cls = fs_classify(out["scores"], fit).to_pandas()
    labels = _rd().read_parquet(corpus["labels"]).to_pandas()
    m = labels.merge(cls, on=["id_a", "id_b"])
    gold = m["is_match"].astype(bool)
    tp = int((m["fs_matched"] & gold).sum())
    fp = int((m["fs_matched"] & ~gold).sum())
    fn = int((~m["fs_matched"] & gold).sum())
    p = tp / (tp + fp) if tp + fp else 1.0
    r = tp / (tp + fn) if tp + fn else 1.0
    row = {
        "eval_pairs": len(m), "tp": tp, "fp": fp, "fn": fn,
        "precision_e6": int(round(p * 1e6)),
        "recall_e6": int(round(r * 1e6)),
        "f1_e6": int(round(2 * p * r / (p + r) * 1e6)) if p + r else 0,
        "lambda_e6": int(round(fit["lambda"] * 1e6)),
    }
    for i, c in enumerate(("prior", "local", "sem_sim", "name_sim")):
        row[f"m_{c}_e4"] = int(round(fit["m"][i] * 1e4))
        row[f"u_{c}_e4"] = int(round(fit["u"][i] * 1e4))
    return pd.DataFrame([row])


def _q_json_field_stats(sf_dir: str):
    """JSON field extraction + aggregate (analytics.json_field_agg):
    pull the integer ``k`` out of the events ``props`` JSON blob and
    sum it per event type — vectorized regex extract, partial-agg
    combiner, dim-sized shuffle."""
    from wned_ray.pipelines.analytics import json_field_agg

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "props"])
    return json_field_agg(ds, "props", "k", "event_type",
                          out_n="n", out_sum="sum_k")


def _q_profile_lineitem(sf_dir: str):
    """Streaming column profiler (analytics.profile_columns): one scan
    of lineitem emits per-column (n, nulls, min, max, e4-scaled sum)
    for four numeric columns at once."""
    from wned_ray.pipelines.analytics import profile_columns

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = _rd().read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols)
    return profile_columns(ds, cols)


def _q_term_entropy_docs(sf_dir: str):
    """Per-document Shannon entropy of the token distribution
    (analytics.term_entropy) — the low-entropy==boilerplate quality
    signal; zero-shuffle per-batch kernel."""
    from wned_ray.pipelines.analytics import term_entropy

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return term_entropy(ds)


def _q_source_vocab_jaccard(sf_dir: str):
    """Pairwise vocabulary Jaccard between document sources
    (analytics.vocab_jaccard): distinct (source, term) shuffle, per-term
    pair emit, dim-sized pair aggregate with broadcast vocab sizes."""
    from wned_ray.pipelines.analytics import vocab_jaccard

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["source", "text"])
    return vocab_jaccard(ds)


def _q_users_intersect_except(sf_dir: str):
    """INTERSECT / EXCEPT over per-event-type user sets in one pass
    (analytics.set_op_users): clickers tagged 'both' when they also
    purchased, else 'left_only'."""
    from wned_ray.pipelines.analytics import set_op_users

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])
    return set_op_users(ds)


def _q_merge_upsert_orders(sf_dir: str):
    """MERGE INTO / upsert (analytics.merge_upsert): a delta of +10%
    repricings for open orders applied onto the base orders table —
    delta wins per key, untouched rows pass through. Union + one
    key shuffle, no join."""
    import numpy as np
    import pyarrow as pa

    from wned_ray.pipelines.analytics import merge_upsert

    base = _rd().read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_orderstatus",
                                       "o_totalprice"])

    def as_e2(batch: pa.Table) -> pa.Table:
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "o_orderstatus": batch["o_orderstatus"],
            "price_e2": pa.array(np.floor(p * 100 + 0.5).astype(np.int64)),
        })

    def reprice(batch: pa.Table) -> pa.Table:
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "o_orderstatus": batch["o_orderstatus"],
            "price_e2": pa.array(np.floor(p * 1.1 * 100 + 0.5)
                                 .astype(np.int64)),
        })

    b = base.map_batches(as_e2, batch_format="pyarrow")
    d = (base.filter(expr="o_orderstatus == 'O'")
         .map_batches(reprice, batch_format="pyarrow"))
    return merge_upsert(b, d, "o_orderkey",
                        ["o_orderstatus", "price_e2"])


def _q_global_rank_events(sf_dir: str):
    """Exact global rank() OVER (ORDER BY value, event_id)
    (analytics.global_rank): sample-derived range boundaries, bucket
    count prefix offsets, per-bucket local sort."""
    from wned_ray.pipelines.analytics import global_rank

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "value"])
    return global_rank(ds, "value", "event_id", n_buckets=32)


def _csv_events_path(sf_dir: str) -> str:
    """Deterministic CSV export of the events table (cached under /tmp
    per sf tier) so a second SOURCE FORMAT exercises the same oracle."""
    import hashlib
    import os

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = f"/tmp/wned_ray_fixtures/events_csv_{tag}"
    done = os.path.join(path, "_DONE")
    if not os.path.exists(done):
        import pandas as pd

        os.makedirs(path, exist_ok=True)
        df = pd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "ts", "event_type",
                                      "value"])
        df["ts"] = df["ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        df.to_csv(os.path.join(path, "events.csv"), index=False)
        with open(done, "w") as f:
            f.write("ok")
    return path


def _q_csv_events_daily(sf_dir: str):
    """CSV source round trip: read the events CSV export with
    ray.data.read_csv and aggregate count + e2-scaled value sum per
    (event_type, day) — matching the parquet-view oracle byte-for-byte
    proves the CSV reader path end-to-end."""
    import numpy as np
    import pyarrow as pa

    from ray.data.aggregate import Sum

    import pyarrow.compute as pc
    import pyarrow.csv as pacsv

    path = _csv_events_path(sf_dir)

    ds = _rd().read_csv(
        f"{path}/events.csv",
        convert_options=pacsv.ConvertOptions(
            column_types={"ts": pa.string(), "event_id": pa.int64(),
                          "value": pa.float64()}))

    def prep(batch: pa.Table) -> pa.Table:
        day = pc.utf8_slice_codeunits(batch["ts"], 0, 10)
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"], "day": day,
            "_n": pa.array(np.ones(batch.num_rows, np.int64)),
            "_v": pa.array(v, pa.float64()),
        })

    agg = (ds.map_batches(prep, batch_format="pyarrow")
           .groupby(["event_type", "day"])
           .aggregate(Sum("_n", alias_name="n"),
                      Sum("_v", alias_name="_sv")))

    def fin(batch: pa.Table) -> pa.Table:
        sv = batch["_sv"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"], "day": batch["day"],
            "n": batch["n"],
            "sum_value_e2": pa.array(np.floor(sv * 100 + 0.5)
                                     .astype(np.int64)),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


def _q_pagerank_parts(sf_dir: str):
    """Global distributed PageRank (analytics.pagerank) over the
    part -> supplier edge graph from lineitem — BSP join-aggregate
    rounds; the graph never materializes on one node. Rows-only:
    pytest gates the kernel against a dense power iteration."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from wned_ray.pipelines.analytics import pagerank

    ds = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_suppkey"])

    def edges(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.add(pc.multiply(batch["l_partkey"], 10), 1),
            "dst": pc.add(pc.multiply(batch["l_suppkey"], 10), 2),
        })

    e = (ds.map_batches(edges, batch_format="pyarrow")
         .groupby(["src", "dst"]).count().select_columns(["src", "dst"]))
    return pagerank(e, alpha=0.85, n_iter=3)


def _q_er_blocking_phonetic(sf_dir: str):
    """Phonetic (Soundex) blocking-scheme evaluation: the classic
    Christen ch. 4.3 blocking key as an ALTERNATIVE scheme, measured
    with the same RR / transitive-PC instrument as the shipped
    LSH/token tier (er_blocking_quality) so the two schemes are
    directly comparable on one fixture. Rows-only (the blocker isn't
    SQL-expressible); the soundex encoder is unit-gated on the NARA
    test vectors."""
    import pandas as pd

    from wned_ray.functions.phonetic import phonetic_key_pairs
    from wned_ray.stages.evaluate import blocking_quality

    corpus, _, out = _linkage(sf_dir)
    pairs = phonetic_key_pairs(out["prepared"], "mention_id", "mention")
    gold = _rd().read_parquet(corpus["expected_clusters"])
    m = blocking_quality(pairs, gold)
    m["reduction_ratio_e6"] = int(round(m.pop("reduction_ratio") * 1e6))
    m["pair_completeness_e6"] = int(round(
        m.pop("pair_completeness") * 1e6))
    return pd.DataFrame([m])


def _q_er_blocking_canopy(sf_dir: str):
    """Canopy-clustering blocking-scheme evaluation (McCallum-Nigam-
    Ungar 2000; blocking.canopy_pairs): cheap char-bigram-Jaccard
    canopies with loose/tight radii, centers picked greedily on a
    deterministic bounded sample, assignment one stateless pass —
    measured with the same RR / transitive-PC instrument as the LSH,
    Soundex and sorted-neighborhood tiers (the FIFTH comparable
    scheme). Rows-only (the instrument isn't SQL-expressible); the
    canopy kernel is unit-gated on hand examples."""
    import pandas as pd

    from wned_ray.stages.blocking import canopy_pairs
    from wned_ray.stages.evaluate import blocking_quality

    corpus, _, out = _linkage(sf_dir)
    pairs = canopy_pairs(out["prepared"], "mention_id", "mention",
                         t_loose=0.25, t_tight=0.55)
    gold = _rd().read_parquet(corpus["expected_clusters"])
    m = blocking_quality(pairs, gold)
    m["reduction_ratio_e6"] = int(round(m.pop("reduction_ratio") * 1e6))
    m["pair_completeness_e6"] = int(round(
        m.pop("pair_completeness") * 1e6))
    return pd.DataFrame([m])


def _q_sorted_neighborhood_docs(sf_dir: str):
    """Sorted-neighborhood blocking over documents
    (blocking.sorted_neighborhood_pairs): rank by the first 7 chars of
    the alnum-stripped lowercased text, emit all pairs within a
    window of 4 sorted positions — the Hernández-Stolfo ER blocking
    scheme as a first-class operator. SQL-oracled: DuckDB reproduces
    the identical pair set via row_number() OVER (ORDER BY key,
    doc_id) and a rank-distance self-join."""
    from wned_ray.stages.blocking import sorted_neighborhood_pairs

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def add_key(df):
        import pandas as pd
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "key": (df["text"].str.lower()
                    .str.replace(r"[^a-z0-9]", "", regex=True)),
        })

    keyed = ds.map_batches(add_key, batch_format="pandas")
    return sorted_neighborhood_pairs(keyed, "doc_id", "key", window=4)


def _q_er_blocking_sortedneigh(sf_dir: str):
    """Sorted-neighborhood blocking-scheme evaluation on the linkage
    fixture: window-4 neighborhood over the alnum-stripped mention
    surface, measured with the same RR / transitive-PC instrument as
    the LSH tier (er_blocking_quality) and the Soundex tier
    (er_blocking_phonetic) — the third comparable scheme. Rows-only
    (the instrument isn't SQL-expressible); the pair generator itself
    is SQL-oracled via sorted_neighborhood_docs."""
    import pandas as pd

    from wned_ray.stages.blocking import sorted_neighborhood_pairs
    from wned_ray.stages.evaluate import blocking_quality

    corpus, _, out = _linkage(sf_dir)

    def add_key(df):
        return pd.DataFrame({
            "mention_id": df["mention_id"].to_numpy(),
            "_snkey": (df["mention"].str.lower()
                       .str.replace(r"[^a-z0-9]", "", regex=True)),
        })

    keyed = out["prepared"].map_batches(add_key, batch_format="pandas")
    pairs = sorted_neighborhood_pairs(keyed, "mention_id", "_snkey",
                                      window=4)
    gold = _rd().read_parquet(corpus["expected_clusters"])
    m = blocking_quality(pairs, gold)
    m["reduction_ratio_e6"] = int(round(m.pop("reduction_ratio") * 1e6))
    m["pair_completeness_e6"] = int(round(
        m.pop("pair_completeness") * 1e6))
    return pd.DataFrame([m])


def _q_time_decay_users(sf_dir: str):
    """Exponentially time-decayed per-user value sum
    (analytics.time_decay_agg, half-life 24 h, t_ref = global max ts):
    associative given the fixed t_ref, so per-batch partials ride one
    dim-sized groupby — the input never reshuffles."""
    from wned_ray.pipelines.analytics import time_decay_agg

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "value"])
    return time_decay_agg(ds, "user_id", "ts", "value",
                          half_life_s=86400.0)


def _q_zscore_outliers_events(sf_dir: str):
    """Per-event-type z-score anomaly rows (analytics.zscore_outliers,
    |z| > 3): one moment-partials pass for group mean/std (dim-sized
    stats broadcast), one stateless flagging scan."""
    from wned_ray.pipelines.analytics import zscore_outliers

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type", "value"])
    return zscore_outliers(ds, "event_type", "value", "event_id",
                           z_thresh=3.0)


def _q_orders_above_cust_avg(sf_dir: str):
    """The correlated-subquery shape: orders priced above 1.3x their
    customer's average (analytics.above_group_avg) — per-key mean +
    DISTRIBUTED join back (the per-customer dim is not broadcastable
    at 100 TB) + vectorized filter."""
    from wned_ray.pipelines.analytics import above_group_avg

    ds = _rd().read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_custkey",
                                     "o_totalprice"])
    return above_group_avg(ds, "o_custkey", "o_totalprice",
                           ["o_orderkey"], factor=1.3)


def _q_topn_events_ties(sf_dir: str):
    """Per-user top-2 events under RANK() semantics — boundary ties
    KEPT (analytics.topn_per_group_ties): vectorized batch-local prune
    (only ~n rows per (group, batch) survive to the shuffle) + exact
    per-group rank filter."""
    from wned_ray.pipelines.analytics import topn_per_group_ties

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_id", "value"])
    return topn_per_group_ties(ds, "user_id", "value", "event_id", n=2)


def _q_gap_fill_daily_events(sf_dir: str):
    """Dense per-type daily counts with zero-filled gaps
    (analytics.gap_fill_daily): the generate_series + left-join shape —
    grid generated distributed from a 2-scalar bounds pass, counts
    join in distributed, day rides the shuffle as int64 epoch-us."""
    from wned_ray.pipelines.analytics import gap_fill_daily

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])
    return gap_fill_daily(ds, "event_type", "ts")


def _q_meta_blocking_wnp(sf_dir: str):
    """Meta-blocking with weighted NODE pruning over token blocks on
    documents (blocking.meta_blocking, Papadakis TKDE 2014 / BLAST
    threshold): CBS edge weights from one self-join, per-node mean
    neighborhood weight, keep w >= (avg_a + avg_b)/2."""
    from wned_ray.stages.blocking import meta_blocking

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return meta_blocking(ds, "doc_id", "text", scheme="wnp",
                         max_block=32)


def _q_meta_blocking_wep(sf_dir: str):
    """Meta-blocking with weighted EDGE pruning (global mean weight
    threshold) — the WEP variant of blocking.meta_blocking."""
    from wned_ray.stages.blocking import meta_blocking

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return meta_blocking(ds, "doc_id", "text", scheme="wep",
                         max_block=32)


def _q_prefix_jaccard_join(sf_dir: str):
    """PPJoin-style prefix-filtered Jaccard self-join
    (datawork.prefix_jaccard_join): EXACT same pair set as
    ngram_jaccard_dedup (shared oracle) but the self-join exchanges
    prefix rows only and verify ships packed gram blobs to candidates —
    the web-scale path for exact set-similarity dedup."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from wned_ray.pipelines.datawork import prefix_jaccard_join

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = prefix_jaccard_join(ds, id_col="doc_id", n=3, threshold=0.8,
                              ordering="df", num_partitions=8)

    def micro(batch: pa.Table) -> pa.Table:
        return pa.table({
            "id_a": batch["id_a"], "id_b": batch["id_b"],
            "jaccard_micro": pc.cast(
                pc.round(pc.multiply(batch["jaccard"], 1_000_000.0)),
                pa.int64()),
        })

    return out.map_batches(micro, batch_format="pyarrow")


def _q_cms_term_counts(sf_dir: str):
    """Count-Min sketch term frequencies (datawork.cms_term_counts,
    d=4 x w=1024, md5 hash mode): per-batch counter blobs sum on the
    driver, exact counts via one vocab groupby with a DISTRIBUTED
    top-k (sort+limit before the driver). The md5 mode makes the
    sketch itself bit-reproducible in DuckDB, so est_cnt is
    value-hash-checked, not just rows-only (hll_distinct_terms
    discipline)."""
    from wned_ray.pipelines.datawork import cms_term_counts

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["text"])
    return cms_term_counts(ds, d=4, w=1024, top_k=64, hash_mode="md5")


def _q_bigram_lm_docs(sf_dir: str):
    """CCNet-style perplexity-proxy quality signal: per-doc average
    negative log-likelihood under an add-0.1-smoothed bigram LM fitted
    on the corpus in the same job (datawork.bigram_lm_scores) — one
    tagged count shuffle, broadcast LM, stateless scoring pass."""
    from wned_ray.pipelines.datawork import bigram_lm_scores

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return bigram_lm_scores(ds, alpha=0.1)


def _q_skyline_parts(sf_dir: str):
    """Skyline / Pareto frontier over parts (minimize retail price,
    maximize size) — analytics.skyline: vectorized per-batch local
    prune (dominated rows never leave their batch), exact final prune
    over the collapsed frontiers."""
    from wned_ray.pipelines.analytics import skyline

    ds = _rd().read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_retailprice",
                                     "p_size"])
    return skyline(ds, "p_retailprice", "p_size", ["p_partkey"])


def _q_pmi_doc_terms(sf_dir: str):
    """Within-document token-pair PMI (analytics.pmi_pairs,
    support >= 50 docs): per-batch vectorized pair generation (docs are
    whole inside batches — no self-join), one pair groupby, broadcast
    document frequencies."""
    from wned_ray.pipelines.analytics import pmi_pairs

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return pmi_pairs(ds, min_pairs=50)


def _q_graph_components_parts(sf_dir: str):
    """First-class distributed connected components
    (analytics.connected_components, BSP min-label propagation) over a
    part-adjacency graph: parts on consecutive lineitem rows of the
    same order, sparsified by (src+dst) % 17 == 0 so the graph
    fragments into ~100 components (a discriminating check — a one-
    giant-component result would pass trivially). SQL-oracled via a
    recursive CTE computing min reachable id."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from wned_ray.pipelines.analytics import connected_components
    from wned_ray.util import safe_partitions

    li = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_linenumber",
                                     "l_partkey"])

    def lhs(b: pa.Table) -> pa.Table:
        return pa.table({
            "k": b["l_orderkey"],
            "ln": b["l_linenumber"].cast(pa.int64()),
            "src": b["l_partkey"],
        })

    def rhs(b: pa.Table) -> pa.Table:
        return pa.table({
            "k": b["l_orderkey"],
            "ln": pc.subtract(b["l_linenumber"].cast(pa.int64()), 1),
            "dst": b["l_partkey"],
        })

    n_li = li.count()
    joined = (li.map_batches(lhs, batch_format="pyarrow")
              .join(li.map_batches(rhs, batch_format="pyarrow"),
                    join_type="inner",
                    num_partitions=safe_partitions(8, rows=n_li),
                    on=("k", "ln")))

    def keep(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        m = (s != d) & ((s + d) % 17 == 0)
        return pa.table({"src": b["src"], "dst": b["dst"]}).filter(
            pa.array(m))

    edges = joined.map_batches(keep, batch_format="pyarrow")
    return connected_components(edges, "src", "dst")


def _q_leakage_safe_split_docs(sf_dir: str):
    """Group-aware train/val/test split (datawork.leakage_safe_split):
    exact-duplicate documents always land in the SAME split — the
    representative (min doc id per text group) draws one keyed
    multiplicative hash and the whole group inherits it. SQL twin
    repeats the 32-bit-ring arithmetic bit-exactly (HUGEINT
    intermediate for the multiply)."""
    from wned_ray.pipelines.datawork import leakage_safe_split

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return leakage_safe_split(ds)


def _q_token_budget_chunks_docs(sf_dir: str):
    """Contiguous token-budget chunking (datawork.token_budget_chunks):
    docs in id order pack into ~512-token context windows via a
    distributed prefix-sum (global rank -> bucket sums -> driver
    offsets -> per-bucket cumsum); SQL twin is one window cumsum."""
    from wned_ray.pipelines.datawork import token_budget_chunks

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return token_budget_chunks(ds, budget=512)


def _q_mix_lang_docs(sf_dir: str):
    """Deterministic weighted source interleave (datawork.mix_sources):
    'en' at weight 3 emits three docs for every one of each other
    language, merged on virtual time (r-0.5)/w — the data-mixture
    order as a first-class column; SQL twin is two window
    row_numbers."""
    from wned_ray.pipelines.datawork import mix_sources

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang"])
    return mix_sources(ds, "doc_id", "lang", weights={"en": 3.0})


def _q_distinct_ngram_ratio_docs(sf_dir: str):
    """Corpus distinct-1/2/3 diversity report
    (datawork.distinct_ngram_ratio): unique / total word n-grams per n
    — the training-corpus variety monitor (templated or duplicated
    text drives it to 0). One tokenize pass, per-batch distinct
    combiner, vocabulary-sized groupby."""
    from wned_ray.pipelines.datawork import distinct_ngram_ratio

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return distinct_ngram_ratio(ds)


def _q_dedup_keep_docs(sf_dir: str):
    """Dedup policy applied (datawork.dedup_keep): one kept document
    per near-dup cluster (min-id representative), full rows out — the
    final materialization step of the dedup story, oracled end to end
    on top of the near_dup_clusters SQL."""
    from wned_ray.pipelines.datawork import dedup_keep

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return dedup_keep(ds)


def _q_near_dup_clusters_docs(sf_dir: str):
    """Composed dedup flagship (datawork.near_dup_clusters): exact
    3-gram Jaccard >= 0.8 pairs -> transitive connected components ->
    every doc labeled with its min reachable doc id (dedup policy
    input: keep one per cluster). Oracled end to end: Jaccard CTE +
    recursive min-label CTE + left join for singletons."""
    from wned_ray.pipelines.datawork import near_dup_clusters

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return near_dup_clusters(ds)


def _q_media_resample_wav(sf_dir: str):
    """REAL audio resample (datawork.resample_audio): synthesize
    deterministic per-doc WAV tones at 4 kHz (same generator as
    media_wav_features), linear-resample to 8 kHz through the
    actor-pool stage, and report the doubled frame counts plus the
    resampled signal's RMS (tone RMS is rate-invariant up to
    interpolation error, so the rows are a physical check, not just
    plumbing)."""
    import io
    import wave

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from wned_ray.pipelines.datawork import resample_audio

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"]).limit(64)

    def to_wav(batch: pa.Table) -> pa.Table:
        payloads = []
        for did in batch["doc_id"].to_pylist():
            sr = 4000
            freq = 200 + (int(did) % 17) * 50
            t = np.arange(sr // 4) / sr
            pcm = (np.sin(2 * np.pi * freq * t) * 16383).astype(np.int16)
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sr)
                w.writeframes(pcm.tobytes())
            payloads.append(buf.getvalue())
        return pa.table({"media_id": batch["doc_id"],
                         "payload": pa.array(payloads, pa.binary())})

    media = ds.map_batches(to_wav, batch_format="pyarrow")
    out = resample_audio(media, target_rate=8000)

    def project(batch: pa.Table) -> "pd.DataFrame":
        rows = []
        for mid, p, m in zip(batch["media_id"].to_pylist(),
                             batch["payload"].to_pylist(),
                             batch["n_frames"].to_pylist()):
            with wave.open(io.BytesIO(p), "rb") as r:
                x = np.frombuffer(r.readframes(r.getnframes()),
                                  np.int16).astype(np.float64)
            rows.append({"media_id": mid, "n_frames": m,
                         "rate": 8000,
                         "rms_e2": int(round(float(
                             np.sqrt((x ** 2).mean()) * 100)))})
        return pd.DataFrame(rows)

    return out.map_batches(project, batch_format="pyarrow")


def _q_cumulative_new_users(sf_dir: str):
    """Daily new-user counts + running cumulative distinct users per
    event type (analytics.cumulative_new_users): distinctness reduces
    to per-(type, user) first day, cumulative is a dim-sized running
    sum — the streaming recast of COUNT(DISTINCT) OVER."""
    from wned_ray.pipelines.analytics import cumulative_new_users

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id", "ts"])
    return cumulative_new_users(ds, "event_type", "user_id", "ts")


def _q_embedding_centroids(sf_dir: str):
    """Per-label embedding centroids as (label, dim, mean_e6) rows
    (analytics.embedding_centroids): scatter-add combiner, one
    (label, dim) groupby — vectors never shuffle."""
    from wned_ray.pipelines.analytics import embedding_centroids

    ds = _rd().read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["label", "embedding"])
    return embedding_centroids(ds)


def _q_equidepth_bins_events(sf_dir: str):
    """Equi-depth (quantile) binning of event values into 10 bins via
    the exact distributed rank (analytics.equidepth_bins) — the
    feature-engineering discretizer; per-bin count and value range."""
    from wned_ray.pipelines.analytics import equidepth_bins

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "value"])
    return equidepth_bins(ds, "value", "event_id", n_bins=10)


def _q_rank_windows_events(sf_dir: str):
    """percent_rank() / cume_dist() per user partition ordered by value
    (analytics.rank_window_funcs) — one key shuffle + numpy kernels."""
    from wned_ray.pipelines.analytics import rank_window_funcs

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_id", "value"])
    return rank_window_funcs(ds, "user_id", "value", "event_id")


def _q_scan_pushdown_orders(sf_dir: str):
    """Prune-at-the-read demonstration: a row-filter + column projection
    pushed into read_parquet (only 2 columns and 'F'-status row groups
    leave storage), then one dim-sized aggregate. The brief's "a read
    that loads all columns for a 2-column transform is wrong" rule as a
    checkable query."""
    import pyarrow.dataset as pads
    from ray.data.aggregate import Count, Sum

    ds = _rd().read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice"],
        filter=(pads.field("o_orderstatus") == "F"))

    def e2(b):
        import pyarrow as pa
        import pyarrow.compute as pc
        return pa.table({
            "o_orderpriority": b["o_orderpriority"],
            "_p": pc.cast(pc.floor(pc.add(pc.multiply(
                b["o_totalprice"], 100.0), 0.5)), pa.int64()),
        })

    return (ds.map_batches(e2, batch_format="pyarrow")
            .groupby("o_orderpriority")
            .aggregate(Count(alias_name="n"),
                       Sum("_p", alias_name="sum_price_e2")))


def _q_er_blocking_meta(sf_dir: str):
    """Meta-blocking as the SIXTH measured blocking scheme on the
    linkage fixture: word-bigram CBS graph over mention surfaces with
    WNP pruning (blocking.meta_blocking), evaluated with the shared
    RR / transitive-PC instrument. Rows-only; the kernel itself is
    SQL-oracled on documents (meta_blocking_wnp)."""
    import pandas as pd

    from wned_ray.stages.blocking import meta_blocking
    from wned_ray.stages.evaluate import blocking_quality

    import pyarrow as pa
    from ray.data.aggregate import Min

    corpus, _, out = _linkage(sf_dir)
    prep = out["prepared"].select_columns(["mention_id", "norm_mention"])
    # the repo's distinct-surface discipline: block the 2.9k distinct
    # surfaces, not the 20k mentions — same-surface mentions co-block
    # trivially via star edges to the surface representative
    reps = (prep.groupby("norm_mention")
            .aggregate(Min("mention_id", alias_name="rep_id"))
            .materialize())

    def star(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["mention_id"].astype(str).to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype=object),
                                 "id_b": pd.Series([], dtype=object)})
        return pd.DataFrame({"id_a": np.repeat(ids[0], len(ids) - 1),
                             "id_b": ids[1:]})

    # re-encode as Arrow blocks: union with the Arrow-block meta edges
    # must not mix pandas/arrow block types (breaks downstream kernels)
    same_surface = (prep.groupby("norm_mention")
                    .map_groups(star, batch_format="pandas")
                    .map_batches(lambda b: b, batch_format="pyarrow"))
    meta_edges = (meta_blocking(reps, "rep_id", "norm_mention",
                                scheme="wnp", max_block=256,
                                key_mode="chars")
                  .select_columns(["id_a", "id_b"]))
    pairs = meta_edges.union(same_surface)
    gold = _rd().read_parquet(corpus["expected_clusters"])
    m = blocking_quality(pairs, gold)
    m["reduction_ratio_e6"] = int(round(m.pop("reduction_ratio") * 1e6))
    m["pair_completeness_e6"] = int(round(
        m.pop("pair_completeness") * 1e6))
    return pd.DataFrame([m])


def _q_edit_distance_join(sf_dir: str):
    """Exact Levenshtein<=1 similarity self-join over customer names
    via FastSS deletion-neighborhood blocking
    (datawork.edit_distance_join): complete candidate generation (no
    recall loss, pytest-gated), vectorized DP verify; oracled against
    DuckDB's levenshtein() over the full cross join."""
    from wned_ray.pipelines.datawork import edit_distance_join

    ds = _rd().read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_name"])
    return edit_distance_join(ds, "c_custkey", "c_name", max_dist=1)


def _q_tfidf_cosine_join(sf_dir: str):
    """All-pairs TF-IDF cosine document similarity at >= 0.8
    (datawork.tfidf_cosine_join): sparse dot via a term self-join of
    normalized (doc, term, weight) rows — the doc<->doc member of the
    text-similarity family (bm25 is query->doc); weights ride the
    join, text never shuffles."""
    from wned_ray.pipelines.datawork import tfidf_cosine_join

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return tfidf_cosine_join(ds, threshold=0.8)


def _q_association_rules_parts(sf_dir: str):
    """Frequent-pair association rules over order baskets
    (analytics.association_rules): basket-keyed self-join (fan-out
    bounded by basket size), pair-count groupby, broadcast item
    counts; support / confidence / lift per directed pair."""
    from wned_ray.pipelines.analytics import association_rules

    ds = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])
    return association_rules(ds, "l_orderkey", "l_partkey",
                             min_support=3)


def _q_graph_clustering_parts(sf_dir: str):
    """Per-node triangle counts + local clustering coefficient over
    the same sparsified part-adjacency graph as
    graph_components_parts (analytics.graph_clustering): two-join
    ordered-wedge triangle enumeration, corner explode, degree from
    one endpoint groupby."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from wned_ray.pipelines.analytics import graph_clustering
    from wned_ray.util import safe_partitions

    li = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_linenumber",
                                     "l_partkey"])

    def lhs(b: pa.Table) -> pa.Table:
        return pa.table({
            "k": b["l_orderkey"],
            "ln": b["l_linenumber"].cast(pa.int64()),
            "src": b["l_partkey"],
        })

    def rhs(b: pa.Table) -> pa.Table:
        return pa.table({
            "k": b["l_orderkey"],
            "ln": pc.subtract(b["l_linenumber"].cast(pa.int64()), 1),
            "dst": b["l_partkey"],
        })

    n_li = li.count()
    joined = (li.map_batches(lhs, batch_format="pyarrow")
              .join(li.map_batches(rhs, batch_format="pyarrow"),
                    join_type="inner",
                    num_partitions=safe_partitions(8, rows=n_li),
                    on=("k", "ln")))

    def keep(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        m = (s != d) & ((s + d) % 3 == 0)
        return pa.table({"src": b["src"], "dst": b["dst"]}).filter(
            pa.array(m))

    edges = joined.map_batches(keep, batch_format="pyarrow")
    return graph_clustering(edges, "src", "dst")


def _q_mode_event_type_users(sf_dir: str):
    """Per-user modal event type with deterministic tie-break
    (analytics.grouped_mode) — MODE() as one count shuffle + per-key
    argmax."""
    from wned_ray.pipelines.analytics import grouped_mode

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])
    return grouped_mode(ds, "user_id", "event_type")


def _q_incremental_dedup_docs(sf_dir: str):
    """Append-only exact dedup (datawork.incremental_dedup): classify
    delta docs (doc_id%10==0) against base + delta without re-shuffling
    the base — delta hashes broadcast, base one filtered scan."""
    import pyarrow as pa

    from wned_ray.pipelines.datawork import incremental_dedup

    docs = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])

    def mod(keep_eval):
        def f(b):
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % 10 == 0) if keep_eval else (ids % 10 != 0)
            return b.filter(pa.array(m))
        return f

    base = docs.map_batches(mod(False), batch_format="pyarrow")
    delta = docs.map_batches(mod(True), batch_format="pyarrow")
    return incremental_dedup(base, delta)


def _q_logodds_en_de(sf_dir: str):
    """Weighted log-odds-ratio with Dirichlet prior (Monroe-Colaresi-
    Quinn "fightin' words") between en and de document slices
    (datawork.logodds_terms): one tagged count shuffle, z computed on
    the vocab-sized table."""
    from wned_ray.pipelines.datawork import logodds_terms

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["lang", "text"])
    return logodds_terms(ds, "lang", "text", "en", "de")


def _q_kfold_embeddings(sf_dir: str):
    """Deterministic stratifiable k-fold split assignment over the
    embeddings table (analytics.kfold_assign, Knuth hash, k=5) — the
    leakage-free CV splitter; fold is a pure function of (id, seed)."""
    from wned_ray.pipelines.analytics import kfold_assign

    ds = _rd().read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "label"])
    return kfold_assign(ds, "vec_id", "label", k=5)


def _q_term_chi2_lang(sf_dir: str):
    """Per-term chi-square feature-selection score against the lang
    class (analytics.term_chi2_class, Yang-Pedersen): doc-level
    presence contingency, one (term, class) shuffle."""
    from wned_ray.pipelines.analytics import term_chi2_class

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["lang", "text"])
    return term_chi2_class(ds, "lang", "text")


def _q_winsorized_mean_events(sf_dir: str):
    """Per-type winsorized mean (clamped to [p10, p90] quantile_cont
    bounds) — analytics.winsorized_mean, the outlier-robust
    aggregate."""
    from wned_ray.pipelines.analytics import winsorized_mean

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])
    return winsorized_mean(ds, "event_type", "value", lo=0.1, hi=0.9)


def _q_dq_checks_events(sf_dir: str):
    """Declarative data-quality expectations over events
    (analytics.dq_checks): not-null, uniqueness, numeric range and
    categorical domain rules in one streaming pass — rules chosen so
    the range and domain rows have REAL nonzero violation counts (a
    discriminating artifact, not an all-zeros echo)."""
    from wned_ray.pipelines.analytics import dq_checks

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id",
                                     "event_type", "value"])
    return dq_checks(ds, "event_id", {
        "not_null": ["user_id"],
        "unique": ["event_id"],
        "range": {"value": (0.0, 200.0)},
        "domain": {"event_type": ["click", "view", "purchase",
                                  "signup"]},
    })


def _q_time_weighted_avg_users(sf_dir: str):
    """Per-user time-weighted average event value
    (analytics.time_weighted_avg): each value holds until the next
    event — the correct mean for irregular gauge series."""
    from wned_ray.pipelines.analytics import time_weighted_avg

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "value",
                                     "event_id"])
    return time_weighted_avg(ds, "user_id", "ts", "value", "event_id")


def _q_hll_users_setops(sf_dir: str):
    """Sketch set algebra (datawork.hll_set_ops): HLL union via
    register max, intersection via inclusion-exclusion, over click-
    vs view-user sets — md5 mode makes all three sketches (and hence
    all four estimates) bit-reproducible in SQL; exact sides ride
    along."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from wned_ray.pipelines.datawork import hll_set_ops

    ev = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id"])

    def pick(t):
        def f(b):
            m = pc.equal(b["event_type"], t)
            return pa.table({"v": pc.cast(b["user_id"],
                                          pa.string())}).filter(m)
        return f

    a = ev.map_batches(pick("click"), batch_format="pyarrow")
    b = ev.map_batches(pick("view"), batch_format="pyarrow")
    return hll_set_ops(a, b, "v", hash_mode="md5")


def _q_corr_matrix_lineitem(sf_dir: str):
    """Full pairwise Pearson correlation matrix over four lineitem
    measures in one moment-partials pass (datawork.corr_matrix) —
    constant-size shuffle, input never moves."""
    from wned_ray.pipelines.datawork import corr_matrix

    ds = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_quantity", "l_extendedprice",
                                     "l_discount", "l_tax"])
    return corr_matrix(ds, ["l_quantity", "l_extendedprice",
                            "l_discount", "l_tax"])


def _q_pseudonymize_events(sf_dir: str):
    """Keyed pseudonymization of user ids (analytics.pseudonymize) —
    consistent, key-dependent replacement ids; joins keep working,
    raw ids never leave."""
    from wned_ray.pipelines.analytics import pseudonymize

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id"])
    return pseudonymize(ds, "user_id")


def _q_dp_counts_events(sf_dir: str):
    """Differentially-private per-type counts (analytics.dp_counts,
    Laplace mechanism, epsilon=1, seeded md5 noise) — the noisy
    release is deterministic, so the SQL twin reproduces it bit-for-
    bit."""
    from wned_ray.pipelines.analytics import dp_counts

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type"])
    return dp_counts(ds, "event_type", epsilon=1.0, seed=11)


def _q_sortmerge_join_orders(sf_dir: str):
    """The range-partitioned sort-merge join strategy
    (analytics.sort_merge_join) on the orders x customer shape —
    result-identical to the hash join, so it shares
    join_orders_customers' oracle byte-for-byte."""
    import pyarrow as pa
    from ray.data.aggregate import Count, Sum

    from wned_ray.pipelines.analytics import sort_merge_join

    od = _rd().read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_totalprice"])
    cu = (_rd().read_parquet(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_mktsegment"])
          .map_batches(lambda b: pa.table({
              "o_custkey": b["c_custkey"],
              "c_mktsegment": b["c_mktsegment"]}),
              batch_format="pyarrow"))
    joined = sort_merge_join(od, cu, "o_custkey",
                             ["o_custkey", "o_totalprice"],
                             ["o_custkey", "c_mktsegment"])

    def pre(b):
        return pa.table({"c_mktsegment": b["c_mktsegment"],
                         "_p": b["o_totalprice"]})

    agg = (joined.map_batches(pre, batch_format="pyarrow")
           .groupby("c_mktsegment")
           .aggregate(Count(alias_name="n_orders"),
                      Sum("_p", alias_name="_sp")))

    def fin(b):
        import pyarrow.compute as pc
        return pa.table({
            "c_mktsegment": b["c_mktsegment"],
            "n_orders": b["n_orders"],
            "total_price_usd": pc.cast(pc.round(b["_sp"]), pa.int64()),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    # ORDER MATTERS: the round driver sweeps this dict in insertion order
    # and records the FIRST 50 entries, so the window is rotated each
    # round (round-4 VERDICT #5): oracled queries NOT driver-checked in
    # round 4 are moved to the head below, so the union of r4+r5 driver
    # rows certifies every oracled query; the rest keep their original
    # order (each pytest-gated and/or SQL-oracled, all swept locally by
    # scripts/check_all.py).
    q = {
        # relational / operator coverage (SQL-checked)
        "normalize_text": _q_normalize_text,
        "filter_events": _q_filter_events,
        "edge_aggregate": _q_edge_aggregate,
        "alias_prior": _q_alias_prior,
        "topk_parts": _q_topk_parts,
        "join_orders_customers": _q_join_orders_customers,
        "left_join_customers_orders": _q_left_join_customers_orders,
        "customers_without_orders": _q_customers_without_orders,
        "distinct_sources": _q_distinct_sources,
        "exact_dedup_docs": _q_exact_dedup_docs,
        "token_count_docs": _q_token_count,
        "doc_quality": _q_doc_quality,
        "cooccur_pairs": _q_cooccur_pairs,
        "grouped_norm": _q_grouped_norm,
        "knn_embeddings": _q_knn,
        "idf_terms": _q_idf_terms,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "abbrev_tokens": _q_abbrev_tokens,
        "per_user_top_event": _q_per_user_top_event,
        "lineitem_pricing_summary": _q_lineitem_pricing_summary,
        "events_daily": _q_events_daily,
        "union_region_nation": _q_union_region_nation,
        "sessionize_events": _q_sessionize_events,
        "asof_click_before_purchase": _q_asof_click_before_purchase,
        "windowed_events": _q_windowed_events,
        "sliding_window_events": _q_sliding_window_events,
        "range_join_clicks": _q_range_join_clicks,
        "hash_sample_docs": _q_hash_sample_docs,
        "stratified_sample_docs": _q_stratified_sample_docs,
        "bm25_docs": _q_bm25_docs,
        "corr_lineitem": _q_corr_lineitem,
        "event_value_quantiles": _q_event_value_quantiles,
        "heavy_hitter_terms": _q_heavy_hitter_terms,
        "window_funcs_events": _q_window_funcs_events,
        "bloom_semi_join_orders": _q_bloom_semi_join_orders,
        "rollup_events": _q_rollup_events,
        "cube_events": _q_cube_events,
        "pivot_events": _q_pivot_events,
        "row_number_events": _q_row_numbers,
        "hll_distinct_terms": _q_hll_distinct_terms,     # md5 mode: oracled
        "curated_docs_sql": _q_curated_docs_sql,
        "alias_redirect_resolved": _q_alias_redirect_resolved,
        "anchor_aliases": _q_anchor_aliases,
        "ngram_jaccard_dedup": _q_ngram_jaccard_dedup,
        "lang_id_docs": _q_lang_id,
        "embedding_near_dup": _q_embedding_near_dup,
        "hll_group_distinct_users": _q_hll_group_distinct,
        "salted_join_orders": _q_salted_join_orders,
        "weighted_sample_docs": _q_weighted_sample_docs,
        "scrub_pii_docs": _q_scrub_pii_docs,
        # ^^^ exactly 50 SQL-oracled queries fill the driver's 50-entry
        # sweep window (ORACLES-FIRST, round-3 VERDICT task 2). Every
        # entry below is pytest-gated and swept by scripts/check_all.py.
        # --- flagship rows-only ER gates (first past the window; their
        #     F1/accuracy values are asserted by tests/test_hard_tier.py
        #     and recorded in BASELINE.md per round) ---
        "er_metrics": _q_er_metrics,
        "er_metrics_hard": _q_er_metrics_hard,
        "er_resolve_accuracy": _q_er_resolve_accuracy,
        "er_resolve_prior_vs_full": _q_er_resolve_prior_vs_full,
        "quantile_sketch_events": _q_quantile_sketch_events,
        "er_blocking": _q_er_blocking,
        "er_blocking_quality": _q_er_blocking_quality,
        "er_pairs": _q_er_pairs,
        "er_scores": _q_er_scores,
        "er_clusters": _q_er_clusters,
        "er_resolve": _q_er_resolve,
        "er_resolve_strategies": _q_er_resolve_strategies,
        "er_fit_weights": _q_er_fit_weights,
        "er_nil_accuracy": _q_er_nil_accuracy,
        "er_rel_modes": _q_er_rel_modes,
        "er_increment": _q_er_increment,
        "curated_docs": _q_curated_docs,
        "minhash_dedup_docs": _q_minhash_dedup,
        "simhash_near_dup": _q_simhash_dups,
        "fingerprint_docs": _q_fingerprint,
        "ann_embeddings": _q_ann_embeddings,
        "media_features": _q_media_features,
        "media_wav_features": _q_media_wav_features,
        "media_resize_frames": _q_media_resize_frames,
        "media_resample_wav": _q_media_resample_wav,
        "full_outer_join_summary": _q_full_outer_join,
        # --- round-4 continuation batch (SQL-oracled, past the window;
        #     swept by scripts/check_all.py like the two above) ---
        "multiway_join_revenue": _q_multiway_join_revenue,
        "cross_join_nation_types": _q_cross_join_nation_types,
        "string_agg_sources": _q_string_agg_sources,
        "histogram_events": _q_histogram_events,
        "grouping_sets_events": _q_grouping_sets_events,
        "explode_doc_terms": _q_explode_doc_terms,
        "canonical_docs": _q_canonical_docs,
        "kmeans_embeddings": _q_kmeans_embeddings,   # rows-only: pytest
        "funnel_events": _q_funnel_events,
        "cohort_retention": _q_cohort_retention,
        "event_paths": _q_event_paths,
        "transition_counts": _q_transition_counts,
        "unpivot_part": _q_unpivot_part,
        "decontaminate_docs": _q_decontaminate_docs,
        "repetition_docs": _q_repetition_docs,
        "dup_span_docs": _q_dup_span_docs,
        "bpe_token_count_docs": _q_bpe_token_count_docs,
        "rolling_window_events": _q_rolling_window_events,
        "er_bcubed": _q_er_bcubed,      # rows-only: pytest hand example
        "er_ari": _q_er_ari,            # rows-only: pytest hand example
        "er_pr_curve": _q_er_pr_curve,  # rows-only: pytest exactness
        "er_fs_em": _q_er_fs_em,        # rows-only: pytest EM recovery
        "json_field_stats": _q_json_field_stats,
        "profile_lineitem": _q_profile_lineitem,
        "term_entropy_docs": _q_term_entropy_docs,
        "source_vocab_jaccard": _q_source_vocab_jaccard,
        "users_intersect_except": _q_users_intersect_except,
        "merge_upsert_orders": _q_merge_upsert_orders,
        "global_rank_events": _q_global_rank_events,
        "csv_events_daily": _q_csv_events_daily,
        "pagerank_parts": _q_pagerank_parts,  # rows-only: pytest vs dense
        "er_blocking_phonetic": _q_er_blocking_phonetic,  # rows-only
        "sorted_neighborhood_docs": _q_sorted_neighborhood_docs,
        "er_blocking_sortedneigh": _q_er_blocking_sortedneigh,  # rows-only
        "time_decay_users": _q_time_decay_users,
        "zscore_outliers_events": _q_zscore_outliers_events,
        "orders_above_cust_avg": _q_orders_above_cust_avg,
        "topn_events_ties": _q_topn_events_ties,
        "gap_fill_daily_events": _q_gap_fill_daily_events,
        "meta_blocking_wnp": _q_meta_blocking_wnp,
        "meta_blocking_wep": _q_meta_blocking_wep,
        "prefix_jaccard_join": _q_prefix_jaccard_join,
        "cms_term_counts": _q_cms_term_counts,
        "bigram_lm_docs": _q_bigram_lm_docs,
        "skyline_parts": _q_skyline_parts,
        "pmi_doc_terms": _q_pmi_doc_terms,
        "graph_components_parts": _q_graph_components_parts,
        "cumulative_new_users": _q_cumulative_new_users,
        "embedding_centroids": _q_embedding_centroids,
        "er_blocking_canopy": _q_er_blocking_canopy,  # rows-only
        "equidepth_bins_events": _q_equidepth_bins_events,
        "rank_windows_events": _q_rank_windows_events,
        "scan_pushdown_orders": _q_scan_pushdown_orders,
        "er_blocking_meta": _q_er_blocking_meta,  # rows-only
        "edit_distance_join": _q_edit_distance_join,
        "tfidf_cosine_join": _q_tfidf_cosine_join,
        "association_rules_parts": _q_association_rules_parts,
        "graph_clustering_parts": _q_graph_clustering_parts,
        "mode_event_type_users": _q_mode_event_type_users,
        "incremental_dedup_docs": _q_incremental_dedup_docs,
        "logodds_en_de": _q_logodds_en_de,
        "kfold_embeddings": _q_kfold_embeddings,
        "term_chi2_lang": _q_term_chi2_lang,
        "winsorized_mean_events": _q_winsorized_mean_events,
        "dq_checks_events": _q_dq_checks_events,
        "time_weighted_avg_users": _q_time_weighted_avg_users,
        "hll_users_setops": _q_hll_users_setops,
        "corr_matrix_lineitem": _q_corr_matrix_lineitem,
        "pseudonymize_events": _q_pseudonymize_events,
        "dp_counts_events": _q_dp_counts_events,
        "sortmerge_join_orders": _q_sortmerge_join_orders,
        "leakage_safe_split_docs": _q_leakage_safe_split_docs,
        "distinct_ngram_ratio_docs": _q_distinct_ngram_ratio_docs,
        "near_dup_clusters_docs": _q_near_dup_clusters_docs,
        "dedup_keep_docs": _q_dedup_keep_docs,
        "token_budget_chunks_docs": _q_token_budget_chunks_docs,
        "mix_lang_docs": _q_mix_lang_docs,
    }
    # Window rotation: every oracled query the round-4 driver did NOT
    # check moves to the head (CORRECTNESS_r04.json recorded these 50).
    r4_checked = {
        "normalize_text", "filter_events", "edge_aggregate",
        "alias_prior", "topk_parts", "join_orders_customers",
        "left_join_customers_orders", "customers_without_orders",
        "distinct_sources", "exact_dedup_docs", "token_count_docs",
        "doc_quality", "cooccur_pairs", "grouped_norm",
        "knn_embeddings", "idf_terms", "tfidf_top_terms",
        "abbrev_tokens", "per_user_top_event",
        "lineitem_pricing_summary", "events_daily",
        "union_region_nation", "sessionize_events",
        "asof_click_before_purchase", "windowed_events",
        "sliding_window_events", "range_join_clicks",
        "hash_sample_docs", "stratified_sample_docs", "bm25_docs",
        "corr_lineitem", "event_value_quantiles", "heavy_hitter_terms",
        "window_funcs_events", "bloom_semi_join_orders",
        "rollup_events", "cube_events", "pivot_events",
        "row_number_events", "hll_distinct_terms", "curated_docs_sql",
        "alias_redirect_resolved", "anchor_aliases",
        "ngram_jaccard_dedup", "lang_id_docs", "embedding_near_dup",
        "hll_group_distinct_users", "salted_join_orders",
        "weighted_sample_docs", "scrub_pii_docs",
    }
    oracled = set(oracle_sql())
    head = [k for k in q if k in oracled and k not in r4_checked]
    head_set = set(head)
    return {k: q[k] for k in
            head + [k for k in q if k not in head_set]}


def oracle_sql() -> dict[str, str]:
    return {
        "normalize_text": (
            "SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
            " AS norm_text FROM documents"
        ),
        "filter_events": (
            "SELECT event_id, user_id, event_type, value FROM events "
            "WHERE event_type = 'click' AND value > 10.0"
        ),
        "edge_aggregate": (
            "SELECT user_id, event_type, count(*) AS weight FROM events "
            "GROUP BY user_id, event_type"
        ),
        "alias_prior": (
            "SELECT l_returnflag AS entity, l_linestatus AS alias, "
            "count(*) AS freq, "
            "CAST(round(count(*) * 1000000.0 / sum(count(*)) OVER (PARTITION BY l_linestatus)) AS BIGINT) AS prior_micro "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "topk_parts": (
            "SELECT p_partkey, p_name, p_retailprice FROM part "
            "ORDER BY p_retailprice DESC, p_partkey LIMIT 20"
        ),
        "join_orders_customers": (
            "SELECT c_mktsegment, count(*) AS n_orders, "
            "CAST(round(sum(o_totalprice)) AS BIGINT) AS total_price_usd "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment"
        ),
        # the salted join must be result-identical to the plain join:
        # same SQL as join_orders_customers
        "salted_join_orders": (
            "SELECT c_mktsegment, count(*) AS n_orders, "
            "CAST(round(sum(o_totalprice)) AS BIGINT) AS total_price_usd "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment"
        ),
        "left_join_customers_orders": (
            "SELECT c.c_custkey, "
            "CAST(count(o.o_orderkey) AS BIGINT) AS n_orders "
            "FROM customer c LEFT JOIN "
            "(SELECT * FROM orders WHERE o_totalprice > 300000.0) o "
            "ON o.o_custkey = c.c_custkey GROUP BY 1"
        ),
        "customers_without_orders": (
            "SELECT c_custkey, c_name FROM customer "
            "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders "
            "WHERE o_totalprice > 300000.0)"
        ),
        "distinct_sources": "SELECT DISTINCT source FROM documents",
        "exact_dedup_docs": (
            "SELECT text, min(doc_id) AS keep_id, count(*) AS n_dups "
            "FROM documents GROUP BY text"
        ),
        "token_count_docs": (
            "SELECT doc_id, length(regexp_extract_all(text, '\\S+')) AS n_tokens "
            "FROM documents"
        ),
        "doc_quality": (
            "SELECT doc_id, length(text) AS n_chars, "
            "length(regexp_extract_all(trim(text), '\\s+')) + 1 AS n_tokens, "
            f"round(length(regexp_extract_all(text, '[.,;:!?]')) * 1.0 / greatest(length(text), 1), {_ROUND}) AS punct_ratio, "
            f"round(length(regexp_extract_all(text, '[A-Z]')) * 1.0 / greatest(length(text), 1), {_ROUND}) AS upper_ratio "
            "FROM documents"
        ),
        "cooccur_pairs": (
            "WITH d AS (SELECT DISTINCT user_id, event_type FROM events) "
            "SELECT a.event_type AS type_a, b.event_type AS type_b, "
            "count(*) AS weight "
            "FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type "
            "GROUP BY type_a, type_b"
        ),
        "grouped_norm": (
            "SELECT event_type, "
            "CAST(round(sum(value)) AS BIGINT) AS sum_value_int, "
            "CAST(round(sum(value) * 1000000.0 / (SELECT sum(value) FROM events)) AS BIGINT) AS share_micro "
            "FROM events GROUP BY event_type"
        ),
        "idf_terms": (
            "WITH tok AS (SELECT DISTINCT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term "
            "FROM documents), "
            "n AS (SELECT count(*) AS n_docs FROM documents) "
            "SELECT term, count(*) AS df, "
            "CAST(round(ln(n_docs * 1.0 / count(*)) * 1000000) AS BIGINT) "
            "AS idf_micro FROM tok, n GROUP BY term, n_docs"
        ),
        "tfidf_top_terms": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term "
            "FROM documents), "
            "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok "
            "GROUP BY doc_id, term), "
            "df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok "
            "GROUP BY term), "
            "n AS (SELECT count(*) AS n_docs FROM documents) "
            "SELECT tf.doc_id, tf.term, tf.tf, "
            "CAST(round(tf.tf * ln(n_docs * 1.0 / df.df) * 1000000) AS BIGINT)"
            " AS tfidf_micro "
            "FROM tf JOIN df ON tf.term = df.term, n "
            "QUALIFY row_number() OVER (PARTITION BY tf.doc_id "
            "ORDER BY tf.tf * ln(n_docs * 1.0 / df.df) DESC, tf.term) <= 5"
        ),
        "abbrev_tokens": (
            "SELECT token, count(*) AS n FROM ("
            "SELECT unnest(regexp_extract_all(o_orderpriority, '\\S+')) "
            "AS token FROM orders) "
            "WHERE length(token) BETWEEN 2 AND 10 "
            "AND length(regexp_replace(token, '[^A-Z]', '', 'g')) >= 2 "
            "GROUP BY token"
        ),
        "per_user_top_event": (
            "SELECT user_id, event_id, "
            "CAST(round(value * 10000) AS BIGINT) AS value_e4 FROM events "
            "QUALIFY row_number() OVER (PARTITION BY user_id "
            "ORDER BY value DESC, event_id) = 1"
        ),
        "lineitem_pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty, "
            "CAST(round(sum(l_extendedprice)) AS BIGINT) AS sum_base_usd, "
            "CAST(round(sum(l_extendedprice * (1.0 - l_discount))) AS BIGINT)"
            " AS sum_disc_usd, "
            "count(*) AS n_rows "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "events_daily": (
            "SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type, "
            "count(*) AS n_events, "
            "CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_e2 "
            "FROM events GROUP BY day, event_type"
        ),
        "union_region_nation": (
            "SELECT r_name AS name, 'union_all' AS op FROM region "
            "UNION ALL SELECT n_name, 'union_all' FROM nation "
            "UNION ALL SELECT name, 'intersect' FROM "
            "(SELECT n_name AS name FROM nation WHERE n_nationkey < 15 "
            "INTERSECT SELECT n_name FROM nation WHERE n_nationkey >= 5) "
            "UNION ALL SELECT name, 'except' FROM "
            "(SELECT n_name AS name FROM nation WHERE n_nationkey < 15 "
            "EXCEPT SELECT n_name FROM nation WHERE n_nationkey >= 5)"
        ),
        "knn_embeddings": (
            "WITH q AS (SELECT vec_id, embedding FROM embeddings "
            "ORDER BY vec_id LIMIT 3) "
            "SELECT q.vec_id AS query_id, e.vec_id AS vec_id, "
            "CAST(round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
            "CAST(e.embedding AS DOUBLE[])) * 10000) AS BIGINT) AS cos_e4 "
            "FROM q, embeddings e "
            "QUALIFY row_number() OVER (PARTITION BY q.vec_id "
            "ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
            "CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id) <= 5 "
            "ORDER BY query_id, vec_id"
        ),
        "embedding_near_dup": (
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.4"
        ),
        "ngram_jaccard_dedup": (
            r"WITH w AS (SELECT doc_id, string_split(lower(trim("
            r"regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws "
            "FROM documents), "
            "g AS (SELECT doc_id, unnest(list_distinct("
            "[array_to_string(ws[i:i+2], ' ') "
            "for i in generate_series(1, len(ws)-2)])) AS gram "
            "FROM w WHERE len(ws) >= 3), "
            "s AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id), "
            "i AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "count(*) AS inter FROM g a "
            "JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id "
            "GROUP BY 1, 2) "
            "SELECT i.id_a, i.id_b, "
            "CAST(round(1000000.0 * inter / (sa.sz + sb.sz - inter)) "
            "AS BIGINT) AS jaccard_micro "
            "FROM i JOIN s sa ON sa.doc_id = i.id_a "
            "JOIN s sb ON sb.doc_id = i.id_b "
            "WHERE 1.0 * inter / (sa.sz + sb.sz - inter) >= 0.8 "
            "ORDER BY 1, 2"
        ),
        "alias_redirect_resolved": _redirect_oracle_sql(),
        "anchor_aliases": _anchor_oracle_sql(),
        "sessionize_events": (
            "WITH w AS (SELECT event_id, user_id, ts, "
            "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
            "AS prev_ts FROM events) "
            "SELECT event_id, user_id, "
            "CAST(sum(CASE WHEN prev_ts IS NULL "
            "OR epoch_us(ts) - epoch_us(prev_ts) > 30 * 60 * 1000000 "
            "THEN 1 ELSE 0 END) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) - 1 "
            "AS BIGINT) AS session_idx FROM w"
        ),
        "asof_click_before_purchase": (
            "WITH u AS (SELECT event_id, user_id, ts, event_type "
            "FROM events WHERE event_type IN ('purchase', 'click')), "
            "w AS (SELECT event_id, user_id, event_type, "
            "last_value(CASE WHEN event_type = 'click' THEN event_id END "
            "IGNORE NULLS) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
            "AS prev_click_id FROM u) "
            "SELECT event_id, user_id, prev_click_id FROM w "
            "WHERE event_type = 'purchase' AND prev_click_id IS NOT NULL"
        ),
        "range_join_clicks": (
            "SELECT p.event_id, p.user_id, "
            "CAST(count(c.event_id) AS BIGINT) AS n_clicks_1h "
            "FROM events p LEFT JOIN events c "
            "ON c.user_id = p.user_id AND c.event_type = 'click' "
            "AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts "
            "WHERE p.event_type = 'purchase' "
            "GROUP BY p.event_id, p.user_id"
        ),
        "windowed_events": (
            "SELECT event_type, "
            "(epoch_us(ts) // 21600000000) * 21600000000 AS window_start, "
            "count(*) AS n_events, "
            "CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_e2 "
            "FROM events GROUP BY event_type, window_start"
        ),
        "sliding_window_events": (
            # 6h windows starting every 1h: each event lands in exactly
            # width/step = 6 step-aligned windows
            "SELECT event_type, ws AS window_start, "
            "count(*) AS n_events, "
            "CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_e2 "
            "FROM (SELECT event_type, value, epoch_us(ts) AS e FROM events), "
            "unnest(generate_series("
            "(e // 3600000000) * 3600000000 - 21600000000 + 3600000000, "
            "(e // 3600000000) * 3600000000, 3600000000)) AS t(ws) "
            "GROUP BY event_type, ws"
        ),
        "hash_sample_docs": (
            # Knuth multiplicative hash, seed 7, 10% rate: HUGEINT keeps
            # the 2^32-range multiply exact
            "SELECT doc_id, lang, n_chars FROM documents "
            "WHERE (CAST((doc_id + 7) % 4294967296 AS HUGEINT) "
            "* 2654435761) % 4294967296 < 429496729"
        ),
        "stratified_sample_docs": (
            "SELECT doc_id, lang, n_chars FROM ("
            "SELECT doc_id, lang, n_chars, row_number() OVER ("
            "PARTITION BY lang ORDER BY "
            "(CAST((doc_id + 7) % 4294967296 AS HUGEINT) "
            "* 2654435761) % 4294967296, doc_id) AS rn "
            "FROM documents) WHERE rn <= 10"
        ),
        "bm25_docs": (
            # Okapi BM25, Lucene idf = ln(1 + (N-df+.5)/(df+.5)),
            # k1=1.2 b=0.75; N/avgdl over ALL docs; [a-z0-9]+ tokens
            "WITH d AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9]+') AS ts "
            "FROM documents), "
            "dl AS (SELECT doc_id, len(ts) AS dlen FROM d), "
            "st AS (SELECT count(*) AS n, "
            "1.0 * sum(dlen) / count(*) AS avgdl FROM dl), "
            "tf AS (SELECT doc_id, term, count(*) AS tf FROM ("
            "SELECT doc_id, unnest(ts) AS term FROM d) "
            "WHERE term IN ('hash', 'join', 'vector', 'stream') "
            "GROUP BY 1, 2), "
            "df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), "
            "sc AS (SELECT tf.doc_id, sum("
            "ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5)) "
            "* tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dlen "
            "/ st.avgdl))) AS score "
            "FROM tf JOIN df USING (term) JOIN dl USING (doc_id) "
            "CROSS JOIN st GROUP BY 1) "
            "SELECT doc_id, CAST(round(score * 10000) AS BIGINT) "
            "AS score_e4 FROM sc "
            "ORDER BY score_e4 DESC, doc_id LIMIT 20"
        ),
        "corr_lineitem": (
            "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, "
            "CAST(round(corr(l_extendedprice, l_quantity) * 1000000) "
            "AS BIGINT) AS corr_e6 "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "event_value_quantiles": (
            "SELECT event_type, "
            "unnest([0.25, 0.5, 0.9, 0.99]) AS quantile, "
            "CAST(round(unnest(quantile_cont(value, [0.25, 0.5, 0.9, 0.99]))"
            " * 10000) AS BIGINT) AS value_e4 "
            "FROM events GROUP BY event_type"
        ),
        "heavy_hitter_terms": (
            # the sketch+verify result is EXACT (min_freq > n/(k+1)), so
            # the oracle is the plain full groupby it avoids at scale
            "WITH tok AS (SELECT "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term "
            "FROM documents) "
            "SELECT term, CAST(count(*) AS BIGINT) AS freq FROM tok "
            "GROUP BY term HAVING count(*) >= 100"
        ),
        "bloom_semi_join_orders": (
            "SELECT o.o_orderkey, o.o_custkey FROM orders o "
            "WHERE EXISTS (SELECT 1 FROM customer c "
            "WHERE c.c_custkey = o.o_custkey "
            "AND c.c_mktsegment = 'BUILDING')"
        ),
        "rollup_events": (
            "SELECT event_type, user_id, count(*) AS n_events, "
            "CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_e2 "
            "FROM events GROUP BY ROLLUP(event_type, user_id)"
        ),
        "cube_events": (
            "SELECT event_type, user_id, count(*) AS n_events, "
            "CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_e2 "
            "FROM events GROUP BY CUBE(event_type, user_id)"
        ),
        "pivot_events": (
            "SELECT user_id, "
            "count(*) FILTER (WHERE event_type = 'click') AS n_click, "
            "count(*) FILTER (WHERE event_type = 'view') AS n_view, "
            "count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase, "
            "count(*) FILTER (WHERE event_type = 'signup') AS n_signup, "
            "count(*) FILTER (WHERE event_type = 'error') AS n_error "
            "FROM events GROUP BY user_id"
        ),
        "row_number_events": (
            "SELECT event_id, user_id, "
            "CAST(row_number() OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn "
            "FROM events"
        ),
        "window_funcs_events": (
            # coalesce matches the engine's nancumsum (nulls add 0; a
            # leading null row carries 0, not NULL)
            "SELECT event_id, user_id, "
            "CAST(round(sum(coalesce(value, 0)) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) * 100) AS BIGINT) "
            "AS cum_value_e2, "
            "lag(event_id) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS prev_id, "
            "lead(event_id) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS next_id, "
            "first_value(event_id) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS first_id, "
            "CAST(dense_rank() OVER "
            "(PARTITION BY user_id ORDER BY value DESC) AS BIGINT) "
            "AS dense_rank_value, "
            "CAST(ntile(4) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS tile "
            "FROM events"
        ),
        "lang_id_docs": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t "
            "FROM documents), "
            "hits AS (SELECT doc_id, "
            f"sum(CASE WHEN t IN ({_sql_list(_LID_EN)}) THEN 1 ELSE 0 END) AS en, "
            f"sum(CASE WHEN t IN ({_sql_list(_LID_DE)}) THEN 1 ELSE 0 END) AS de, "
            f"sum(CASE WHEN t IN ({_sql_list(_LID_FR)}) THEN 1 ELSE 0 END) AS fr "
            "FROM tok GROUP BY doc_id) "
            "SELECT d.doc_id, d.lang, CASE "
            "WHEN coalesce(greatest(en, de, fr), 0) = 0 THEN 'unknown' "
            "WHEN en >= de AND en >= fr THEN 'en' "
            "WHEN de >= fr THEN 'de' ELSE 'fr' END AS lang_pred "
            "FROM documents d LEFT JOIN hits USING (doc_id)"
        ),
        # bit-exact DuckDB twin of the md5-mode HyperLogLog (p=12):
        # hash = first 8 md5 bytes; register = top 12 hash bits; rho =
        # leading-zero count of the low-52-bit payload + 1 (53 when the
        # payload is 0); estimate = alpha_m*m^2/sum(2^-reg) with the
        # small-range correction m*ln(m/zeros). Flajolet et al. 2007.
        "hll_distinct_terms": (
            "WITH tok AS (SELECT "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term "
            "FROM documents), "
            "u AS (SELECT DISTINCT term FROM tok), "
            "h AS (SELECT ('0x' || substr(md5(term), 1, 16))::UBIGINT "
            "AS hv FROM u), "
            "parts AS (SELECT hv // (4503599627370496)::UBIGINT AS idx, "
            "hv % (4503599627370496)::UBIGINT AS payload FROM h), "
            "regs AS (SELECT idx, max(CASE WHEN payload = 0 THEN 53 "
            "ELSE 53 - length(bin(payload)) END) AS r "
            "FROM parts GROUP BY idx), "
            "agg AS (SELECT sum(power(2.0, -r)) AS s, count(*) AS nz "
            "FROM regs), "
            "est AS (SELECT (0.7213 / (1 + 1.079 / 4096.0)) * 4096.0 * "
            "4096.0 / (s + (4096 - nz)) AS raw, (4096 - nz) AS zeros "
            "FROM agg) "
            "SELECT CAST(round(CASE WHEN raw <= 2.5 * 4096 AND zeros > 0 "
            "THEN 4096.0 * ln(4096.0 / zeros) ELSE raw END) AS BIGINT) "
            "AS estimate_int, "
            "(SELECT count(*) FROM u) AS exact_int, 12 AS p FROM est"
        ),
        # per-group twin of the hll_distinct_terms oracle: identical
        # register/rho/correction math with GROUP BY event_type threaded
        # through every CTE; exact side joined on
        "hll_group_distinct_users": (
            "WITH u AS (SELECT DISTINCT event_type, "
            "CAST(user_id AS VARCHAR) AS v FROM events), "
            "h AS (SELECT event_type, "
            "('0x' || substr(md5(v), 1, 16))::UBIGINT AS hv FROM u), "
            "parts AS (SELECT event_type, "
            "hv // (4503599627370496)::UBIGINT AS idx, "
            "hv % (4503599627370496)::UBIGINT AS payload FROM h), "
            "regs AS (SELECT event_type, idx, "
            "max(CASE WHEN payload = 0 THEN 53 "
            "ELSE 53 - length(bin(payload)) END) AS r "
            "FROM parts GROUP BY event_type, idx), "
            "agg AS (SELECT event_type, sum(power(2.0, -r)) AS s, "
            "count(*) AS nz FROM regs GROUP BY event_type), "
            "est AS (SELECT event_type, (0.7213 / (1 + 1.079 / 4096.0)) "
            "* 4096.0 * 4096.0 / (s + (4096 - nz)) AS raw, "
            "(4096 - nz) AS zeros FROM agg), "
            "ex AS (SELECT event_type, count(DISTINCT user_id) "
            "AS exact_int FROM events GROUP BY event_type) "
            "SELECT est.event_type, "
            "CAST(round(CASE WHEN raw <= 2.5 * 4096 AND zeros > 0 "
            "THEN 4096.0 * ln(4096.0 / zeros) ELSE raw END) AS BIGINT) "
            "AS estimate_int, ex.exact_int, 12 AS p "
            "FROM est JOIN ex USING (event_type) ORDER BY est.event_type"
        ),
        "scrub_pii_docs": _pii_oracle_sql(),
        # native FULL OUTER join summary (both sides carry unmatched keys)
        "full_outer_join_summary": (
            "WITH o AS (SELECT o_custkey, sum(o_totalprice) AS big_total "
            "FROM orders WHERE o_totalprice > 420000.0 GROUP BY o_custkey), "
            "c AS (SELECT c_custkey, c_acctbal FROM customer "
            "WHERE c_acctbal < 1000.0), "
            "j AS (SELECT o.big_total, c.c_acctbal FROM o "
            "FULL JOIN c ON o.o_custkey = c.c_custkey) "
            "SELECT "
            "count(*) FILTER (big_total IS NOT NULL AND c_acctbal IS NOT "
            "NULL) AS n_both, "
            "count(*) FILTER (big_total IS NOT NULL AND c_acctbal IS NULL) "
            "AS n_left_only, "
            "count(*) FILTER (big_total IS NULL AND c_acctbal IS NOT NULL) "
            "AS n_right_only, "
            "CAST(round(sum(coalesce(big_total, 0.0))) AS BIGINT) "
            "AS left_total_usd FROM j"
        ),
        # Efraimidis-Spirakis weighted sample: u from the first 8 md5
        # bytes of "{doc_id}:{seed}" (the hll md5 trick), e = -ln(u)/w,
        # k smallest — the Ray side must pick the identical 64 rows
        "weighted_sample_docs": (
            "WITH s AS (SELECT doc_id, n_chars, "
            "-ln(((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':0'), "
            "1, 16))::UBIGINT)::DOUBLE + 0.5) / 18446744073709551616.0) "
            "/ n_chars AS e FROM documents WHERE n_chars > 0) "
            "SELECT doc_id, n_chars FROM s ORDER BY e, doc_id LIMIT 64"
        ),
        # the curation funnel's SQL-expressible slice: quality filter +
        # exact-dedup keep-min (token/punct definitions identical to the
        # doc_quality oracle; dedup identical to exact_dedup_docs)
        "curated_docs_sql": (
            "WITH q AS (SELECT doc_id, text, "
            "length(regexp_extract_all(trim(text), '\\s+')) + 1 AS n_tokens, "
            "length(regexp_extract_all(text, '[.,;:!?]')) * 1.0 "
            "/ greatest(length(text), 1) AS punct_ratio FROM documents), "
            "good AS (SELECT * FROM q "
            "WHERE n_tokens >= 5 AND punct_ratio <= 0.2), "
            "keep AS (SELECT min(doc_id) AS doc_id FROM good "
            "GROUP BY text) "
            "SELECT g.doc_id, g.n_tokens FROM good g JOIN keep USING (doc_id)"
        ),
        # TPC-H Q5 shape: revenue per ASIA nation, local-supplier rule
        "multiway_join_revenue": (
            "SELECT n_name, "
            "CAST(round(sum(l_extendedprice * (1.0 - l_discount))) "
            "AS BIGINT) AS revenue_usd "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'ASIA' AND s_nationkey = c_nationkey "
            "AND o_orderdate < TIMESTAMP '1998-01-01' "
            "GROUP BY n_name"
        ),
        "cross_join_nation_types": (
            "SELECT n_name, event_type FROM nation "
            "CROSS JOIN (SELECT DISTINCT event_type FROM events)"
        ),
        "string_agg_sources": (
            "SELECT lang, count(DISTINCT source) AS n_vals, "
            "string_agg(DISTINCT source, ',' ORDER BY source) AS sources "
            "FROM documents GROUP BY lang"
        ),
        # fixed-width histogram, edge-clamped, zero buckets included
        "histogram_events": (
            "WITH g AS (SELECT unnest(range(20)) AS bucket), "
            "b AS (SELECT CAST(least(greatest(floor(value / 25.0), 0), 19) "
            "AS BIGINT) AS bucket FROM events), "
            "c AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket) "
            "SELECT g.bucket, CAST(g.bucket * 2500 AS BIGINT) AS lo_e2, "
            "CAST((g.bucket + 1) * 2500 AS BIGINT) AS hi_e2, "
            "coalesce(c.n, 0) AS n FROM g LEFT JOIN c USING (bucket)"
        ),
        "grouping_sets_events": (
            "SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day, "
            "count(*) AS n_events, "
            "CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_e2 "
            "FROM events "
            "GROUP BY GROUPING SETS ((event_type, day), (day), ())"
        ),
        "explode_doc_terms": (
            "WITH m AS (SELECT doc_id, "
            "regexp_extract_all(text, '[a-z]{7,}') AS arr FROM documents) "
            "SELECT doc_id, unnest(arr) AS term, "
            "generate_subscripts(arr, 1) AS pos FROM m"
        ),
        # golden records: same head key / tie-breaks as
        # analytics.golden_records (min id, longest text then min id,
        # mode then lexicographic min)
        "canonical_docs": (
            "WITH k AS (SELECT doc_id, text, lang, source, "
            "array_to_string(list_slice(regexp_extract_all(lower(text), "
            "'[a-z0-9]+'), 1, 4), ' ') AS _k FROM documents), "
            "g AS (SELECT _k, min(doc_id) AS keep_id, "
            "count(*) AS n_members FROM k GROUP BY _k), "
            "rep AS (SELECT _k, doc_id AS rep_id FROM k "
            "QUALIFY row_number() OVER (PARTITION BY _k "
            "ORDER BY length(text) DESC, doc_id) = 1), "
            "lm AS (SELECT _k, lang AS lang_mode FROM "
            "(SELECT _k, lang, count(*) AS c FROM k GROUP BY _k, lang) "
            "QUALIFY row_number() OVER (PARTITION BY _k "
            "ORDER BY c DESC, lang) = 1), "
            "sm AS (SELECT _k, source AS source_mode FROM "
            "(SELECT _k, source, count(*) AS c FROM k GROUP BY _k, source) "
            "QUALIFY row_number() OVER (PARTITION BY _k "
            "ORDER BY c DESC, source) = 1) "
            "SELECT keep_id, n_members, rep_id, lang_mode, source_mode "
            "FROM g JOIN rep USING (_k) JOIN lm USING (_k) "
            "JOIN sm USING (_k)"
        ),
        # greedy-earliest ordered funnel: each step strictly after the
        # previous step's completion time
        "funnel_events": (
            "WITH s1 AS (SELECT user_id, min(ts) AS t FROM events "
            "WHERE event_type = 'view' GROUP BY user_id), "
            "s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            "JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t "
            "WHERE e.event_type = 'click' GROUP BY e.user_id), "
            "s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            "JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t "
            "WHERE e.event_type = 'purchase' GROUP BY e.user_id) "
            "SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type, "
            "count(*) AS n_users FROM s1 "
            "UNION ALL SELECT 2, 'click', count(*) FROM s2 "
            "UNION ALL SELECT 3, 'purchase', count(*) FROM s3"
        ),
        # Monday-start cohort week of each user's first event; distinct
        # users active at each whole-week offset
        "cohort_retention": (
            "WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0 "
            "FROM events GROUP BY user_id), "
            "a AS (SELECT DISTINCT e.user_id, "
            "CAST(date_trunc('week', f.d0) AS VARCHAR) AS cohort_week, "
            "CAST(floor(date_diff('day', f.d0, CAST(e.ts AS DATE)) / 7.0) "
            "AS BIGINT) AS week_offset "
            "FROM events e JOIN f USING (user_id)) "
            "SELECT cohort_week, week_offset, count(*) AS n_users "
            "FROM a GROUP BY cohort_week, week_offset"
        ),
        "event_paths": (
            "WITH p AS (SELECT user_id, "
            "CAST(CAST(ts AS DATE) AS VARCHAR) AS day, "
            "string_agg(event_type, '>' ORDER BY ts, event_id) AS path "
            "FROM events GROUP BY user_id, day) "
            "SELECT path, count(*) AS n_user_days FROM p GROUP BY path"
        ),
        "transition_counts": (
            "WITH l AS (SELECT user_id, event_type, "
            "lag(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS prev_type FROM events) "
            "SELECT prev_type, event_type AS next_type, "
            "count(*) AS n_transitions FROM l "
            "WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type"
        ),
        "unpivot_part": (
            "SELECT p_partkey, name, "
            "CAST(round(value * 100) AS BIGINT) AS value_e2 FROM "
            "(UNPIVOT (SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size, "
            "p_retailprice FROM part) "
            "ON p_size, p_retailprice INTO NAME name VALUE value)"
        ),
        # word tokenization in the three below mirrors ngram_jaccard_dedup:
        # lower -> collapse ws -> trim -> split on single spaces
        "decontaminate_docs": (
            r"WITH w AS (SELECT doc_id, string_split(lower(trim("
            r"regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws "
            "FROM documents), "
            "g AS (SELECT doc_id, unnest(list_distinct("
            "[array_to_string(ws[i:i+3], ' ') "
            "for i in generate_series(1, len(ws)-3)])) AS gram "
            "FROM w WHERE len(ws) >= 4), "
            "ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0), "
            "h AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS "
            "n_hit_grams FROM g JOIN ev USING (gram) "
            "WHERE g.doc_id % 10 <> 0 GROUP BY g.doc_id) "
            "SELECT d.doc_id, "
            "CAST(coalesce(h.n_hit_grams, 0) AS BIGINT) AS n_hit_grams, "
            "CAST(CASE WHEN coalesce(h.n_hit_grams, 0) > 0 THEN 1 ELSE 0 "
            "END AS BIGINT) AS contaminated "
            "FROM documents d LEFT JOIN h USING (doc_id) "
            "WHERE d.doc_id % 10 <> 0"
        ),
        "repetition_docs": (
            r"WITH w AS (SELECT doc_id, string_split(lower(trim("
            r"regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws "
            "FROM documents), "
            "tok AS (SELECT doc_id, unnest(ws) AS t FROM w), "
            "c AS (SELECT doc_id, t, count(*) AS c FROM tok "
            "GROUP BY doc_id, t), "
            "wa AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, "
            "max(c) AS mx, sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup "
            "FROM c GROUP BY doc_id), "
            "g AS (SELECT doc_id, unnest([array_to_string(ws[i:i+1], ' ') "
            "for i in generate_series(1, len(ws)-1)]) AS gram "
            "FROM w WHERE len(ws) >= 2), "
            "gc AS (SELECT doc_id, gram, count(*) AS c FROM g "
            "GROUP BY doc_id, gram), "
            "ga AS (SELECT doc_id, max(c) AS mx2, sum(c) AS n2 FROM gc "
            "GROUP BY doc_id) "
            "SELECT wa.doc_id, wa.n_tokens, "
            "round(wa.mx * 1.0 / wa.n_tokens, 6) AS top_word_frac, "
            "round(wa.dup * 1.0 / wa.n_tokens, 6) AS dup_word_frac, "
            "round(coalesce(ga.mx2 * 1.0 / ga.n2, 0), 6) "
            "AS top_bigram_frac "
            "FROM wa LEFT JOIN ga USING (doc_id)"
        ),
        "dup_span_docs": (
            r"WITH w AS (SELECT doc_id, string_split(lower(trim("
            r"regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws "
            "FROM documents), "
            "g AS (SELECT doc_id, unnest(list_distinct("
            "[array_to_string(ws[i:i+4], ' ') "
            "for i in generate_series(1, len(ws)-4)])) AS gram "
            "FROM w WHERE len(ws) >= 5), "
            "s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams "
            "FROM g GROUP BY doc_id), "
            "nd AS (SELECT gram, count(*) AS nd FROM g GROUP BY gram), "
            "d AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS "
            "n_dup_grams FROM g JOIN nd USING (gram) WHERE nd.nd > 1 "
            "GROUP BY g.doc_id) "
            "SELECT s.doc_id, s.n_grams, "
            "CAST(coalesce(d.n_dup_grams, 0) AS BIGINT) AS n_dup_grams, "
            "round(coalesce(d.n_dup_grams, 0) * 1.0 / s.n_grams, 6) "
            "AS dup_frac "
            "FROM s LEFT JOIN d USING (doc_id)"
        ),
        # identical RE2 pattern on both sides (Arrow and DuckDB both
        # compile RE2 with leftmost-first alternation), so the match
        # counts are exact twins
        "bpe_token_count_docs": (
            "SELECT doc_id, "
            r"CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) "
            "AS n_ws_tokens, "
            "CAST(len(regexp_extract_all(text, '"
            + _BPE_PAT.replace("'", "''") +
            "')) AS BIGINT) AS n_bpe_tokens "
            "FROM documents"
        ),
        "rolling_window_events": (
            "SELECT event_id, user_id, "
            "round(avg(value) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id "
            "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS roll_avg, "
            "round(max(value) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id "
            "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS roll_max "
            "FROM events"
        ),
        # json_field_agg's regex extract of a flat scalar key is the
        # semantic twin of json_extract_string on these props blobs
        "json_field_stats": (
            "SELECT event_type, "
            "count(json_extract_string(props, '$.k')) AS n, "
            "sum(CAST(json_extract_string(props, '$.k') AS DOUBLE)) "
            "AS sum_k FROM events GROUP BY event_type"
        ),
        "profile_lineitem": (
            "SELECT * FROM ("
            + " UNION ALL ".join(
                f"SELECT '{c}' AS \"column\", count(*) AS n, "
                f"count(*) - count({c}) AS nulls, "
                f"CAST(min({c}) AS DOUBLE) AS min_v, "
                f"CAST(max({c}) AS DOUBLE) AS max_v, "
                f"CAST(floor(sum({c}) * 1e4 + 0.5) AS BIGINT) AS sum_e4 "
                f"FROM lineitem"
                for c in ("l_quantity", "l_extendedprice",
                          "l_discount", "l_tax"))
            + ")"
        ),
        "term_entropy_docs": (
            "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) "
            "AS term FROM documents), "
            "tf AS (SELECT doc_id, term, count(*) AS c FROM toks "
            "WHERE term <> '' GROUP BY doc_id, term), "
            "tot AS (SELECT doc_id, sum(c) AS s FROM tf GROUP BY doc_id), "
            "ent AS (SELECT tf.doc_id, "
            "sum(-(c * 1.0 / s) * log2(c * 1.0 / s)) AS h "
            "FROM tf JOIN tot USING (doc_id) GROUP BY tf.doc_id) "
            "SELECT d.doc_id, CAST(floor(coalesce(e.h, 0) * 1e4 + 0.5) "
            "AS BIGINT) AS entropy_e4 "
            "FROM documents d LEFT JOIN ent e ON d.doc_id = e.doc_id"
        ),
        "source_vocab_jaccard": (
            "WITH v AS (SELECT DISTINCT source, term FROM ("
            "SELECT source, unnest(string_split(text, ' ')) AS term "
            "FROM documents) WHERE term <> ''), "
            "sz AS (SELECT source, count(*) AS nv FROM v GROUP BY source), "
            "i AS (SELECT a.source AS key_a, b.source AS key_b, "
            "count(*) AS inter FROM v a JOIN v b ON a.term = b.term "
            "AND a.source < b.source GROUP BY 1, 2) "
            "SELECT key_a, key_b, inter, "
            "sa.nv + sb.nv - inter AS union_sz, "
            "CAST(floor(inter * 1e6 / (sa.nv + sb.nv - inter) + 0.5) "
            "AS BIGINT) AS jaccard_e6 "
            "FROM i JOIN sz sa ON i.key_a = sa.source "
            "JOIN sz sb ON i.key_b = sb.source"
        ),
        # genuinely INTERSECT / EXCEPT in the oracle; the Ray side does
        # it in one groupby pass instead of three id-space shuffles
        "users_intersect_except": (
            "WITH c AS (SELECT DISTINCT user_id FROM events "
            "WHERE event_type = 'click'), "
            "p AS (SELECT DISTINCT user_id FROM events "
            "WHERE event_type = 'purchase') "
            "SELECT user_id, 'both' AS setop FROM "
            "(SELECT * FROM c INTERSECT SELECT * FROM p) "
            "UNION ALL "
            "SELECT user_id, 'left_only' AS setop FROM "
            "(SELECT * FROM c EXCEPT SELECT * FROM p)"
        ),
        # MERGE INTO semantics: delta (repriced open orders) wins per
        # key, base rows without a delta pass through
        "merge_upsert_orders": (
            "WITH delta AS (SELECT o_orderkey, o_orderstatus, "
            "CAST(floor(o_totalprice * 1.1 * 100 + 0.5) AS BIGINT) "
            "AS price_e2 FROM orders WHERE o_orderstatus = 'O') "
            "SELECT b.o_orderkey, b.o_orderstatus, "
            "coalesce(d.price_e2, "
            "CAST(floor(b.o_totalprice * 100 + 0.5) AS BIGINT)) "
            "AS price_e2 "
            "FROM orders b LEFT JOIN delta d USING (o_orderkey)"
        ),
        # unique event ids make rank() == row_number under this ORDER BY
        "global_rank_events": (
            "SELECT event_id, "
            "rank() OVER (ORDER BY value, event_id) AS rnk FROM events"
        ),
        # the Ray side reads a CSV export of the same rows — matching
        # this parquet-view oracle proves the second source format
        "csv_events_daily": (
            "SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
            "count(*) AS n, "
            "CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) "
            "AS sum_value_e2 "
            "FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')"
        ),
        # window-4 sorted neighborhood == self-join on rank distance 1-3
        # under the identical (7-char key, doc_id) total order
        "sorted_neighborhood_docs": (
            "WITH k AS (SELECT doc_id, "
            "substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), "
            "1, 7) AS key7 FROM documents), "
            "r AS (SELECT doc_id, "
            "row_number() OVER (ORDER BY key7, doc_id) AS rnk FROM k) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "CAST(b.rnk - a.rnk AS BIGINT) AS dist "
            "FROM r a JOIN r b ON b.rnk > a.rnk AND b.rnk - a.rnk <= 3"
        ),
        "time_decay_users": (
            "WITH tref AS (SELECT max(ts) AS tr FROM events) "
            "SELECT user_id, count(*) AS n, "
            "CAST(floor(sum(value * exp(-(ln(2) / 86400.0) * "
            "((epoch_us(tr) - epoch_us(ts)) / 1e6))) * 1e6 + 0.5) "
            "AS BIGINT) AS decayed_e6 "
            "FROM events, tref GROUP BY user_id"
        ),
        "zscore_outliers_events": (
            "WITH st AS (SELECT event_type, "
            "sum(value) / count(*) AS mu, "
            "sqrt(greatest(sum(value * value) / count(*) - "
            "(sum(value) / count(*)) * (sum(value) / count(*)), 0)) "
            "AS sd FROM events GROUP BY event_type) "
            "SELECT e.event_id, e.event_type, e.value, "
            "CAST(floor((CASE WHEN sd > 0 THEN (value - mu) / sd "
            "ELSE 0 END) * 1e4 + 0.5) AS BIGINT) AS z_e4 "
            "FROM events e JOIN st USING (event_type) "
            "WHERE abs(CASE WHEN sd > 0 THEN (value - mu) / sd "
            "ELSE 0 END) > 3.0"
        ),
        "orders_above_cust_avg": (
            # exact-cents mean (sum of round(v*100) + count): the float
            # avg's last ulp depends on accumulation order and flipped
            # the e2 rounding vs the Ray side — 1.3*sc/c over the same
            # two integers is bit-identical in both engines
            "WITH a AS (SELECT o_custkey, "
            "sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sc, "
            "count(*) AS c FROM orders GROUP BY o_custkey) "
            "SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, "
            "CAST(floor(1.3 * a.sc / a.c + 0.5) AS BIGINT) "
            "AS threshold_e2 "
            "FROM orders o JOIN a USING (o_custkey) "
            "WHERE round(o.o_totalprice * 100) > 1.3 * a.sc / a.c"
        ),
        "topn_events_ties": (
            "SELECT user_id, event_id, value, rnk FROM ("
            "SELECT user_id, event_id, value, rank() OVER ("
            "PARTITION BY user_id ORDER BY value DESC) AS rnk "
            "FROM events) WHERE rnk <= 2"
        ),
        "gap_fill_daily_events": (
            "WITH b AS (SELECT min(date_trunc('day', ts)) AS lo, "
            "max(date_trunc('day', ts)) AS hi FROM events), "
            "days AS (SELECT unnest(generate_series("
            "(SELECT lo FROM b), (SELECT hi FROM b), "
            "INTERVAL 1 DAY)) AS day), "
            "cats AS (SELECT DISTINCT event_type FROM events), "
            "cnts AS (SELECT event_type, date_trunc('day', ts) AS day, "
            "count(*) AS cnt FROM events GROUP BY 1, 2) "
            "SELECT c.event_type, d.day, coalesce(n.cnt, 0) AS cnt "
            "FROM cats c CROSS JOIN days d "
            "LEFT JOIN cnts n ON n.event_type = c.event_type "
            "AND n.day = d.day"
        ),
        # the sort-merge strategy must be result-identical to the hash
        # join: same SQL as join_orders_customers
        "sortmerge_join_orders": (
            "SELECT c_mktsegment, count(*) AS n_orders, "
            "CAST(round(sum(o_totalprice)) AS BIGINT) "
            "AS total_price_usd "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment"
        ),
        "pseudonymize_events": (
            "SELECT event_id, "
            "CAST(((CAST((user_id + 2654435769) % 4294967296 "
            "AS HUGEINT) * 2654435761) % 4294967296) AS BIGINT) "
            "AS pseudo_id FROM events"
        ),
        "dedup_keep_docs": (
            r"WITH RECURSIVE "
            r"w AS (SELECT doc_id, string_split(lower(trim("
            r"regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws "
            "FROM documents), "
            "g AS (SELECT doc_id, unnest(list_distinct("
            "[array_to_string(ws[i:i+2], ' ') "
            "for i in generate_series(1, len(ws)-2)])) AS gram "
            "FROM w WHERE len(ws) >= 3), "
            "s AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id), "
            "i AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "count(*) AS inter FROM g a "
            "JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id "
            "GROUP BY 1, 2), "
            "p AS (SELECT i.id_a, i.id_b FROM i "
            "JOIN s sa ON sa.doc_id = i.id_a "
            "JOIN s sb ON sb.doc_id = i.id_b "
            "WHERE 1.0 * inter / (sa.sz + sb.sz - inter) >= 0.8), "
            "edges AS (SELECT DISTINCT src, dst FROM ("
            "SELECT id_a AS src, id_b AS dst FROM p "
            "UNION ALL SELECT id_b, id_a FROM p)), "
            "lp AS (SELECT node, node AS lbl FROM ("
            "SELECT DISTINCT src AS node FROM edges) "
            "UNION SELECT e.dst AS node, lp.lbl FROM lp "
            "JOIN edges e ON lp.node = e.src), "
            "comp AS (SELECT node, min(lbl) AS c FROM lp GROUP BY node) "
            "SELECT d.doc_id, d.text FROM documents d "
            "LEFT JOIN comp ON d.doc_id = comp.node "
            "WHERE COALESCE(comp.c, d.doc_id) = d.doc_id"
        ),
        "near_dup_clusters_docs": (
            r"WITH RECURSIVE "
            r"w AS (SELECT doc_id, string_split(lower(trim("
            r"regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws "
            "FROM documents), "
            "g AS (SELECT doc_id, unnest(list_distinct("
            "[array_to_string(ws[i:i+2], ' ') "
            "for i in generate_series(1, len(ws)-2)])) AS gram "
            "FROM w WHERE len(ws) >= 3), "
            "s AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id), "
            "i AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "count(*) AS inter FROM g a "
            "JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id "
            "GROUP BY 1, 2), "
            "p AS (SELECT i.id_a, i.id_b FROM i "
            "JOIN s sa ON sa.doc_id = i.id_a "
            "JOIN s sb ON sb.doc_id = i.id_b "
            "WHERE 1.0 * inter / (sa.sz + sb.sz - inter) >= 0.8), "
            "edges AS (SELECT DISTINCT src, dst FROM ("
            "SELECT id_a AS src, id_b AS dst FROM p "
            "UNION ALL SELECT id_b, id_a FROM p)), "
            "lp AS (SELECT node, node AS lbl FROM ("
            "SELECT DISTINCT src AS node FROM edges) "
            "UNION SELECT e.dst AS node, lp.lbl FROM lp "
            "JOIN edges e ON lp.node = e.src), "
            "comp AS (SELECT node, min(lbl) AS c FROM lp GROUP BY node) "
            "SELECT d.doc_id, COALESCE(comp.c, d.doc_id) AS cluster_id "
            "FROM documents d LEFT JOIN comp ON d.doc_id = comp.node"
        ),
        "distinct_ngram_ratio_docs": (
            r"WITH w AS (SELECT doc_id, string_split(lower(trim("
            r"regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws "
            "FROM documents), "
            "g AS (SELECT 1 AS n, unnest([array_to_string(ws[i:i], ' ') "
            "for i in generate_series(1, len(ws))]) AS gram FROM w "
            "WHERE len(ws) >= 1 "
            "UNION ALL "
            "SELECT 2, unnest([array_to_string(ws[i:i+1], ' ') "
            "for i in generate_series(1, len(ws)-1)]) FROM w "
            "WHERE len(ws) >= 2 "
            "UNION ALL "
            "SELECT 3, unnest([array_to_string(ws[i:i+2], ' ') "
            "for i in generate_series(1, len(ws)-2)]) FROM w "
            "WHERE len(ws) >= 3) "
            "SELECT n, count(*) AS total_ngrams, "
            "count(DISTINCT gram) AS distinct_ngrams, "
            "CAST(floor(count(DISTINCT gram) * 1.0 / count(*) * 1000000 "
            "+ 0.5) AS BIGINT) AS ratio_e6 FROM g GROUP BY n"
        ),
        "leakage_safe_split_docs": (
            # same 32-bit-ring keyed hash as pseudonymize, drawn once
            # per text group's min-id representative; thresholds are
            # floor(0.8 * 2^32) and floor(0.9 * 2^32)
            "WITH g AS (SELECT doc_id, "
            "min(doc_id) OVER (PARTITION BY text) AS rep_id "
            "FROM documents), "
            "h AS (SELECT doc_id, rep_id, "
            "CAST(((CAST((rep_id + 2654435769) % 4294967296 "
            "AS HUGEINT) * 2654435761) % 4294967296) AS BIGINT) AS hv "
            "FROM g) "
            "SELECT doc_id, rep_id, "
            "CASE WHEN hv < 3435973836 THEN 'train' "
            "WHEN hv < 3865470566 THEN 'val' ELSE 'test' END AS split "
            "FROM h"
        ),
        "token_budget_chunks_docs": (
            "WITH t AS (SELECT doc_id, "
            "len(regexp_extract_all(text, '\\S+')) AS ntok "
            "FROM documents), "
            "c AS (SELECT doc_id, ntok, COALESCE(sum(ntok) OVER ("
            "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING), 0) AS cb FROM t) "
            "SELECT doc_id, CAST(ntok AS BIGINT) AS ntok, "
            "CAST(cb // 512 AS BIGINT) AS chunk_id FROM c"
        ),
        "mix_lang_docs": (
            "WITH r AS (SELECT doc_id, lang, "
            "row_number() OVER (PARTITION BY lang ORDER BY doc_id) "
            "AS rr FROM documents), "
            "p AS (SELECT doc_id, lang, (rr - 0.5) / "
            "(CASE lang WHEN 'en' THEN 3.0 ELSE 1.0 END) AS pos "
            "FROM r) "
            "SELECT doc_id, lang, row_number() OVER ("
            "ORDER BY pos, doc_id) AS mix_rank FROM p"
        ),
        "dp_counts_events": (
            "WITH c AS (SELECT event_type, count(*) AS n FROM events "
            "GROUP BY event_type), "
            "u AS (SELECT event_type, n, "
            "('0x' || substr(md5('11|' || event_type), 1, 16))"
            "::UBIGINT / power(2.0, 64) AS uu FROM c) "
            "SELECT event_type, "
            "CAST(floor(n - sign(uu - 0.5) * "
            "ln(1.0 - 2.0 * abs(uu - 0.5)) + 0.5) AS BIGINT) "
            "AS noisy_n FROM u"
        ),
        # three md5 HLL sketches (a, b, union-multiset) threaded through
        # one grp-labeled register pipeline; intersection by
        # inclusion-exclusion — identical arithmetic to the Ray side
        "hll_users_setops": (
            "WITH va AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS v "
            "FROM events WHERE event_type = 'click'), "
            "vb AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS v "
            "FROM events WHERE event_type = 'view'), "
            "u AS (SELECT 'a' AS grp, v FROM va "
            "UNION ALL SELECT 'b', v FROM vb "
            "UNION ALL SELECT 'u', v FROM "
            "(SELECT v FROM va UNION SELECT v FROM vb)), "
            "h AS (SELECT grp, ('0x' || substr(md5(v), 1, 16))::UBIGINT "
            "AS hv FROM u), "
            "parts AS (SELECT grp, "
            "hv // (4503599627370496)::UBIGINT AS idx, "
            "hv % (4503599627370496)::UBIGINT AS payload FROM h), "
            "regs AS (SELECT grp, idx, max(CASE WHEN payload = 0 "
            "THEN 53 ELSE 53 - length(bin(payload)) END) AS r "
            "FROM parts GROUP BY grp, idx), "
            "agg AS (SELECT grp, sum(power(2.0, -r)) AS s, "
            "count(*) AS nz FROM regs GROUP BY grp), "
            "est AS (SELECT grp, (0.7213 / (1 + 1.079 / 4096.0)) * "
            "4096.0 * 4096.0 / (s + (4096 - nz)) AS raw, "
            "(4096 - nz) AS zeros FROM agg), "
            "fin AS (SELECT grp, CAST(round(CASE WHEN raw <= 2.5 * "
            "4096 AND zeros > 0 THEN 4096.0 * ln(4096.0 / zeros) "
            "ELSE raw END) AS BIGINT) AS e FROM est), "
            "ex AS (SELECT (SELECT count(*) FROM va) AS xa, "
            "(SELECT count(*) FROM vb) AS xb, "
            "(SELECT count(*) FROM (SELECT v FROM va UNION "
            "SELECT v FROM vb)) AS xu) "
            "SELECT max(CASE WHEN grp = 'a' THEN e END) AS est_a, "
            "max(CASE WHEN grp = 'b' THEN e END) AS est_b, "
            "max(CASE WHEN grp = 'u' THEN e END) AS est_union, "
            "max(CASE WHEN grp = 'a' THEN e END) + "
            "max(CASE WHEN grp = 'b' THEN e END) - "
            "max(CASE WHEN grp = 'u' THEN e END) AS est_intersect, "
            "ex.xa AS exact_a, ex.xb AS exact_b, "
            "ex.xu AS exact_union, ex.xa + ex.xb - ex.xu "
            "AS exact_intersect FROM fin, ex "
            "GROUP BY ex.xa, ex.xb, ex.xu"
        ),
        "corr_matrix_lineitem": (
            "SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, "
            "CAST(floor(corr(l_quantity, l_extendedprice) * 1e6 + 0.5) "
            "AS BIGINT) AS corr_e6 FROM lineitem "
            "UNION ALL SELECT 'l_quantity', 'l_discount', "
            "CAST(floor(corr(l_quantity, l_discount) * 1e6 + 0.5) "
            "AS BIGINT) FROM lineitem "
            "UNION ALL SELECT 'l_quantity', 'l_tax', "
            "CAST(floor(corr(l_quantity, l_tax) * 1e6 + 0.5) "
            "AS BIGINT) FROM lineitem "
            "UNION ALL SELECT 'l_extendedprice', 'l_discount', "
            "CAST(floor(corr(l_extendedprice, l_discount) * 1e6 + 0.5) "
            "AS BIGINT) FROM lineitem "
            "UNION ALL SELECT 'l_extendedprice', 'l_tax', "
            "CAST(floor(corr(l_extendedprice, l_tax) * 1e6 + 0.5) "
            "AS BIGINT) FROM lineitem "
            "UNION ALL SELECT 'l_discount', 'l_tax', "
            "CAST(floor(corr(l_discount, l_tax) * 1e6 + 0.5) "
            "AS BIGINT) FROM lineitem"
        ),
        "winsorized_mean_events": (
            "WITH q AS (SELECT event_type, "
            "quantile_cont(value, 0.1) AS ql, "
            "quantile_cont(value, 0.9) AS qh FROM events "
            "GROUP BY event_type) "
            "SELECT e.event_type, count(*) AS n, "
            "CAST(floor(avg(least(greatest(e.value, q.ql), q.qh)) "
            "* 1e4 + 0.5) AS BIGINT) AS wmean_e4 "
            "FROM events e JOIN q USING (event_type) "
            "GROUP BY e.event_type"
        ),
        "dq_checks_events": (
            "SELECT 'not_null:user_id' AS rule, "
            "count(*) - count(user_id) AS violations FROM events "
            "UNION ALL SELECT 'unique:event_id', "
            "count(*) - count(DISTINCT event_id) FROM events "
            "UNION ALL SELECT 'range:value', "
            "count(CASE WHEN value < 0 OR value > 200 THEN 1 END) "
            "FROM events "
            "UNION ALL SELECT 'domain:event_type', "
            "count(CASE WHEN event_type NOT IN "
            "('click', 'view', 'purchase', 'signup') THEN 1 END) "
            "FROM events"
        ),
        "time_weighted_avg_users": (
            "WITH w AS (SELECT user_id, value, epoch_us(ts) AS t, "
            "lead(epoch_us(ts)) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS nt FROM events), "
            "s AS (SELECT user_id, "
            "sum(CASE WHEN nt IS NOT NULL THEN value * (nt - t) END) "
            "AS num, max(t) - min(t) AS span FROM w GROUP BY user_id) "
            "SELECT user_id, "
            "CAST(floor(num / span * 1e4 + 0.5) AS BIGINT) AS twa_e4 "
            "FROM s WHERE span > 0"
        ),
        "kfold_embeddings": (
            "SELECT vec_id, label, "
            "CAST(((CAST((vec_id + 7) % 4294967296 AS HUGEINT) "
            "* 2654435761) % 4294967296) % 5 AS BIGINT) AS fold "
            "FROM embeddings"
        ),
        "term_chi2_lang": (
            "WITH dt AS (SELECT DISTINCT doc_id, lang, term FROM ("
            "SELECT doc_id, lang, "
            "unnest(string_split(lower(text), ' ')) AS term "
            "FROM documents) WHERE term <> ''), "
            "n AS (SELECT count(*) AS nd FROM documents), "
            "ct AS (SELECT lang, count(*) AS n_l FROM documents "
            "GROUP BY lang), "
            "tc AS (SELECT term, lang, count(*) AS o FROM dt "
            "GROUP BY 1, 2), "
            "terms AS (SELECT term, sum(o) AS df FROM tc "
            "GROUP BY term), "
            "grid AS (SELECT t.term, c.lang, t.df, c.n_l, "
            "coalesce(tc.o, 0) AS o FROM terms t CROSS JOIN ct c "
            "LEFT JOIN tc ON tc.term = t.term AND tc.lang = c.lang), "
            "cells AS (SELECT term, df, "
            "power(o - n_l * df * 1.0 / nd, 2) / "
            "(n_l * df * 1.0 / nd) "
            "+ power((n_l - o) - n_l * (nd - df) * 1.0 / nd, 2) / "
            "greatest(n_l * (nd - df) * 1.0 / nd, 1e-300) AS cell "
            "FROM grid, n) "
            "SELECT term, CAST(df AS BIGINT) AS df, "
            "CAST(floor(sum(cell) * 1e4 + 0.5) AS BIGINT) AS chi2_e4 "
            "FROM cells GROUP BY term, df HAVING df >= 5"
        ),
        "incremental_dedup_docs": (
            "WITH b AS (SELECT doc_id, text FROM documents "
            "WHERE doc_id % 10 <> 0), "
            "d AS (SELECT doc_id, text FROM documents "
            "WHERE doc_id % 10 = 0), "
            "u AS (SELECT * FROM b UNION ALL SELECT * FROM d), "
            "m AS (SELECT text, min(doc_id) AS mn FROM u "
            "GROUP BY text) "
            "SELECT d.doc_id, "
            "CAST(CASE WHEN m.mn < d.doc_id THEN m.mn ELSE -1 END "
            "AS BIGINT) AS dup_of, "
            "CAST(CASE WHEN m.mn < d.doc_id THEN 0 ELSE 1 END "
            "AS BIGINT) AS is_new "
            "FROM d JOIN m ON d.text = m.text"
        ),
        "logodds_en_de": (
            "WITH tok AS (SELECT lang, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) "
            "AS term FROM documents WHERE lang IN ('en', 'de')), "
            "c AS (SELECT term, "
            "count(CASE WHEN lang = 'en' THEN 1 END) AS cnt_a, "
            "count(CASE WHEN lang = 'de' THEN 1 END) AS cnt_b "
            "FROM tok GROUP BY term), "
            "t AS (SELECT sum(cnt_a) AS na, sum(cnt_b) AS nb, "
            "count(*) AS v FROM c) "
            "SELECT term, cnt_a, cnt_b, "
            "CAST(floor((ln((cnt_a + 0.5) / "
            "(na + 0.5 * v - cnt_a - 0.5)) "
            "- ln((cnt_b + 0.5) / (nb + 0.5 * v - cnt_b - 0.5))) "
            "/ sqrt(1.0 / (cnt_a + 0.5) + 1.0 / (cnt_b + 0.5)) "
            "* 1e4 + 0.5) AS BIGINT) AS z_e4 "
            "FROM c, t WHERE cnt_a + cnt_b >= 5"
        ),
        "graph_clustering_parts": (
            "WITH e0 AS (SELECT a.l_partkey AS src, b.l_partkey AS dst "
            "FROM lineitem a JOIN lineitem b "
            "ON a.l_orderkey = b.l_orderkey "
            "AND b.l_linenumber = a.l_linenumber + 1 "
            "AND a.l_partkey <> b.l_partkey "
            "WHERE (a.l_partkey + b.l_partkey) % 3 = 0), "
            "ec AS (SELECT DISTINCT least(src, dst) AS a, "
            "greatest(src, dst) AS b FROM e0), "
            "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
            "FROM ec e1 JOIN ec e2 ON e1.b = e2.a "
            "JOIN ec e3 ON e3.a = e1.a AND e3.b = e2.b), "
            "corners AS (SELECT x AS node FROM tri "
            "UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri), "
            "tcnt AS (SELECT node, count(*) AS t FROM corners "
            "GROUP BY node), "
            "deg AS (SELECT node, count(*) AS degree FROM ("
            "SELECT a AS node FROM ec UNION ALL SELECT b FROM ec) "
            "GROUP BY node) "
            "SELECT deg.node, deg.degree, "
            "coalesce(tcnt.t, 0) AS triangles, "
            "CAST(floor((CASE WHEN deg.degree > 1 THEN "
            "2.0 * coalesce(tcnt.t, 0) / (deg.degree * "
            "(deg.degree - 1.0)) ELSE 0 END) * 1e6 + 0.5) AS BIGINT) "
            "AS clustering_e6 "
            "FROM deg LEFT JOIN tcnt USING (node)"
        ),
        "mode_event_type_users": (
            "SELECT user_id, mode_val, n FROM ("
            "SELECT user_id, event_type AS mode_val, count(*) AS n, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY count(*) DESC, event_type) AS rn "
            "FROM events GROUP BY user_id, event_type) WHERE rn = 1"
        ),
        "association_rules_parts": (
            "WITH d AS (SELECT DISTINCT l_orderkey AS b, "
            "l_partkey AS i FROM lineitem), "
            "nb AS (SELECT count(DISTINCT b) AS n FROM d), "
            "ic AS (SELECT i, count(*) AS n_i FROM d GROUP BY i), "
            "p AS (SELECT x.i AS item_a, y.i AS item_b, "
            "count(*) AS support FROM d x JOIN d y ON x.b = y.b "
            "AND x.i <> y.i GROUP BY 1, 2) "
            "SELECT p.item_a, p.item_b, p.support, "
            "CAST(floor(p.support * 1e6 / a.n_i + 0.5) AS BIGINT) "
            "AS conf_e6, "
            "CAST(floor(nb.n * p.support * 1e6 / (a.n_i * b.n_i) "
            "+ 0.5) AS BIGINT) AS lift_e6 "
            "FROM p JOIN ic a ON p.item_a = a.i "
            "JOIN ic b ON p.item_b = b.i, nb WHERE p.support >= 3"
        ),
        "tfidf_cosine_join": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) "
            "AS term FROM documents), "
            "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok "
            "GROUP BY 1, 2), "
            "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
            "n AS (SELECT count(*) AS nd FROM documents), "
            "w AS (SELECT tf.doc_id, tf.term, "
            "tf.tf * ln(nd * 1.0 / df.df) AS w "
            "FROM tf JOIN df USING (term), n), "
            "nm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w "
            "GROUP BY doc_id), "
            "wn AS (SELECT w.doc_id, w.term, "
            "w.w / greatest(nm.nrm, 1e-300) AS wh "
            "FROM w JOIN nm USING (doc_id)), "
            "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "sum(a.wh * b.wh) AS cos FROM wn a JOIN wn b "
            "ON a.term = b.term AND a.doc_id < b.doc_id "
            "GROUP BY 1, 2) "
            "SELECT id_a, id_b, "
            "CAST(floor(cos * 1e6 + 0.5) AS BIGINT) AS cos_e6 "
            "FROM p WHERE cos >= 0.8"
        ),
        "edit_distance_join": (
            "SELECT a.c_custkey AS id_a, b.c_custkey AS id_b, "
            "a.c_name AS name_a, b.c_name AS name_b, "
            "CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist "
            "FROM customer a JOIN customer b "
            "ON a.c_custkey < b.c_custkey "
            "WHERE levenshtein(a.c_name, b.c_name) <= 1"
        ),
        "equidepth_bins_events": (
            "WITH r AS (SELECT event_id, value, ntile(10) OVER ("
            "ORDER BY value, event_id) AS bin FROM events) "
            "SELECT bin, count(*) AS n, "
            "CAST(floor(min(value) * 100 + 0.5) AS BIGINT) AS min_e2, "
            "CAST(floor(max(value) * 100 + 0.5) AS BIGINT) AS max_e2 "
            "FROM r GROUP BY bin"
        ),
        "rank_windows_events": (
            "SELECT user_id, event_id, value, "
            "CAST(floor(percent_rank() OVER (PARTITION BY user_id "
            "ORDER BY value) * 1e6 + 0.5) AS BIGINT) AS pct_rank_e6, "
            "CAST(floor(cume_dist() OVER (PARTITION BY user_id "
            "ORDER BY value) * 1e6 + 0.5) AS BIGINT) AS cume_dist_e6 "
            "FROM events"
        ),
        "scan_pushdown_orders": (
            "SELECT o_orderpriority, count(*) AS n, "
            "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) "
            "AS BIGINT) AS sum_price_e2 FROM orders "
            "WHERE o_orderstatus = 'F' GROUP BY o_orderpriority"
        ),
        "cumulative_new_users": (
            "WITH f AS (SELECT event_type, user_id, "
            "min(date_trunc('day', ts)) AS d0 FROM events "
            "GROUP BY 1, 2), "
            "n AS (SELECT event_type, d0 AS day, count(*) AS new_users "
            "FROM f GROUP BY 1, 2) "
            "SELECT event_type, day, new_users, "
            "CAST(sum(new_users) OVER (PARTITION BY event_type "
            "ORDER BY day) AS BIGINT) AS cum_users FROM n"
        ),
        "embedding_centroids": (
            "SELECT label, i AS dim, "
            "CAST(floor(avg(embedding[i]) * 1e6 + 0.5) AS BIGINT) "
            "AS mean_e6 "
            "FROM embeddings, (SELECT unnest(generate_series(1, 64)) "
            "AS i) s GROUP BY label, i"
        ),
        # recursive-CTE twin: lp enumerates (node, reachable ancestor id)
        # pairs; min per node == the component representative
        "graph_components_parts": (
            "WITH RECURSIVE "
            "e0 AS (SELECT a.l_partkey AS src, b.l_partkey AS dst "
            "FROM lineitem a JOIN lineitem b "
            "ON a.l_orderkey = b.l_orderkey "
            "AND b.l_linenumber = a.l_linenumber + 1 "
            "AND a.l_partkey <> b.l_partkey "
            "WHERE (a.l_partkey + b.l_partkey) % 17 = 0), "
            "edges AS (SELECT DISTINCT src, dst FROM ("
            "SELECT src, dst FROM e0 "
            "UNION ALL SELECT dst, src FROM e0)), "
            "nodes AS (SELECT DISTINCT src AS node FROM edges), "
            "lp AS (SELECT node, node AS lbl FROM nodes "
            "UNION SELECT e.dst AS node, lp.lbl FROM lp "
            "JOIN edges e ON lp.node = e.src) "
            "SELECT node, min(lbl) AS component FROM lp GROUP BY node"
        ),
        "skyline_parts": (
            "SELECT p_partkey, p_retailprice, p_size FROM part a "
            "WHERE NOT EXISTS (SELECT 1 FROM part b "
            "WHERE b.p_retailprice <= a.p_retailprice "
            "AND b.p_size >= a.p_size "
            "AND (b.p_retailprice < a.p_retailprice "
            "OR b.p_size > a.p_size))"
        ),
        "pmi_doc_terms": (
            "WITH dt AS (SELECT DISTINCT doc_id, term FROM ("
            "SELECT doc_id, unnest(string_split(lower(text), ' ')) "
            "AS term FROM documents) WHERE term <> ''), "
            "df AS (SELECT term, count(*) AS df FROM dt GROUP BY term), "
            "p AS (SELECT x.term AS a, y.term AS b, count(*) AS n_ab "
            "FROM dt x JOIN dt y ON x.doc_id = y.doc_id "
            "AND x.term < y.term GROUP BY 1, 2) "
            "SELECT p.a, p.b, p.n_ab, "
            "CAST(floor(ln((SELECT count(*) FROM documents) * p.n_ab "
            "* 1.0 / (da.df * db.df)) * 1e4 + 0.5) AS BIGINT) "
            "AS pmi_e4 "
            "FROM p JOIN df da ON p.a = da.term "
            "JOIN df db ON p.b = db.term WHERE p.n_ab >= 50"
        ),
        "bigram_lm_docs": (
            "WITH w AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9]+') AS ws "
            "FROM documents), "
            "uc AS (SELECT t, count(*) AS c FROM ("
            "SELECT unnest(ws) AS t FROM w) GROUP BY t), "
            "vs AS (SELECT count(*) AS v FROM uc), "
            "bgr AS (SELECT doc_id, unnest([struct_pack("
            "w1 := ws[i], w12 := ws[i] || ' ' || ws[i+1]) "
            "for i in generate_series(1, len(ws) - 1)]) AS s "
            "FROM w WHERE len(ws) >= 2), "
            "bc AS (SELECT s.w12 AS w12, count(*) AS c FROM bgr "
            "GROUP BY s.w12), "
            "sc AS (SELECT b.doc_id, count(*) AS n_bigrams, "
            "avg(-ln((bc.c + 0.1) / (uc.c + 0.1 * vs.v))) AS nll "
            "FROM bgr b JOIN bc ON b.s.w12 = bc.w12 "
            "JOIN uc ON b.s.w1 = uc.t, vs GROUP BY b.doc_id) "
            "SELECT d.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams, "
            "CAST(floor(coalesce(sc.nll, 0) * 1e4 + 0.5) AS BIGINT) "
            "AS nll_e4 "
            "FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id"
        ),
        # the CMS registers are md5-derived, so DuckDB reproduces the
        # whole sketch: same counters, same min-probe estimates
        "cms_term_counts": (
            "WITH tok AS (SELECT "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) "
            "AS term FROM documents), "
            "tc AS (SELECT term, count(*) AS c FROM tok GROUP BY term), "
            "hj AS (SELECT t.term, s.j, "
            "('0x' || substr(md5(CAST(s.j AS VARCHAR) || '|' || t.term), "
            "1, 16))::UBIGINT % 1024 AS b "
            "FROM tc t, (SELECT unnest(generate_series(0, 3)) AS j) s), "
            "cms AS (SELECT hj.j, hj.b, sum(tc.c) AS cnt "
            "FROM hj JOIN tc USING (term) GROUP BY hj.j, hj.b), "
            "topk AS (SELECT term, c AS exact_cnt FROM tc "
            "ORDER BY c DESC, term LIMIT 64) "
            "SELECT tk.term, tk.exact_cnt, "
            "CAST(min(cms.cnt) AS BIGINT) AS est_cnt "
            "FROM topk tk JOIN hj ON hj.term = tk.term "
            "JOIN cms ON cms.j = hj.j AND cms.b = hj.b "
            "GROUP BY 1, 2"
        ),
        # identical SQL as ngram_jaccard_dedup: the prefix filter is an
        # optimization with a provably identical result set
        "prefix_jaccard_join": (
            r"WITH w AS (SELECT doc_id, string_split(lower(trim("
            r"regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws "
            "FROM documents), "
            "g AS (SELECT doc_id, unnest(list_distinct("
            "[array_to_string(ws[i:i+2], ' ') "
            "for i in generate_series(1, len(ws)-2)])) AS gram "
            "FROM w WHERE len(ws) >= 3), "
            "s AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id), "
            "i AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "count(*) AS inter FROM g a "
            "JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id "
            "GROUP BY 1, 2) "
            "SELECT i.id_a, i.id_b, "
            "CAST(round(1000000.0 * inter / (sa.sz + sb.sz - inter)) "
            "AS BIGINT) AS jaccard_micro "
            "FROM i JOIN s sa ON sa.doc_id = i.id_a "
            "JOIN s sb ON sb.doc_id = i.id_b "
            "WHERE 1.0 * inter / (sa.sz + sb.sz - inter) >= 0.8 "
            "ORDER BY 1, 2"
        ),
        "meta_blocking_wnp": (
            "WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') "
            "AS ts FROM documents), "
            "et AS (SELECT DISTINCT doc_id, "
            "ts[i] || '_' || ts[i+1] AS term FROM toks, "
            "unnest(generate_series(1, len(ts) - 1)) AS t(i) "
            "WHERE ts[i] <> '' AND ts[i+1] <> ''), "
            "kept AS (SELECT term FROM et GROUP BY term "
            "HAVING count(*) BETWEEN 2 AND 32), "
            "p AS (SELECT et.doc_id, et.term FROM et "
            "JOIN kept USING (term)), "
            "e AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "count(*) AS w FROM p a JOIN p b ON a.term = b.term "
            "AND a.doc_id < b.doc_id GROUP BY 1, 2), "
            "na AS (SELECT node, avg(w) AS avg_w FROM ("
            "SELECT id_a AS node, w FROM e UNION ALL "
            "SELECT id_b AS node, w FROM e) GROUP BY node) "
            "SELECT e.id_a, e.id_b, e.w FROM e "
            "JOIN na x ON e.id_a = x.node "
            "JOIN na y ON e.id_b = y.node "
            "WHERE e.w >= (x.avg_w + y.avg_w) / 2"
        ),
        "meta_blocking_wep": (
            "WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') "
            "AS ts FROM documents), "
            "et AS (SELECT DISTINCT doc_id, "
            "ts[i] || '_' || ts[i+1] AS term FROM toks, "
            "unnest(generate_series(1, len(ts) - 1)) AS t(i) "
            "WHERE ts[i] <> '' AND ts[i+1] <> ''), "
            "kept AS (SELECT term FROM et GROUP BY term "
            "HAVING count(*) BETWEEN 2 AND 32), "
            "p AS (SELECT et.doc_id, et.term FROM et "
            "JOIN kept USING (term)), "
            "e AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "count(*) AS w FROM p a JOIN p b ON a.term = b.term "
            "AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT id_a, id_b, w FROM e "
            "WHERE w >= (SELECT avg(w) FROM e)"
        ),
    }


def _sql_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


# the lang_id heuristic's vocab lists, mirrored into the oracle SQL
from wned_ray.pipelines.datawork import BPE_ISH_PATTERN as _BPE_PAT  # noqa: E402
from wned_ray.pipelines.datawork import _DE_STOP as _LID_DE  # noqa: E402
from wned_ray.pipelines.datawork import _EN_STOP as _LID_EN  # noqa: E402
from wned_ray.pipelines.datawork import _FR_STOP as _LID_FR  # noqa: E402


def _anchor_oracle_sql() -> str:
    """DuckDB twin of mine_anchor_aliases over the T2 fixture transcripts
    (the correctness driver runs at sf0.01): extract [[target|anchor]]
    pairs, formatName the target (underscore -> space, collapse ws, trim,
    capitalize first char), normalize the anchor like the alias-lookup
    key (lower, collapse ws, strip leading titles / trailing corp
    suffixes / trailing dot), then count occurrences per pair."""
    from wned_ray.functions.textnorm import CORP_SUFFIXES, TITLES
    from wned_ray.synth import T2, ensure_corpus

    paths = ensure_corpus(T2)
    title_re = r"^(?:(?:" + "|".join(TITLES) + r")\.?\s+)+"
    corp_re = r"(?:\s+(?:" + "|".join(CORP_SUFFIXES) + r")\.?)+$"
    return (
        "WITH pairs AS ("
        "SELECT unnest(list_zip("
        r"regexp_extract_all(text, '\[\[([^\[\]|]+)\|([^\[\]|]+)\]\]', 1), "
        r"regexp_extract_all(text, '\[\[([^\[\]|]+)\|([^\[\]|]+)\]\]', 2)"
        ")) AS p FROM read_parquet('{transcripts}')), "
        "fmt AS (SELECT "
        r"trim(replace(regexp_replace(p[1], '\s+', ' ', 'g'), '_', ' ')) "
        "AS t0, "
        r"trim(regexp_replace(lower(p[2]), '\s+', ' ', 'g')) AS a0 "
        "FROM pairs WHERE p[1] IS NOT NULL), "
        "norm AS (SELECT "
        "upper(substr(t0, 1, 1)) || substr(t0, 2) AS entity, "
        "trim(regexp_replace(regexp_replace(regexp_replace("
        "a0, '{title_re}', ''), '{corp_re}', ''), '\\.$', '')) AS alias "
        "FROM fmt) "
        "SELECT entity, alias, 'anchor' AS source, "
        "count(*) AS freq FROM norm GROUP BY entity, alias"
    ).format(transcripts=paths["transcripts"], title_re=title_re,
             corp_re=corp_re)


def _redirect_oracle_sql() -> str:
    """Oracle over the deterministic synthetic fixture (the correctness
    driver runs at sf0.01 -> the T2 corpus tier); the fixture parquet
    paths are embedded because only the ten sf tables are pre-registered
    as views."""
    from wned_ray.synth import T2, ensure_corpus

    paths = ensure_corpus(T2)
    return (
        "WITH a AS (SELECT * FROM read_parquet('{aliases}')), "
        "r AS (SELECT * FROM read_parquet('{redirects}')), "
        "red AS ("
        "SELECT a.entity, r.from_alias AS alias, 'redirect' AS source, "
        "CAST(sum(a.freq) AS BIGINT) AS freq "
        "FROM a JOIN r ON a.alias = r.to_alias "
        "GROUP BY a.entity, r.from_alias) "
        "SELECT entity, alias, source, freq FROM a "
        "UNION ALL "
        "SELECT entity, alias, source, freq FROM red "
        "WHERE NOT EXISTS (SELECT 1 FROM a "
        "WHERE a.entity = red.entity AND a.alias = red.alias)"
    ).format(aliases=paths["aliases"], redirects=paths["redirects"])
