"""M3/M5: wiki-link parsing, markup stripping, anchor alias mining."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from wned_ray.functions.anchors import format_name, parse_anchors, strip_markup


def test_format_name():
    got = format_name(pa.array([
        "varquo_sotanor", "  Varquo   Sotanor ", "x", "", "a_b_c"]))
    assert got.to_pylist() == [
        "Varquo sotanor", "Varquo Sotanor", "X", "", "A b c"]


def test_strip_markup():
    got = strip_markup(pa.array([
        "see [[Varquo_Sotanor|Dr. Varquo Sotanor]] today",
        "plain text stays",
        "[[Solo_Target]] leads",
        "two [[A|a]] and [[B|b]] links",
    ]))
    assert got.to_pylist() == [
        "see Dr. Varquo Sotanor today",
        "plain text stays",
        "Solo_Target leads",
        "two a and b links",
    ]


def test_parse_anchors():
    rows, target, anchor = parse_anchors(pa.array([
        "x [[Varquo_Sotanor|Varquo S.]] y",
        "no links here",
        "[[Belulin_Fenarvo]] then [[Belulin_Fenarvo|Prof. Belulin]]",
    ]))
    assert rows.tolist() == [0, 2, 2]
    assert target.to_pylist() == [
        "Varquo Sotanor", "Belulin Fenarvo", "Belulin Fenarvo"]
    # anchor defaults to the (formatted) target for bare [[target]] links
    assert anchor.to_pylist() == [
        "Varquo S.", "Belulin Fenarvo", "Prof. Belulin"]


def test_mine_anchor_aliases_subset_of_dim(ray_session, t1_corpus):
    """Every mined (entity, alias) pair must already be a dim-table alias
    of the SAME entity: the corpus renders link variants as
    [[Entity_Name|surface]] and normalization collapses the surface onto
    its dim alias key."""
    import ray.data as rd

    from wned_ray.stages.aliases import mine_anchor_aliases

    mined = mine_anchor_aliases(
        rd.read_parquet(t1_corpus["transcripts"], columns=["text"])
    ).to_pandas()
    assert len(mined) > 0
    assert (mined["source"] == "anchor").all()
    assert (mined["freq"] >= 1).all()

    dim = pq.read_table(t1_corpus["aliases"]).to_pandas()
    dim_pairs = set(zip(dim["entity"], dim["alias"]))
    mined_pairs = set(zip(mined["entity"], mined["alias"]))
    assert mined_pairs <= dim_pairs, mined_pairs - dim_pairs
    # the miner sees every entity that has at least one link-variant turn,
    # which at t1 size is essentially all of them
    assert mined["entity"].nunique() > 0.8 * dim["entity"].nunique()


def test_merge_alias_tables_adds_freq_keeps_source():
    from wned_ray.stages.aliases import merge_alias_tables

    base = pa.table({
        "entity": ["E1", "E1"], "alias": ["e one", "e uno"],
        "source": ["name", "link"], "freq": [40, 10]})
    mined = pa.table({
        "entity": ["E1", "E2"], "alias": ["e one", "e two"],
        "source": ["anchor", "anchor"], "freq": [7, 3]})
    out = merge_alias_tables(base, mined).to_pandas().set_index(
        ["entity", "alias"])
    assert out.loc[("E1", "e one"), "freq"] == 47
    assert out.loc[("E1", "e one"), "source"] == "name"   # base label wins
    assert out.loc[("E1", "e uno"), "freq"] == 10
    assert out.loc[("E2", "e two"), "source"] == "anchor"


def test_linkage_with_anchor_mining(ray_session, t1_corpus):
    """cfg.mine_anchor_aliases unions mined anchor rows into the dim table
    before broadcast; the F1 gate must hold with it on."""
    import ray.data as rd

    from wned_ray.config import PipelineConfig
    from wned_ray.pipelines.link import run_linkage
    from wned_ray.stages.evaluate import pairwise_metrics

    cfg = PipelineConfig(mine_anchor_aliases=True)
    out = run_linkage(t1_corpus["transcripts"], t1_corpus["aliases"],
                      t1_corpus["graph_edges"], cfg,
                      redirects_path=t1_corpus["redirects"])
    labels = rd.read_parquet(t1_corpus["labels"])
    m = pairwise_metrics(labels, out["clusters"])
    assert m["micro_f1"] >= 0.99, m


def test_linkage_anchor_mining_past_cap(ray_session, t1_corpus):
    """Past cfg.alias_mined_max_rows the mined table truncates to the
    top-cap pairs by freq (warned, distributed sort+limit) instead of
    an unbounded driver collect; with a cap of 1 the pipeline must
    still run end to end and the dim must gain at most one mined row."""
    import warnings

    import pyarrow.parquet as pq
    import ray.data as rd

    from wned_ray.config import PipelineConfig
    from wned_ray.pipelines.link import run_linkage
    from wned_ray.stages.aliases import mine_anchor_aliases

    mined_full = mine_anchor_aliases(
        rd.read_parquet(t1_corpus["transcripts"], columns=["text"]))
    assert mined_full.count() > 1, "fixture must mine several anchor rows"

    cfg = PipelineConfig(mine_anchor_aliases=True, alias_mined_max_rows=1)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = run_linkage(t1_corpus["transcripts"], t1_corpus["aliases"],
                          t1_corpus["graph_edges"], cfg,
                          redirects_path=t1_corpus["redirects"])
    assert any("alias_mined_max_rows" in str(x.message) for x in w)
    assert out["clusters"].count() > 0
