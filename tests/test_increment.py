"""Incremental linkage (pipelines/increment.py): base + delta must
reproduce the full base+delta rerun's clusters.

Split the t1 corpus 80/20 by conversation, link the base, then link the
delta incrementally; the merged assignment must equal the full rerun on
every mention (both sides canonicalize cluster ids to the min member, so
ids — not just partitions — must agree). ``global_promote=False``: the
corpus-wide promotion pass is the one documented divergence (it sees only
the delta during incremental prepare)."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wned_ray.config import PipelineConfig
from wned_ray.pipelines.increment import run_linkage_increment
from wned_ray.pipelines.link import run_linkage


@pytest.fixture(scope="module")
def split_corpus(t1_corpus, tmp_path_factory):
    out = tmp_path_factory.mktemp("t1split")
    t = pq.read_table(t1_corpus["transcripts"])
    convs = sorted(set(t["conv_id"].to_pylist()))
    delta_convs = set(convs[: max(1, len(convs) // 5)])
    import pyarrow.compute as pc

    mask = pc.is_in(t["conv_id"], value_set=pa.array(sorted(delta_convs)))
    base_path = str(out / "base.parquet")
    delta_path = str(out / "delta.parquet")
    pq.write_table(t.filter(pc.invert(mask)), base_path)
    pq.write_table(t.filter(mask), delta_path)
    return t1_corpus, base_path, delta_path


def _assign_df(ds):
    return (ds.to_pandas().sort_values("mention_id")
            .reset_index(drop=True))


def test_increment_matches_full_rerun(ray_session, split_corpus):
    corpus, base_path, delta_path = split_corpus
    cfg = PipelineConfig(global_promote=False)

    full = run_linkage(corpus["transcripts"], corpus["aliases"],
                       corpus["graph_edges"], cfg,
                       redirects_path=corpus["redirects"])
    base = run_linkage(base_path, corpus["aliases"],
                       corpus["graph_edges"], cfg,
                       redirects_path=corpus["redirects"])
    inc = run_linkage_increment(base, delta_path, corpus["aliases"],
                                corpus["graph_edges"], cfg,
                                redirects_path=corpus["redirects"])

    got = _assign_df(inc["clusters"])
    want = _assign_df(full["clusters"])
    assert len(got) == len(want)
    merged = got.merge(want, on="mention_id", suffixes=("_inc", "_full"))
    diff = merged[merged["cluster_id_inc"] != merged["cluster_id_full"]]
    assert diff.empty, diff.head(20)

    # the incremental scores table only contains delta-touching pairs
    sdf = inc["scores"].select_columns(["id_a", "id_b"]).to_pandas()
    delta_ids = set(pq.read_table(delta_path)
                    .to_pandas()
                    .apply(lambda r: f"{r.conv_id}:{r.turn_idx}", axis=1))
    # mention ids are conv:turn-prefixed per stages/normalize.py; at
    # least one endpoint of every scored pair must be a delta mention
    touches = sdf["id_a"].isin(delta_ids) | sdf["id_b"].isin(delta_ids)
    assert touches.all()


def test_increment_hot_flip_repair(ray_session, split_corpus):
    """Force hot-key FLIPS (cold at base size, hot at merged size) with a
    tight max_block_size and assert the increment still reproduces the
    full rerun exactly — the dirty-norm repair path, made falsifiable:
    the test first proves flips actually occur at this cap."""
    from wned_ray.pipelines.increment import merge_blocking
    from wned_ray.stages.blocking import hot_block_keys, norm_blocks
    from wned_ray.stages.normalize import prepare

    import ray.data as rd

    corpus, base_path, delta_path = split_corpus
    cfg = PipelineConfig(global_promote=False, max_block_size=10)

    base_blocking = norm_blocks(
        prepare(rd.read_parquet(base_path), cfg), cfg).materialize()
    delta_blocking = norm_blocks(
        prepare(rd.read_parquet(delta_path), cfg), cfg).materialize()
    merged = merge_blocking(base_blocking, delta_blocking).materialize()
    flipped = hot_block_keys(merged, cfg) - hot_block_keys(base_blocking,
                                                           cfg)
    assert flipped, ("max_block_size=10 produced no hot flips at the t1 "
                     "tier; pick a cap between base and merged weights")

    full = run_linkage(corpus["transcripts"], corpus["aliases"],
                       corpus["graph_edges"], cfg,
                       redirects_path=corpus["redirects"])
    base = run_linkage(base_path, corpus["aliases"],
                       corpus["graph_edges"], cfg,
                       redirects_path=corpus["redirects"])
    inc = run_linkage_increment(base, delta_path, corpus["aliases"],
                                corpus["graph_edges"], cfg,
                                redirects_path=corpus["redirects"])
    got = _assign_df(inc["clusters"])
    want = _assign_df(full["clusters"])
    merged_df = got.merge(want, on="mention_id", suffixes=("_inc", "_full"))
    diff = merged_df[merged_df["cluster_id_inc"]
                     != merged_df["cluster_id_full"]]
    assert diff.empty, diff.head(20)


def test_increment_empty_delta_is_identity(ray_session, split_corpus,
                                           tmp_path_factory):
    corpus, base_path, _ = split_corpus
    cfg = PipelineConfig(global_promote=False)
    out = tmp_path_factory.mktemp("t1empty")
    t = pq.read_table(base_path)
    empty_path = str(out / "empty.parquet")
    pq.write_table(t.slice(0, 0), empty_path)

    base = run_linkage(base_path, corpus["aliases"],
                       corpus["graph_edges"], cfg,
                       redirects_path=corpus["redirects"])
    inc = run_linkage_increment(base, empty_path, corpus["aliases"],
                                corpus["graph_edges"], cfg,
                                redirects_path=corpus["redirects"])
    got = _assign_df(inc["clusters"])
    want = _assign_df(base["clusters"])
    pd.testing.assert_frame_equal(got, want)


def test_increment_distributed_merge_path(ray_session, split_corpus):
    """Exact-agreement gate with the driver fast paths DISABLED
    (norm_pairs_driver_max_rows=0): the distributed merge/hot/flip/
    touched plan (groupby waves + pruned self-join) must produce the
    same clusters as the full rerun — keeps the scale path falsifiable
    now that small tiers take the Arrow driver twin by default."""
    corpus, base_path, delta_path = split_corpus
    cfg = PipelineConfig(global_promote=False,
                         norm_pairs_driver_max_rows=0,
                         blocking_merge_driver_max_rows=0)

    full = run_linkage(corpus["transcripts"], corpus["aliases"],
                       corpus["graph_edges"], cfg,
                       redirects_path=corpus["redirects"])
    base = run_linkage(base_path, corpus["aliases"],
                       corpus["graph_edges"], cfg,
                       redirects_path=corpus["redirects"])
    inc = run_linkage_increment(base, delta_path, corpus["aliases"],
                                corpus["graph_edges"], cfg,
                                redirects_path=corpus["redirects"])
    got = _assign_df(inc["clusters"])
    want = _assign_df(full["clusters"])
    merged = got.merge(want, on="mention_id", suffixes=("_inc", "_full"))
    diff = merged[merged["cluster_id_inc"] != merged["cluster_id_full"]]
    assert diff.empty, diff.head(20)


def test_increment_semi_join_fallback_path(ray_session, split_corpus):
    """Exact-agreement gate with the keep-set BROADCASTS disabled
    (increment_broadcast_max_rows=0 forces the distributed marker
    semi-join fallback for every membership filter — delta norms,
    delta/dirty mention ids, dirty base-edge drop — and
    blocking_merge_driver_max_rows=0 keeps us off the driver-merge
    branch that owns its own cap). max_block_size=10 forces hot flips
    so the DIRTY side of the fallback is exercised too, not just the
    delta side."""
    corpus, base_path, delta_path = split_corpus
    cfg = PipelineConfig(global_promote=False, max_block_size=10,
                         blocking_merge_driver_max_rows=0,
                         increment_broadcast_max_rows=0)

    full = run_linkage(corpus["transcripts"], corpus["aliases"],
                       corpus["graph_edges"], cfg,
                       redirects_path=corpus["redirects"])
    base = run_linkage(base_path, corpus["aliases"],
                       corpus["graph_edges"], cfg,
                       redirects_path=corpus["redirects"])
    inc = run_linkage_increment(base, delta_path, corpus["aliases"],
                                corpus["graph_edges"], cfg,
                                redirects_path=corpus["redirects"])
    got = _assign_df(inc["clusters"])
    want = _assign_df(full["clusters"])
    merged = got.merge(want, on="mention_id", suffixes=("_inc", "_full"))
    diff = merged[merged["cluster_id_inc"] != merged["cluster_id_full"]]
    assert diff.empty, diff.head(20)


def test_increment_ids_semi_join_on_driver_merge_branch(ray_session,
                                                        split_corpus):
    """increment_broadcast_max_rows=0 with the DRIVER blocking-merge
    branch ACTIVE (default blocking_merge cap): the norm keep sets stay
    driver tables (they are vocabulary-cap-bounded by that branch), but
    the mention-ID keep set must NOT collect — the id filters switch to
    marker semi-joins independently of the branch taken (a tiny-vocab /
    huge-mention delta would otherwise OOM the driver through the fast
    branch). max_block_size=10 forces hot flips so the dirty-id side
    exercises too. Exact agreement with the full rerun."""
    corpus, base_path, delta_path = split_corpus
    cfg = PipelineConfig(global_promote=False, max_block_size=10,
                         increment_broadcast_max_rows=0)

    full = run_linkage(corpus["transcripts"], corpus["aliases"],
                       corpus["graph_edges"], cfg,
                       redirects_path=corpus["redirects"])
    base = run_linkage(base_path, corpus["aliases"],
                       corpus["graph_edges"], cfg,
                       redirects_path=corpus["redirects"])
    inc = run_linkage_increment(base, delta_path, corpus["aliases"],
                                corpus["graph_edges"], cfg,
                                redirects_path=corpus["redirects"])
    got = _assign_df(inc["clusters"])
    want = _assign_df(full["clusters"])
    merged = got.merge(want, on="mention_id", suffixes=("_inc", "_full"))
    diff = merged[merged["cluster_id_inc"] != merged["cluster_id_full"]]
    assert diff.empty, diff.head(20)


def test_increment_chain_three_deltas(ray_session, t1_corpus,
                                      tmp_path_factory):
    """Append-mostly usage: three sequential deltas chained through
    ``out["state"]`` must reproduce the full-corpus rerun exactly —
    including dirty-norm repair carry-over (state scores drop repaired
    base rows, so later increments never see stale edges)."""
    import pyarrow.compute as pc

    out_dir = tmp_path_factory.mktemp("t1chain")
    t = pq.read_table(t1_corpus["transcripts"])
    convs = sorted(set(t["conv_id"].to_pylist()))
    n = len(convs)
    cuts = [0, int(n * 0.7), int(n * 0.8), int(n * 0.9), n]
    parts = []
    for i in range(4):
        cset = pa.array(convs[cuts[i]:cuts[i + 1]])
        p = str(out_dir / f"part{i}.parquet")
        pq.write_table(t.filter(pc.is_in(t["conv_id"], value_set=cset)), p)
        parts.append(p)

    cfg = PipelineConfig(global_promote=False)
    full = run_linkage(t1_corpus["transcripts"], t1_corpus["aliases"],
                       t1_corpus["graph_edges"], cfg,
                       redirects_path=t1_corpus["redirects"])
    state = run_linkage(parts[0], t1_corpus["aliases"],
                        t1_corpus["graph_edges"], cfg,
                        redirects_path=t1_corpus["redirects"])
    for p in parts[1:]:
        out = run_linkage_increment(state, p, t1_corpus["aliases"],
                                    t1_corpus["graph_edges"], cfg,
                                    redirects_path=t1_corpus["redirects"])
        state = out["state"]

    got = _assign_df(state["clusters"])
    want = _assign_df(full["clusters"])
    assert len(got) == len(want)
    merged = got.merge(want, on="mention_id", suffixes=("_inc", "_full"))
    diff = merged[merged["cluster_id_inc"] != merged["cluster_id_full"]]
    assert diff.empty, diff.head(20)


def test_increment_fresh_vocab_matches_full(ray_session, t1_corpus,
                                            tmp_path_factory):
    """Append regime (synth.fresh_delta_fixture): the delta is a
    different-seed corpus — fresh entity vocabulary, so its block keys
    are disjoint from the base's up to random syllable collisions. The
    increment must reproduce the full union rerun exactly, every scored
    pair must touch the delta, and the freshness premise itself is
    asserted (the delta's entity set is genuinely new)."""
    import pyarrow.parquet as _pq

    from wned_ray.synth import CorpusSpec, fresh_delta_fixture

    fresh_spec = CorpusSpec(seed=777, n_entities=12, n_convs=25,
                            turns_per_conv=8, with_labels=False)
    fx = fresh_delta_fixture(
        t1_corpus, fresh_spec,
        base_dir=str(tmp_path_factory.mktemp("freshfx")))

    # freshness premise: merged aliases = base entities + >= n-1 new ones
    base_ents = set(_pq.read_table(t1_corpus["aliases"])["entity"]
                    .to_pylist())
    merged_ents = set(_pq.read_table(fx["aliases"])["entity"].to_pylist())
    assert len(merged_ents - base_ents) >= fresh_spec.n_entities - 1

    cfg = PipelineConfig(global_promote=False)
    full = run_linkage(fx["union_transcripts"], fx["aliases"],
                       fx["graph_edges"], cfg,
                       redirects_path=fx["redirects"])
    base = run_linkage(t1_corpus["transcripts"], fx["aliases"],
                       fx["graph_edges"], cfg,
                       redirects_path=fx["redirects"])
    inc = run_linkage_increment(base, fx["delta_transcripts"],
                                fx["aliases"], fx["graph_edges"], cfg,
                                redirects_path=fx["redirects"])

    got = _assign_df(inc["clusters"])
    want = _assign_df(full["clusters"])
    assert len(got) == len(want)
    merged = got.merge(want, on="mention_id", suffixes=("_inc", "_full"))
    diff = merged[merged["cluster_id_inc"] != merged["cluster_id_full"]]
    assert diff.empty, diff.head(20)

    # pruning bites: every scored pair has a delta endpoint ("f"-prefix)
    sdf = inc["scores"].select_columns(["id_a", "id_b"]).to_pandas()
    touches = (sdf["id_a"].str.startswith("f")
               | sdf["id_b"].str.startswith("f"))
    assert touches.all()


def test_state_save_load_roundtrip(ray_session, split_corpus, tmp_path):
    """save_linkage_state flattens a chain's lazy lineage to Parquet;
    a state reloaded by load_linkage_state (as a fresh driver would)
    must drive the next increment to the identical merged assignment."""
    from wned_ray.pipelines.increment import (load_linkage_state,
                                              save_linkage_state)

    corpus, base_path, delta_path = split_corpus
    cfg = PipelineConfig(global_promote=False)

    base = run_linkage(base_path, corpus["aliases"],
                       corpus["graph_edges"], cfg,
                       redirects_path=corpus["redirects"])
    ckpt = str(tmp_path / "state")
    save_linkage_state(base, ckpt)
    loaded = load_linkage_state(ckpt)

    inc_mem = run_linkage_increment(base, delta_path, corpus["aliases"],
                                    corpus["graph_edges"], cfg,
                                    redirects_path=corpus["redirects"])
    inc_disk = run_linkage_increment(loaded, delta_path, corpus["aliases"],
                                     corpus["graph_edges"], cfg,
                                     redirects_path=corpus["redirects"])

    got = _assign_df(inc_disk["clusters"])
    want = _assign_df(inc_mem["clusters"])
    assert len(got) == len(want)
    merged = got.merge(want, on="mention_id", suffixes=("_disk", "_mem"))
    diff = merged[merged["cluster_id_disk"] != merged["cluster_id_mem"]]
    assert diff.empty, diff.head(20)

    # and the saved state itself is re-saveable: the increment's merged
    # state flattens too (the every-K-increments production cadence)
    ckpt2 = str(tmp_path / "state2")
    save_linkage_state(inc_disk["state"], ckpt2)
    reloaded = load_linkage_state(ckpt2)
    assert (_assign_df(reloaded["clusters"])["cluster_id"]
            .equals(got["cluster_id"]))
