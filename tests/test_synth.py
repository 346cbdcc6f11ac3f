"""Synthetic corpus generator: determinism, schema, label consistency."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wned_ray.synth import T1, CorpusSpec, generate_corpus


def test_schema_matches_input_hint(t1_corpus):
    t = pq.read_table(t1_corpus["transcripts"])
    assert t.schema.field("conv_id").type == pa.string()
    assert t.schema.field("turn_idx").type == pa.int32()
    assert t.schema.field("role").type == pa.string()
    assert t.schema.field("text").type == pa.string()
    assert t.schema.field("tool").type == pa.string()
    assert t.schema.field("ts").type == pa.timestamp("us")
    assert t.num_rows == 60 * 8
    # primary key + stable ordering
    df = t.to_pandas()
    assert not df.duplicated(["conv_id", "turn_idx"]).any()
    # ts monotone within conversation
    assert (df.sort_values(["conv_id", "turn_idx"])
              .groupby("conv_id")["ts"].is_monotonic_increasing.all())


def test_determinism(tmp_path):
    spec = CorpusSpec(seed=7, n_entities=20, n_convs=10, turns_per_conv=4)
    p1 = generate_corpus(spec, str(tmp_path / "a"))
    p2 = generate_corpus(spec, str(tmp_path / "b"))
    for k in p1:
        t1 = pq.read_table(p1[k])
        t2 = pq.read_table(p2[k])
        assert t1.equals(t2), k


def test_aliases_cover_corpus_mentions(t1_corpus):
    """Direct aliases deliberately MISS the 'oldname' surfaces (~8% of
    mentions); redirect composition (J6) restores full coverage."""
    from wned_ray.functions.textnorm import extract_mentions, normalize_names
    from wned_ray.stages.aliases import resolve_redirects_table

    from wned_ray.functions.coref import promote_norms

    from wned_ray.functions.anchors import strip_markup

    tr = pq.read_table(t1_corpus["transcripts"])
    # link variants render as [[target|surface]] wiki markup (M3/M5) —
    # mention extraction sees the display form, like the pipeline (M2)
    mentions = extract_mentions(strip_markup(tr["text"]))
    norm = normalize_names(mentions).to_pylist()
    alias_t = pq.read_table(t1_corpus["aliases"])
    direct = set(alias_t["alias"].to_pylist())
    nonempty = [m for m in norm if m]
    direct_cov = sum(m in direct for m in nonempty) / len(nonempty)
    assert 0.75 < direct_cov < 0.999        # the redirect+coref gap exists

    resolved = resolve_redirects_table(
        alias_t, pq.read_table(t1_corpus["redirects"]))
    full = set(resolved["alias"].to_pylist())
    redirect_cov = sum(m in full for m in nonempty) / len(nonempty)
    assert direct_cov < redirect_cov < 0.999  # barename still uncovered

    # per-conversation M8 promotion + M13 definition mining close (almost
    # all of) the rest — bare first names / initials whose conversation
    # lacks the needed evidence stay unresolvable by design
    conv = tr["conv_id"].to_pylist()
    df = pd.DataFrame({"conv": conv, "norm": norm,
                       "mention": mentions.to_pylist(),
                       "text": tr["text"].to_pylist()})
    promoted = []
    for _c, g in df.groupby("conv", sort=False):
        promoted.extend(promote_norms(g["mention"].tolist(),
                                      g["text"].tolist(),
                                      g["norm"].tolist()))
    nonempty_p = [m for m in promoted if m]
    covered = sum(m in full for m in nonempty_p)
    assert covered / len(nonempty_p) > 0.98
    assert covered / len(nonempty_p) > redirect_cov


def test_labels_consistent_with_entities(t1_corpus):
    labels = pq.read_table(t1_corpus["labels"]).to_pandas()
    assert (labels["id_a"] < labels["id_b"]).all()
    assert not labels.duplicated(["id_a", "id_b"]).any()
    assert labels["is_match"].sum() > 100          # enough positive pairs
    assert (~labels["is_match"]).sum() > 0         # and some negatives
    assert (labels.loc[~labels["is_match"], "entity_id"] == "NIL").all()


def test_expected_clusters_are_transitive(t1_corpus):
    exp = pq.read_table(t1_corpus["expected_clusters"]).to_pandas()
    labels = pq.read_table(t1_corpus["labels"]).to_pandas()
    rep = dict(zip(exp["mention_id"], exp["cluster_id"]))
    m = labels[labels["is_match"]]
    # every matched pair is in the same expected cluster
    assert all(rep[a] == rep[b] for a, b in zip(m["id_a"], m["id_b"]))
    # cluster representative is the min member id
    gro = exp.groupby("cluster_id")["mention_id"].min()
    assert (gro.index == gro.values).all()


def test_graph_edges_connect_same_topic(t1_corpus):
    g = pq.read_table(t1_corpus["graph_edges"]).to_pandas()
    assert len(g) > 0
    assert (g["weight"] > 0).all()
    assert (g["src"] != g["dst"]).all()
