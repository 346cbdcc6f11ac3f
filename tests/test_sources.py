"""Source readers: TSV dims, raw-text dirs, doc-dump files -> the
engine's table schemas, end-to-end into a real pipeline op."""

from __future__ import annotations

import pytest


@pytest.fixture()
def source_files(tmp_path):
    alias = tmp_path / "alias.tsv"
    alias.write_text("e1\tacme corp\tname\t40\n"
                     "e1\tacme corp\tlink\t10\n"
                     "e2\tbolt ltd\tname\t7\n")
    edges = tmp_path / "edges.tsv"
    edges.write_text("e1\te2\t3\ne2\te1\t1\n")
    txt = tmp_path / "docs"
    txt.mkdir()
    (txt / "a.txt").write_text("the quick brown fox")
    (txt / "b.txt").write_text("jumps over the lazy dog")
    dump = tmp_path / "dump.xml"
    dump.write_text(
        '<doc id="d1" title="Acme">Acme Corp makes anvils.</doc>\n'
        '<doc id="d2" title="Bolt">Bolt Ltd ships fasteners.</doc>\n'
        "<doc malformed>skipped</doc>\n")
    return {"alias": str(alias), "edges": str(edges), "txt": str(txt),
            "dump": str(dump)}


def test_read_alias_tsv_feeds_redirect_resolution(ray_session, source_files):
    import pyarrow as pa

    from wned_ray.sources import read_alias_tsv
    from wned_ray.stages.aliases import resolve_redirects_table

    ds = read_alias_tsv(source_files["alias"])
    t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    assert t.column_names == ["entity", "alias", "source", "freq"]
    assert t.num_rows == 3
    # the TSV-sourced dim drops straight into the redirect op
    redirects = pa.table({"from_alias": ["acme old"],
                          "to_alias": ["acme corp"]})
    out = resolve_redirects_table(t, redirects).to_pandas()
    assert len(out) == 4
    assert out.loc[out["source"] == "redirect", "freq"].item() == 50


def test_read_edges_tsv(ray_session, source_files):
    from wned_ray.sources import read_edges_tsv

    df = (read_edges_tsv(source_files["edges"]).to_pandas()
          .sort_values("weight").reset_index(drop=True))
    assert list(df.columns) == ["src", "dst", "weight"]
    assert df["weight"].tolist() == [1, 3]


def test_read_text_dir_feeds_token_count(ray_session, source_files):
    from wned_ray.pipelines.datawork import token_count
    from wned_ray.sources import read_text_dir

    ds = read_text_dir(source_files["txt"])
    out = token_count(ds).to_pandas().sort_values("doc_id")
    assert len(out) == 2
    assert out["n_tokens"].tolist() == [4, 5]
    assert all(out["doc_id"].str.endswith((".txt",)))


def test_read_doc_dump(ray_session, source_files):
    from wned_ray.sources import read_doc_dump

    df = (read_doc_dump(source_files["dump"]).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert df["doc_id"].tolist() == ["d1", "d2"]      # malformed skipped
    assert df["title"].tolist() == ["Acme", "Bolt"]
    assert df["text"].tolist() == ["Acme Corp makes anvils.",
                                   "Bolt Ltd ships fasteners."]


def test_read_jsonl_feeds_dedup(ray_session, tmp_path):
    import json

    from wned_ray.pipelines.datawork import exact_dedup
    from wned_ray.sources import read_jsonl

    p = tmp_path / "docs.jsonl"
    rows = [{"doc_id": 0, "text": "alpha beta", "lang": "en"},
            {"doc_id": 1, "text": "gamma delta", "lang": "en"},
            {"doc_id": 2, "text": "alpha beta", "lang": "de"}]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    ds = read_jsonl(str(p), columns=["doc_id", "text"])
    assert set(ds.schema().names) == {"doc_id", "text"}
    out = exact_dedup(ds, id_col="doc_id").to_pandas()
    assert len(out) == 2                      # 2 distinct texts
    assert sorted(out["keep_id"]) == [0, 1]   # min-id keep
    assert out["n_dups"].sum() == 3
