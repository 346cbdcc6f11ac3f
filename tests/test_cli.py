"""python -m wned_ray CLI: link -> save-state -> increment chain and the
curation funnel, each through a real subprocess (the CLI owns its own
Ray session, so no ray_session fixture here)."""

from __future__ import annotations

import json
import subprocess
import sys

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest


def _run(*args):
    r = subprocess.run([sys.executable, "-m", "wned_ray", *args],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-800:]
    return json.loads(r.stdout.strip().splitlines()[-1])


@pytest.mark.usefixtures()
def test_cli_link_increment_chain(t1_corpus, tmp_path):
    t = pq.read_table(t1_corpus["transcripts"])
    convs = sorted(set(t["conv_id"].to_pylist()))
    cut = convs[int(len(convs) * 0.9)]
    base_p = str(tmp_path / "base.parquet")
    delta_p = str(tmp_path / "delta.parquet")
    pq.write_table(t.filter(pc.less(t["conv_id"], cut)), base_p)
    pq.write_table(t.filter(pc.greater_equal(t["conv_id"], cut)), delta_p)

    d1 = _run("link", "--transcripts", base_p,
              "--aliases", t1_corpus["aliases"],
              "--graph", t1_corpus["graph_edges"],
              "--redirects", t1_corpus["redirects"],
              "--out", str(tmp_path / "c1"),
              "--save-state", str(tmp_path / "state1"),
              "--set", "global_promote=false")
    assert d1["clusters"] > 0 and d1["saved_state"]

    d2 = _run("increment", "--state", str(tmp_path / "state1"),
              "--delta", delta_p,
              "--aliases", t1_corpus["aliases"],
              "--graph", t1_corpus["graph_edges"],
              "--redirects", t1_corpus["redirects"],
              "--out", str(tmp_path / "c2"),
              "--set", "global_promote=false")
    assert d2["clusters"] == t.num_rows      # full merged assignment
    assert d2["delta_mentions"] > 0
    out = pq.read_table(str(tmp_path / "c2"))
    assert out.num_rows == t.num_rows
    assert sorted(out.column_names) == ["cluster_id", "mention_id"]


def test_cli_curate(tmp_path):
    d = _run("curate", "--docs",
             "/root/testdata/sf0.001/documents.parquet",
             "--out", str(tmp_path / "curated"), "--langs", "en,de")
    assert d["n_final"] > 0
    assert d["n_final"] <= d["n_input"]


def test_cli_rejects_unknown_config_key(tmp_path):
    r = subprocess.run(
        [sys.executable, "-m", "wned_ray", "link", "--transcripts", "x",
         "--aliases", "y", "--out", str(tmp_path / "o"),
         "--set", "not_a_field=1"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode != 0
    assert "not_a_field" in r.stderr
