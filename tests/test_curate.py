"""End-to-end corpus curation: planted-fate fixture + resume."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

EN = ("the quick brown fox jumps over a lazy dog and then it runs back "
      "to the forest with its friends because they all like running")
DE = ("der schnelle braune fuchs springt und die anderen tiere sind auch "
      "da mit einem freund von der stadt nicht ohne das alte buch")


@pytest.fixture()
def corpus(tmp_path):
    rng = np.random.default_rng(11)

    def variant(i):
        words = EN.split()
        rng.shuffle(words)
        return f"{EN} extra{i} " + " ".join(words[:8])

    v0, v1, v2 = variant(0), variant(1), variant(2)
    rows = [
        # survivors: distinct English docs
        (0, v0), (1, v1), (2, v2),
        # exact duplicate of doc 0 -> dropped by exact dedup
        (3, v0),
        # near duplicate of doc 1 (one-word tail) -> dropped by MinHash
        (4, v1 + " tweak"),
        # wrong language -> dropped by lang filter
        (5, DE),
        # too short -> dropped by quality filter
        (6, "hi"),
        # too punctuation-heavy -> dropped by quality filter
        (7, "a!!! b??? c;;; d,,, e... f!!! g??? h;;; i,,, j..."),
    ]
    p = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }), p)
    return p


def test_curate_corpus_planted_fates(ray_session, corpus, tmp_path):
    from wned_ray.pipelines.curate import curate_corpus

    out_dir = str(tmp_path / "curated")
    stats = curate_corpus(corpus, out_dir, lang_keep=("en",), min_tokens=5,
                          max_punct_ratio=0.2, jaccard_threshold=0.6,
                          num_partitions=4)
    assert stats["n_input"] == 8
    assert stats["n_lang_quality"] == 5          # 5, 6, 7 filtered
    assert stats["n_after_exact_dedup"] == 4     # 3 dropped (dup of 0)
    assert stats["n_final"] == 3                 # 4 dropped (near-dup of 1)
    assert stats["partitions"] == ["en"]

    kept = pq.read_table(out_dir).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 1, 2]
    # partitioned layout on disk: one directory per language
    assert os.path.isdir(os.path.join(out_dir, "lang_pred=en"))


def test_curate_checkpoint_resume(ray_session, corpus, tmp_path):
    """Kill-and-rerun: the dedup stages resume from manifests and the
    final output is identical."""
    import shutil

    from wned_ray.pipelines.curate import curate_corpus

    ckpt = str(tmp_path / "ckpt")
    out1 = str(tmp_path / "c1")
    s1 = curate_corpus(corpus, out1, lang_keep=("en",),
                       jaccard_threshold=0.6, checkpoint_dir=ckpt,
                       num_partitions=4)
    assert os.path.exists(
        os.path.join(ckpt, "curate_exact_keep", "_MANIFEST.json"))
    assert os.path.exists(
        os.path.join(ckpt, "curate_near_drop", "_MANIFEST.json"))

    # crash before the final write: rerun with the same checkpoint dir
    out2 = str(tmp_path / "c2")
    s2 = curate_corpus(corpus, out2, lang_keep=("en",),
                       jaccard_threshold=0.6, checkpoint_dir=ckpt,
                       num_partitions=4)
    assert s1["n_final"] == s2["n_final"]
    a = (pq.read_table(out1).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (pq.read_table(out2).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_anti_join_broadcast_and_distributed_agree(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.curate import anti_join

    rng = np.random.default_rng(2)
    big = pd.DataFrame({"k": rng.integers(0, 1000, 5000),
                        "v": np.arange(5000)})
    drop = pd.DataFrame({"d": rng.choice(np.arange(1000), 200,
                                         replace=False)})
    bc = (anti_join(rd.from_pandas(big), rd.from_pandas(drop), on="k",
                    key_col="d", broadcast_max=10_000)
          .to_pandas().sort_values("v").reset_index(drop=True))
    dist = (anti_join(rd.from_pandas(big), rd.from_pandas(drop), on="k",
                      key_col="d", broadcast_max=1, num_partitions=4)
            .to_pandas().sort_values("v").reset_index(drop=True))
    want = (big[~big["k"].isin(set(drop["d"]))]
            .sort_values("v").reset_index(drop=True))
    pd.testing.assert_frame_equal(bc, want)
    pd.testing.assert_frame_equal(dist[["k", "v"]].astype("int64"),
                                  want[["k", "v"]].astype("int64"))


def test_curate_corpus_scrub_stage(ray_session, tmp_path):
    """scrub=True: dedup sees RAW bytes (two docs differing only inside
    a redacted span both survive exact dedup), then surviving text is
    rewritten in place with per-category counts riding along."""
    import ray.data as rd

    from wned_ray.pipelines.curate import curate_corpus

    base = EN + " contact us today for more details about the offer"
    rows = [
        (0, base + " at alice@example.com thanks"),
        (1, base + " at bob@example.org thanks"),   # differs only in email
        (2, base),                                   # no PII
    ]
    p = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }), p)
    out_dir = str(tmp_path / "curated")
    stats = curate_corpus(p, out_dir, lang_keep=("en",), min_tokens=5,
                          max_punct_ratio=0.2, jaccard_threshold=0.95,
                          num_partitions=2, scrub=True)
    got = (rd.read_parquet(out_dir).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # both email docs survive dedup (raw bytes differ) and are scrubbed
    # to the SAME text afterwards — proving scrub runs after dedup
    kept_emails = got[got["n_email"] > 0]
    assert len(kept_emails) >= 1
    assert all("<EMAIL>" in t for t in kept_emails["text"])
    assert all("@" not in t for t in got["text"])
    assert "n_phone" in got.columns and int(got["n_phone"].sum()) == 0
    assert stats["n_final"] == len(got)


def test_curate_repetition_and_decontam_stages(ray_session, corpus,
                                               tmp_path):
    """Planted fates for the two round-4 funnel additions: a repetitive
    doc dies at the Gopher filter; a doc sharing a 4-gram with the eval
    set dies at decontamination; the original survivors still survive."""
    import duckdb

    from wned_ray.pipelines.curate import curate_corpus

    base = duckdb.sql(
        f"SELECT * FROM read_parquet('{corpus}')").df()
    extra = pd.DataFrame({
        "doc_id": [8, 9],
        "text": [
            # >60% of tokens are one word -> top_word_frac filter
            "spam spam spam spam spam spam spam spam one two three four",
            # contains the eval 4-gram "alpha beta gamma delta"
            "we mention alpha beta gamma delta inside a normal document "
            "about the forest and other things people like to read",
        ],
    })
    docs_p = str(tmp_path / "docs2.parquet")
    pd.concat([base, extra], ignore_index=True).to_parquet(docs_p)
    ev_p = str(tmp_path / "eval.parquet")
    pd.DataFrame({
        "doc_id": [1000],
        "text": ["alpha beta gamma delta is an eval question"],
    }).to_parquet(ev_p)

    out_dir = str(tmp_path / "curated2")
    stats = curate_corpus(docs_p, out_dir, lang_keep=("en",), min_tokens=5,
                          max_punct_ratio=0.2, jaccard_threshold=0.6,
                          num_partitions=4, max_top_word_frac=0.5,
                          decontam_eval_path=ev_p)
    # doc 8 dies at repetition (inside n_lang_quality), doc 9 at decontam
    assert stats["n_lang_quality"] == 6          # 5 originals + doc 9
    assert stats["n_after_decontam"] == 5
    assert stats["n_final"] == 3
    kept = pq.read_table(out_dir).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 1, 2]
