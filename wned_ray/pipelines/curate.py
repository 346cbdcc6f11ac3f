"""End-to-end corpus curation — the canonical LLM training-data flow,
composed entirely from this repo's operators, streaming at every stage:

    read -> language-ID filter -> quality filter -> exact dedup ->
    MinHash-LSH near-dup removal -> lang-partitioned Parquet output

Every stage is a Dataset transform (no driver-side row loops); the two
dedup joins reuse the scale-hardened primitives (``bloom_semi_join`` for
the exact-dedup keep set, hash anti-join for the near-dup drop set), and
the final write is a partitioned Parquet directory (one subdir per
language) so a failed run resumes per partition. With ``checkpoint_dir``
set, the expensive dedup stages checkpoint through
``state.checkpoint.checkpoint_dataset`` manifests and a rerun skips
completed work (north_rule resumability).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def anti_join(big_ds, drop_keys_ds, on: str, key_col: str | None = None,
              num_partitions: int = 16, broadcast_max: int = 2_000_000):
    """Rows of ``big_ds`` whose ``on`` does NOT appear in
    ``drop_keys_ds[key_col]``.

    Small drop sets broadcast (one ``ray.put`` value-set, vectorized
    ``is_in`` per batch — the J7 shape); past ``broadcast_max`` keys it
    switches to a distributed left-outer hash join + null filter, so the
    drop side never has to fit on the driver."""
    import ray

    from wned_ray.util import safe_partitions

    kc = key_col or on
    keys = drop_keys_ds.select_columns([kc]).materialize()
    if keys.count() <= broadcast_max:
        vals = pa.array(sorted({r[kc] for r in keys.take_all()}))
        if len(vals) == 0:
            return big_ds
        ref = ray.put(vals)

        def drop(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.invert(
                pc.is_in(batch[on], value_set=ray.get(ref))))

        return big_ds.map_batches(drop, batch_format="pyarrow")

    def _mark(batch: pa.Table) -> pa.Table:
        return pa.table({
            on: batch[kc],
            "_dropped": pa.array(np.ones(batch.num_rows, np.int64)),
        })

    from ray.data.aggregate import Max

    marks = (keys.map_batches(_mark, batch_format="pyarrow")
             .groupby(on).aggregate(Max("_dropped", alias_name="_dropped")))
    out_cols = big_ds.schema().names
    joined = big_ds.join(marks, join_type="left_outer",
                         num_partitions=safe_partitions(num_partitions),
                         on=(on,))

    def keep_unmarked(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_null(batch["_dropped"]))

    return (joined.map_batches(keep_unmarked, batch_format="pyarrow")
            .select_columns(out_cols))


def curate_corpus(docs_path: str, out_dir: str, lang_keep=("en",),
                  min_tokens: int = 5, max_punct_ratio: float = 0.2,
                  jaccard_threshold: float = 0.8,
                  checkpoint_dir: str | None = None,
                  num_partitions: int = 16,
                  scrub: bool = False,
                  max_top_word_frac: float | None = None,
                  max_dup_word_frac: float | None = None,
                  decontam_eval_path: str | None = None,
                  decontam_n: int = 4) -> dict:
    """Run the full curation flow over ``docs_path`` and write the kept
    documents to ``out_dir`` partitioned by predicted language
    (``out_dir/lang_pred=xx/*.parquet``). Returns the stage-by-stage
    funnel counts plus the output layout.

    Near-dup rule: a document verified (exact n-gram Jaccard >=
    ``jaccard_threshold``) near-duplicate of a SMALLER-id document is
    dropped — the standard LSH keep-first discipline; two documents that
    are each near-dups of a third but never co-blocked both survive (no
    transitive closure, matching the usual curation semantics).

    ``scrub=True`` inserts the PII-redaction stage (datawork.scrub_pii)
    AFTER dedup — duplicates are detected on the raw bytes (scrubbing
    first would alias distinct docs that differ only inside a redacted
    span) and only surviving rows pay the rewrite. The written ``text``
    is then the scrubbed form, and per-category hit counts ride along.

    ``max_top_word_frac`` / ``max_dup_word_frac`` (Gopher §A1.1 rules)
    add the within-doc repetition filter to the quality stage — same
    stateless pass, zero extra shuffles. ``decontam_eval_path`` inserts
    benchmark decontamination (datawork.decontaminate) after the
    quality/repetition stage and BEFORE dedup, so contaminated docs
    never pay the dedup shuffles; the eval-set grams broadcast once."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import (bloom_semi_join, exact_dedup,
                                             lang_id, minhash_candidates,
                                             quality_scores, verify_jaccard)
    from wned_ray.state.checkpoint import (checkpoint_dataset,
                                           lineage_fingerprint)

    docs = rd.read_parquet(docs_path, columns=["doc_id", "text"])
    n_input = docs.count()

    langs = "".join(sorted(lang_keep))
    by_lang = lang_id(docs).filter(
        expr=" or ".join(f"lang_pred == '{l}'" for l in lang_keep))

    q = quality_scores(by_lang)
    good_lazy = q.filter(expr=f"n_tokens >= {min_tokens} and "
                              f"punct_ratio <= {max_punct_ratio}")
    if max_top_word_frac is not None or max_dup_word_frac is not None:
        from wned_ray.pipelines.datawork import repetition_signals

        rep_expr = " and ".join(
            f"{col} <= {cap}" for col, cap in
            (("top_word_frac", max_top_word_frac),
             ("dup_word_frac", max_dup_word_frac)) if cap is not None)
        good_lazy = repetition_signals(good_lazy).filter(expr=rep_expr)
    # slim the payload that rides through both dedup shuffles
    good_lazy = good_lazy.select_columns(["doc_id", "text", "lang_pred"])

    fp_base = lineage_fingerprint(docs_path, langs, min_tokens,
                                  max_punct_ratio, jaccard_threshold,
                                  max_top_word_frac, max_dup_word_frac,
                                  decontam_eval_path, decontam_n)

    # Multi-consumer stages pin through the CHECKPOINT when one is set —
    # partitioned parquet on disk, resumable, re-read in parallel — and
    # through the object store (materialize) only on the un-checkpointed
    # single-box path. At corpus scale always pass checkpoint_dir:
    # materializing the full doc set would push the whole corpus through
    # the object store's spill path.
    def _pin(factory, stage):
        if checkpoint_dir:
            return checkpoint_dataset(
                factory, stage=stage, ckpt_dir=checkpoint_dir,
                fingerprint=lineage_fingerprint(stage, fp_base))
        return factory().materialize()

    good = _pin(lambda: good_lazy, "curate_good")
    n_good = good.count()
    n_decontam = None
    if decontam_eval_path:
        from wned_ray.pipelines.datawork import decontaminate

        ev = rd.read_parquet(decontam_eval_path,
                             columns=["doc_id", "text"])
        good = _pin(
            lambda: (decontaminate(good, ev, n=decontam_n)
                     .filter(expr="contaminated == 0")
                     .drop_columns(["n_hit_grams", "contaminated"])),
            "curate_decontam")
        n_decontam = good.count()
    keeps = _pin(lambda: exact_dedup(good, id_col="doc_id"),
                 "curate_exact_keep")
    exact_kept = _pin(
        lambda: bloom_semi_join(good, keeps, on="doc_id", key_col="keep_id",
                                num_partitions=num_partitions),
        "curate_exact_kept")
    n_exact = exact_kept.count()

    def _near_drop():
        cands = minhash_candidates(exact_kept, id_col="doc_id",
                                   num_partitions=num_partitions)
        verified = verify_jaccard(cands, exact_kept, id_col="doc_id",
                                  threshold=jaccard_threshold,
                                  num_partitions=num_partitions)
        return verified.select_columns(["id_b"])

    drops = _pin(_near_drop, "curate_near_drop")
    final = anti_join(exact_kept, drops, on="doc_id", key_col="id_b",
                      num_partitions=num_partitions)

    if scrub:
        # inline twin of datawork.scrub_pii (same _PII_PATTERNS, same
        # staged order) that rewrites text IN PLACE and keeps every
        # column — no second consume of `final`, no re-join for the
        # partition column
        from wned_ray.pipelines.datawork import _PII_PATTERNS

        def _scrub_rows(batch: pa.Table) -> pa.Table:
            t = batch["text"]
            counts = []
            for name, pat, tok in _PII_PATTERNS:
                counts.append((f"n_{name}", pc.cast(
                    pc.count_substring_regex(t, pat), pa.int64())))
                t = pc.replace_substring_regex(t, pat, tok)
            batch = batch.set_column(
                batch.column_names.index("text"), "text", t)
            for n, c in counts:
                batch = batch.append_column(n, c)
            return batch

        final = final.map_batches(_scrub_rows, batch_format="pyarrow")

    final.write_parquet(out_dir, partition_cols=["lang_pred"])
    n_final = rd.read_parquet(out_dir).count()

    import glob
    import os

    parts = sorted(os.path.basename(p).split("=", 1)[1]
                   for p in glob.glob(os.path.join(out_dir, "lang_pred=*")))
    return {
        "n_input": n_input,
        "n_lang_quality": n_good,
        **({"n_after_decontam": n_decontam}
           if n_decontam is not None else {}),
        "n_after_exact_dedup": n_exact,
        "n_final": n_final,
        "n_near_dup_dropped": n_exact - n_final,
        "out_dir": out_dir,
        "partitions": parts,
    }
