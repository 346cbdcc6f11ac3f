"""Prepare stage: mention extraction + normalization per turn (M6/M9/M10/M11).

Stateless ``map_batches`` over zero-copy Arrow. Input is the
``input_hint`` transcript schema; output adds:

- ``mention_id``   : ``conv_id || ':' || turn_idx`` (the stable primary key)
- ``mention``      : raw extracted surface form (capitalized token run)
- ``norm_mention`` : normalized form (the alias-lookup key,
  ``CandidateSelectionLucene.java:95``)
- ``ctx``          : space-joined, stopword-filtered, lowercased context
  terms of the turn (mention removed) — the sparse context vector's term
  bag, serialized compactly for transit (``TFIDF3x.DocTFIDFVector`` analog)

Per-row invariant: ``text`` passes through byte-identical, and
``(conv_id, turn_idx)`` is never modified (BASELINE.json input_hint).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from wned_ray.config import PipelineConfig
from wned_ray.functions.anchors import strip_markup
from wned_ray.functions.textnorm import (context_terms, extract_mentions,
                                         normalize_names)


def extract_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """Mention extraction + normalization (no context yet).

    markup -> plain (M2, WikiTextParser display semantics): mention
    extraction sees the DISPLAY form of any [[target|anchor]] wiki link;
    the stored ``text`` column passes through byte-identical (input_hint
    per-row invariant) — the stripped view is transient."""
    text = strip_markup(batch["text"])
    mention = extract_mentions(text)
    norm = normalize_names(mention, cfg.strip_titles, cfg.strip_corp_suffixes)
    mention_id = pc.binary_join_element_wise(
        batch["conv_id"], pc.cast(batch["turn_idx"], pa.string()), ":")
    return (batch
            .append_column("mention_id", mention_id)
            .append_column("mention", mention)
            .append_column("norm_mention", norm))


def context_batch(batch: pa.Table) -> pa.Table:
    text = strip_markup(batch["text"])
    ctx_list = context_terms(text, batch["mention"])
    return batch.append_column("ctx", pc.binary_join(ctx_list, " "))


def prepare_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """extract + context in one pass (the no-promotion fast path)."""
    return context_batch(extract_batch(batch, cfg))


def prepare(ds, cfg: PipelineConfig):
    """transcripts Dataset -> prepared Dataset (stateless tasks), plus the
    per-conversation promotion shuffle (M8 coref + M13 abbreviation
    expansion) when either is enabled.

    The ``ctx`` term bag (text-sized) is computed AFTER the promotion
    shuffle: it does not depend on the promoted norm, and materializing
    it before the conv_id sort would double the bytes moved through the
    pipeline's one unavoidable per-document all-to-all."""
    if cfg.coref_promote or cfg.abbrev_expand or cfg.global_promote:
        out = ds.map_batches(lambda b: extract_batch(b, cfg),
                             batch_format="pyarrow")
        if cfg.coref_promote or cfg.abbrev_expand:
            out = (promote_mentions_presorted(out, cfg)
                   if cfg.presorted_conversations
                   else promote_mentions(out, cfg))
        if cfg.global_promote:
            # materialize: global_promote consumes `out` twice (the
            # vocabulary scan and the promotion apply) — without the pin
            # the per-conversation promotion shuffle, the prepare path's
            # most bandwidth-bound piece, would re-execute for each
            out = out.materialize()
            out = global_promote(out, cfg)
        return out.map_batches(context_batch, batch_format="pyarrow")
    return ds.map_batches(lambda b: prepare_batch(b, cfg),
                          batch_format="pyarrow")


def promote_mentions(prepared_ds, cfg: PipelineConfig):
    """Per-conversation norm promotion, grouped by conversation: M13
    abbreviation-definition expansion first ("VS" with a mined definition
    inherits the definition's norm,
    ``MentionExpansion.findAbbrevDefinitions:961-1066``), then M8
    substring promotion (short norm -> longest containing co-occurring
    norm, ``ELUtils.resolve:178-208``). The pre-promotion norm is kept as
    ``norm_orig`` for the J3 multi-key candidate lookup downstream.

    This is the one deliberately per-document shuffle in the prepare path
    — the promotion decision needs the conversation's full surface set
    (reference semantics are per-document). Groups are conversation-sized
    (tiny), the payload is the prepared row, and the same conv_id
    partitioning is what downstream per-conv stages (resolve) use.
    (``map_groups`` wants a plain function, hence the closure over the
    two config flags rather than a callable class. The group function
    stays on zero-copy Arrow slices — at corpus scale it runs once per
    conversation, so a pandas copy + ``Table.from_pandas`` per group was
    the promote stage's dominant constant.)"""
    coref, abbrev = cfg.coref_promote, cfg.abbrev_expand

    def _promote_group(t: pa.Table) -> pa.Table:
        from wned_ray.functions.coref import promote_norms

        norms = t["norm_mention"].to_pylist()
        mine = (abbrev and "mention" in t.column_names
                and "text" in t.column_names)
        raw = t["mention"].to_pylist() if mine else [""] * len(norms)
        texts = t["text"].to_pylist() if mine else []
        out = promote_norms(raw, texts, norms, coref=coref, abbrev=mine)
        if "norm_orig" not in t.column_names:      # presorted boundary rows
            t = t.append_column("norm_orig", t["norm_mention"])
        if out != norms:
            t = t.set_column(t.column_names.index("norm_mention"),
                             "norm_mention", pa.array(out, pa.string()))
        return t

    return (prepared_ds
            .groupby("conv_id")
            .map_groups(_promote_group, batch_format="pyarrow",
                        zero_copy_batch=True))


def promote_mentions_presorted(prepared_ds, cfg: PipelineConfig):
    """No-shuffle per-conversation promotion for conversation-contiguous
    inputs (``cfg.presorted_conversations``): Ray Data blocks are
    contiguous row ranges in file order, so any conversation that is
    neither the FIRST nor the LAST conv_id of its block is complete
    inside the block and promotes locally; the boundary conversations
    (~2 per block — a conv split across blocks is first-of-one and
    last-of-the-other, so its full row set lands in the boundary subset)
    go through the ordinary per-document shuffle. Exactly equal results
    to ``promote_mentions`` (equivalence-tested); the full-text
    all-to-all shrinks from |corpus| to |boundary convs|."""
    coref, abbrev = cfg.coref_promote, cfg.abbrev_expand

    def tag_and_promote(batch: pa.Table) -> pa.Table:
        import numpy as np

        from wned_ray.functions.coref import promote_norms

        n = batch.num_rows
        if n == 0:
            return (batch
                    .append_column("norm_orig", batch["norm_mention"])
                    .append_column("_conv_boundary",
                                   pa.array([], pa.bool_())))
        conv = batch["conv_id"]
        first, last = conv[0].as_py(), conv[n - 1].as_py()
        is_b_arr = pc.or_(pc.equal(conv, first), pc.equal(conv, last))
        is_b = is_b_arr.to_numpy(zero_copy_only=False)

        norms = batch["norm_mention"].to_pylist()
        mine = (abbrev and "mention" in batch.column_names
                and "text" in batch.column_names)
        raw = batch["mention"].to_pylist() if mine else [""] * n
        texts = batch["text"].to_pylist() if mine else []
        convs = np.asarray(conv.to_pylist(), dtype=object)
        change = np.ones(n, bool)
        change[1:] = convs[1:] != convs[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        out = list(norms)
        for s, e in zip(starts.tolist(), ends.tolist()):
            if is_b[s]:
                continue                      # boundary conv: shuffled below
            out[s:e] = promote_norms(
                raw[s:e], texts[s:e] if mine else [], norms[s:e],
                coref=coref, abbrev=mine)
        t = batch.append_column("norm_orig", batch["norm_mention"])
        if out != norms:
            t = t.set_column(t.column_names.index("norm_mention"),
                             "norm_mention", pa.array(out, pa.string()))
        return t.append_column("_conv_boundary", is_b_arr)

    # batch_size=None => one call per BLOCK (the contiguity unit);
    # materialized because two filtered consumers follow
    tagged = prepared_ds.map_batches(tag_and_promote,
                                     batch_format="pyarrow",
                                     batch_size=None).materialize()

    def keep(boundary: bool):
        def f(batch: pa.Table) -> pa.Table:
            mask = (batch["_conv_boundary"] if boundary
                    else pc.invert(batch["_conv_boundary"]))
            return batch.filter(mask).drop_columns(["_conv_boundary"])
        return f

    interior = tagged.map_batches(keep(False), batch_format="pyarrow")
    boundary = tagged.map_batches(keep(True), batch_format="pyarrow")
    promoted_boundary = promote_mentions(boundary, cfg)
    return interior.union(promoted_boundary)


def _promotion_table(norms_ds, max_token_block: int) -> pa.Table:
    """Distinct norms -> (norm_orig_key, norm_promoted) promotion rows:
    norm A promotes to norm B iff A's token set is strictly contained in
    B's and B is the ONLY such extension (corpus-wide unambiguity guard).

    All work is over the DISTINCT-norm vocabulary (dim-sized): one token
    explode, one self-join on token with the standard hot-token
    exclusion, one containment groupby. Returns a plain Arrow table —
    bounded by the promotable-norm count."""
    import numpy as np
    from ray.data.aggregate import Count, Max

    def tok(batch: pa.Table) -> pa.Table:
        import pandas as pd

        toks = pc.split_pattern(batch["norm_mention"], " ")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat, parents = flat.filter(keep), parents.filter(keep)
        # DISTINCT (norm, token) presence rows + distinct token count:
        # token-SET containment semantics, matching
        # _promotion_table_local (duplicate tokens inside one surface
        # must not inflate the shared count)
        par = parents.to_numpy(zero_copy_only=False).astype("int64")
        vals = flat.to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(vals)
        ncodes = int(codes.max()) + 1 if len(codes) else 1
        _, idx = np.unique(par * ncodes + codes, return_index=True)
        par_u = par[idx]
        n_distinct = np.bincount(par_u, minlength=batch.num_rows)
        tp = pa.array(par_u)
        return pa.table({
            "token": flat.take(pa.array(idx)),
            "norm": batch["norm_mention"].take(tp),
            "n_tok": pa.array(n_distinct[par_u], pa.int64()),
        })

    toks = norms_ds.map_batches(tok, batch_format="pyarrow").materialize()

    from wned_ray.util import safe_partitions

    nparts = safe_partitions(16, rows=toks.count())
    hot = (toks.groupby("token").aggregate(Count(alias_name="_n"))
           .filter(expr=f"_n > {max_token_block}"))
    hot_set = {r["token"] for r in hot.take_all()}
    if hot_set:
        import ray

        hot_ref = ray.put(pa.array(sorted(hot_set), pa.string()))

        def drop(batch: pa.Table) -> pa.Table:
            import ray as _r

            return batch.filter(pc.invert(
                pc.is_in(batch["token"], value_set=_r.get(hot_ref))))

        toks = toks.map_batches(drop, batch_format="pyarrow")

    left = toks.rename_columns({"norm": "norm_a", "n_tok": "na"})
    right = toks.rename_columns({"norm": "norm_b", "n_tok": "nb"})
    j = left.join(right, join_type="inner", num_partitions=nparts,
                  on=("token",))

    def proper(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less(batch["na"], batch["nb"]))

    # containment <=> #shared tokens == |A|; then unambiguity per A
    shared = (j.map_batches(proper, batch_format="pyarrow")
              .groupby(["norm_a", "norm_b"])
              .aggregate(Count(alias_name="n_shared"),
                         Max("na", alias_name="na")))

    def contained(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["n_shared"], batch["na"]))

    def decide(g) -> pa.Table:
        """One bare norm's extension set -> 0 or 1 promotion row.

        Promote when the extension is unique, OR when every pair of
        extensions is itself a near-duplicate surface (JW >= 0.9 —
        typo variants of one canonical form, which co-block and merge
        downstream anyway, so ANY of them connects the bare mention to
        the component; pick the lexicographic min for determinism).
        Genuinely ambiguous bare names ("john" under "john smith" AND
        "john doe") fail the pairwise test and stay unpromoted."""
        import numpy as np

        from wned_ray.functions.strsim import jaro_winkler_batch

        exts = sorted(g["norm_b"].tolist())
        ok = len(exts) == 1
        if not ok and len(exts) <= 16:       # tiny by construction
            a = np.array([exts[i] for i in range(len(exts))
                          for j in range(i + 1, len(exts))])
            b = np.array([exts[j] for i in range(len(exts))
                          for j in range(i + 1, len(exts))])
            ok = bool(jaro_winkler_batch(a, b).min() >= 0.9)
        if not ok:
            return pa.table({"norm_a": pa.array([], pa.string()),
                             "norm_promoted": pa.array([], pa.string())})
        return pa.table({
            "norm_a": pa.array([g["norm_a"].iloc[0]], pa.string()),
            "norm_promoted": pa.array([exts[0]], pa.string()),
        })

    uniq = (shared.map_batches(contained, batch_format="pyarrow")
            .groupby("norm_a")
            .map_groups(decide, batch_format="pandas")
            .materialize())
    return uniq


def _collect_promotions(uniq, broadcast_max: int) -> pa.Table | None:
    """Materialized promotion Dataset -> one Arrow table, or None when it
    exceeds the broadcast cap (collect is guarded BEFORE take_all)."""
    n = uniq.count()
    if n == 0 or n > broadcast_max:
        return pa.table({"norm_a": pa.array([], pa.string()),
                         "norm_promoted": pa.array([], pa.string())
                         }) if n == 0 else None
    rows = uniq.take_all()
    return pa.table({
        "norm_a": pa.array([r["norm_a"] for r in rows], pa.string()),
        "norm_promoted": pa.array([r["norm_promoted"] for r in rows],
                                  pa.string()),
    })


def _promotion_table_local(norms: list[str], max_token_block: int
                           ) -> pa.Table:
    """Driver-side twin of ``_promotion_table`` for a driver-sized
    vocabulary: identical rule (token containment + unique-or-near-dup
    extensions), plain pandas/numpy — at typical vocab sizes the five
    tiny Ray shuffles of the distributed form are all fixed overhead."""
    import numpy as np
    import pandas as pd

    from wned_ray.functions.strsim import jaro_winkler_batch

    if not norms:
        return pa.table({"norm_a": pa.array([], pa.string()),
                         "norm_promoted": pa.array([], pa.string())})
    empty = pa.table({"norm_a": pa.array([], pa.string()),
                      "norm_promoted": pa.array([], pa.string())})
    df = pd.DataFrame({"norm": norms})
    toks = df["norm"].str.split(" ")
    ex = df.assign(token=toks).explode("token")
    ex = ex[ex["token"] != ""]
    if not len(ex):
        return empty
    # DISTINCT (norm, token) presence rows. The rule is token-SET
    # containment: set(a) ⊆ set(b) with |set(a)| < |set(b)| — the old
    # occurrence-product count (n_shared = Σ j·k) could certify
    # "containment" through a duplicated token on either side ("w29 w11"
    # under "w11 w11 w30"), a false promotion; sets close that hole.
    code, _ = pd.factorize(ex["token"].to_numpy())
    nid = ex.index.to_numpy().astype(np.int64)    # explode keeps df index
    ncodes = int(code.max()) + 1
    key = nid * ncodes + code
    occ_key = np.unique(key)
    occ_nid = (occ_key // ncodes).astype(np.int64)
    occ_code = (occ_key % ncodes).astype(np.int64)
    # na = distinct token count PRE hot-drop (a norm with a dropped hot
    # token keeps its full na and therefore never certifies containment)
    na_all = np.bincount(occ_nid, minlength=len(df)).astype(np.int64)
    tc = np.bincount(occ_code, minlength=ncodes)  # norms-per-token counts
    surv = tc[occ_code] <= max_token_block
    occ_key, occ_nid, occ_code = occ_key[surv], occ_nid[surv], occ_code[surv]
    if not len(occ_key):
        return empty
    # Rarest-token candidate generation instead of a token self-join: a
    # contained norm shares EVERY token with its container, so probing
    # each norm through its globally rarest surviving token reaches
    # every container while generating Σ_a cnt(rarest(a)) candidates
    # instead of Σ_t cnt(t)² join rows (the self-merge was ~7 s of
    # driver wall at the 8M-turn vocabulary; this is <1 s).
    order = np.lexsort((tc[occ_code], occ_nid))
    first = np.flatnonzero(np.r_[True, occ_nid[order][1:]
                                 != occ_nid[order][:-1]])
    probe_nid = occ_nid[order][first]
    probe_code = occ_code[order][first]
    # norms containing each token: rows sorted by (code, nid)
    byc = np.lexsort((occ_nid, occ_code))
    c_sorted = occ_code[byc]
    n_sorted = occ_nid[byc]
    starts = np.searchsorted(c_sorted, np.arange(ncodes))
    ends = np.searchsorted(c_sorted, np.arange(ncodes), side="right")
    cnt = (ends - starts)[probe_code]
    A = np.repeat(probe_nid, cnt)
    off = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(cnt) - cnt, cnt)
    B = n_sorted[np.repeat(starts[probe_code], cnt) + off]
    keep = na_all[A] < na_all[B]
    A, B = A[keep], B[keep]
    if not len(A):
        return empty
    # verify set containment: explode a's surviving distinct tokens per
    # candidate pair, membership-test (b, token) via searchsorted over
    # the sorted presence keys, all() per pair via reduceat-min
    a_starts = np.searchsorted(occ_nid, A)
    a_ends = np.searchsorted(occ_nid, A, side="right")
    a_cnt = a_ends - a_starts                      # >= 1: A came from occ
    total = int(a_cnt.sum())
    src = np.repeat(a_starts, a_cnt) + (
        np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(a_cnt) - a_cnt, a_cnt))
    pair_idx = np.repeat(np.arange(len(A), dtype=np.int64), a_cnt)
    probe_key = B[pair_idx] * ncodes + occ_code[src]
    pos = np.searchsorted(occ_key, probe_key)
    pos = np.minimum(pos, len(occ_key) - 1)
    present = (occ_key[pos] == probe_key).astype(np.int64)
    bounds = np.cumsum(a_cnt) - a_cnt
    n_shared = np.add.reduceat(present, bounds)
    ok = n_shared == na_all[A]
    if not ok.any():
        return empty
    norm_arr = df["norm"].to_numpy()
    cont = pd.DataFrame({"norm_a": norm_arr[A[ok]],
                         "norm_b": norm_arr[B[ok]]})
    out_a, out_b = [], []
    for norm_a, g in cont.groupby("norm_a"):
        exts = sorted(g["norm_b"].tolist())
        ok = len(exts) == 1
        if not ok and len(exts) <= 16:
            a = np.array([exts[i] for i in range(len(exts))
                          for j in range(i + 1, len(exts))])
            b = np.array([exts[j] for i in range(len(exts))
                          for j in range(i + 1, len(exts))])
            ok = bool(jaro_winkler_batch(a, b).min() >= 0.9)
        if ok:
            out_a.append(norm_a)
            out_b.append(exts[0])
    return pa.table({"norm_a": pa.array(out_a, pa.string()),
                     "norm_promoted": pa.array(out_b, pa.string())})


def global_promote(prepared_ds, cfg: PipelineConfig,
                   broadcast_max: int = 10_000_000):
    """Corpus-wide substring promotion (the reference's per-document
    ``ELUtils.resolve:178-208`` rule lifted to corpus scope): a mention
    whose norm's token set is strictly contained in exactly ONE other
    distinct norm inherits that norm, so a bare surface in a conversation
    with no co-occurring full form still reaches its canonical surface.
    The unambiguity guard keeps real-world bare names ("john" under both
    "john smith" and "john doe") unpromoted.

    Shape: promotion pairs are computed over the DISTINCT-norm
    vocabulary (dim-sized, hot-token capped) and applied with broadcast
    Arrow index_in/take kernels per batch — no mention-level shuffle.
    The table is ray.put once; past ``broadcast_max`` rows the promotion
    is skipped with a warning (a corpus where most of the vocabulary is
    promotable means the guard is mis-tuned, not that the driver should
    OOM)."""
    import ray
    from ray.data.aggregate import Count

    # Per-batch unique combiner: the driver collect (or the groupby on
    # the distributed path) sees |batch-distinct| rows, not |mentions|.
    def batch_distinct(batch: pa.Table) -> pa.Table:
        return pa.table({"norm_mention": pc.unique(batch["norm_mention"])})

    import sys
    import time

    t0 = time.time()
    uniq = (prepared_ds.select_columns(["norm_mention"])
            .map_batches(batch_distinct, batch_format="pyarrow")
            .materialize())
    print(f"[profiling] prepared substage=promote_vocab_scan "
          f"sec={time.time() - t0:.1f}", file=sys.stderr)
    t0 = time.time()
    if uniq.count() <= broadcast_max:        # vocab fits the driver
        parts = [t for t in ray.get(uniq.to_arrow_refs())
                 if t.num_columns > 0 and t.num_rows > 0]
        if parts:
            va = pc.unique(
                pa.concat_tables(parts)["norm_mention"].combine_chunks())
            vocab = va.take(pc.sort_indices(va)).to_pylist()
        else:
            vocab = []
        promo = _promotion_table_local(vocab, cfg.max_block_size)
        print(f"[profiling] prepared substage=promote_table_driver "
              f"sec={time.time() - t0:.1f}", file=sys.stderr)
    else:                                    # corpus-scale vocabulary
        norms = (uniq.groupby("norm_mention")
                 .aggregate(Count(alias_name="_n")))
        promo = _collect_promotions(
            _promotion_table(norms, cfg.max_block_size), broadcast_max)
        if promo is None:
            import warnings

            warnings.warn("global_promote: promotable norms exceed the "
                          f"broadcast cap {broadcast_max}; skipping "
                          "promotion")
            return prepared_ds
    if promo.num_rows == 0:
        return prepared_ds
    # compose chains to fixpoint ("a" -> "a b", "a b" -> "a b c" becomes
    # "a" -> "a b c"): driver dict walk over the promotion map (bounded
    # by broadcast_max), cycle-safe via the hop cap
    mp = dict(zip(promo["norm_a"].to_pylist(),
                  promo["norm_promoted"].to_pylist()))
    resolved = {}
    for k in mp:
        v, hops = mp[k], 0
        while v in mp and hops < 16:
            v, hops = mp[v], hops + 1
        resolved[k] = v
    promo = pa.table({
        "norm_a": pa.array(list(resolved.keys()), pa.string()),
        "norm_promoted": pa.array(list(resolved.values()), pa.string()),
    })
    ref = ray.put((promo["norm_a"].combine_chunks(),
                   promo["norm_promoted"].combine_chunks()))

    def apply(batch: pa.Table) -> pa.Table:
        keys, vals = ray.get(ref)           # zero-copy plasma read
        idx = pc.index_in(batch["norm_mention"], value_set=keys)
        newn = pc.coalesce(vals.take(idx), batch["norm_mention"])
        if "norm_orig" not in batch.column_names:
            batch = batch.append_column("norm_orig", batch["norm_mention"])
        return batch.set_column(batch.column_names.index("norm_mention"),
                                "norm_mention", newn)

    return prepared_ds.map_batches(apply, batch_format="pyarrow")
