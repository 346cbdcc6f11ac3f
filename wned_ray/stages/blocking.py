"""Blocking stage: MinHash/LSH band keys over DISTINCT normalized mentions
(Stage 2, SURVEY §7).

The Ray-Data-native recast of the reference's two alias tiers:

- exact tier (J1, ``CandidateSelectionLucene.selectCandidates``): mentions
  with the same normalized surface form trivially co-block — they are
  grouped by ``norm_mention`` directly, no LSH needed;
- fuzzy tier (J2, ``AliasLuceneIndex.queryAlias(str,n):247-300``): LSH
  band keys are computed ONCE PER DISTINCT normalized string, not per
  mention. Identical strings share every band, so mention-level band
  explosion would duplicate each same-norm pair ``num_bands`` times; the
  distinct-norm formulation removes that factor entirely (it cut the t2
  pair stage from ~96s to seconds) and is the scale-correct shape: the
  LSH join runs over |distinct surfaces| rows, not |mentions|.

``norm_blocks`` output schema: one row per (distinct norm, band):
``(norm_mention, n_mentions, block_key, band_idx)`` — deliberately slim,
since the blocking table is both a checkpointed stage and the (doubled)
payload of the pair-generation self-join; cross-band pair dedup happens
downstream as a cheap groupby-min over the collided pairs
(stages/pairs.py), not by shipping per-norm band vectors.

Skew discipline (north_rule): a block's weight is the SUM of member
mention counts (identical to the mention-level block size); keys over
``cfg.max_block_size`` are hot — detected by a pre-aggregated count pass
and excluded before the pair shuffle, the analog of the reference's hub
thresholds (``SubGraphGenerator.java:30-31``) and top-200 fuzzy budget.
The labels fixture applies the identical rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from wned_ray.config import PipelineConfig
from wned_ray.functions.minhash import TOKEN_TIER as _TOKEN_TIER
from wned_ray.functions.minhash import block_keys_with_bands


def _explode_norms(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    import pyarrow.compute as pc

    row_idx, keys, band_idx, _ = block_keys_with_bands(
        batch["norm_mention"], cfg.shingle_k, cfg.num_perm, cfg.band_rows,
        cfg.seed)
    take = pa.array(row_idx, pa.int64())
    out = pa.table({
        "norm_mention": batch["norm_mention"].take(take),
        "n_mentions": batch["n_mentions"].take(take),
        "rep_id": batch["rep_id"].take(take),
        "block_key": keys,
        "band_idx": pa.array(band_idx, pa.int32()),
    })
    if not cfg.token_blocks:
        return out
    # Token tier (fuzzy-lookup analog): one extra block row per (norm,
    # name token), so "vardosmor" co-blocks with "vardosmor belullin"
    # even though their char-shingle sets barely overlap. band_idx = -1
    # marks the tier; hot tokens are excluded downstream by the same
    # weighted hot_block_keys pass as hot LSH bands.
    from wned_ray.functions.minhash import mix_band, shingle_gram_hashes

    toks = pc.split_pattern(batch["norm_mention"], " ")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, "")
    flat, parents = flat.filter(keep), parents.filter(keep)
    if len(flat) == 0:
        return out
    h, _ = shingle_gram_hashes(flat, 1 << 30)
    tkeys = mix_band(np.uint64(_TOKEN_TIER), h)
    tp = pa.array(parents.to_numpy(zero_copy_only=False).astype(np.int64))
    tok_rows = pa.table({
        "norm_mention": batch["norm_mention"].take(tp),
        "n_mentions": batch["n_mentions"].take(tp),
        "rep_id": batch["rep_id"].take(tp),
        "block_key": pa.array(tkeys, pa.int64()),
        "band_idx": pa.array(np.full(len(tkeys), -1, np.int32)),
    })
    return pa.concat_tables([out, tok_rows])


def norm_blocks(prepared_ds, cfg: PipelineConfig):
    """prepared Dataset -> exploded blocking rows over DISTINCT norms.

    One groupby yields both the distinct norms and, per norm, the mention
    count (hot-key weights) and the lexicographic min mention id — the
    deterministic REPRESENTATIVE used by star-mode pair expansion
    (stages/pairs.py); no extra shuffle.

    Combiner discipline: a per-batch Arrow ``group_by`` (C++ hash
    aggregate) pre-reduces each block to its distinct norms BEFORE the
    hash-shuffle groupby, so the all-to-all moves |per-block distinct
    norms| partial rows instead of |mentions| — mention surfaces repeat
    heavily (Zipfian), which is the whole reason blocking over distinct
    norms pays. Sum-of-partial-counts + min-of-partial-mins is exactly
    the unpartitioned aggregate."""
    from ray.data.aggregate import Min, Sum

    def _partial(batch: pa.Table) -> pa.Table:
        g = (batch.group_by("norm_mention")
             .aggregate([("mention_id", "count"), ("mention_id", "min")]))
        return g.rename_columns(["norm_mention", "n_mentions", "rep_id"])

    norms = (prepared_ds
             .select_columns(["norm_mention", "mention_id"])
             .map_batches(_partial, batch_format="pyarrow")
             .groupby("norm_mention")
             .aggregate(Sum("n_mentions", alias_name="n_mentions"),
                        Min("rep_id", alias_name="rep_id")))
    return norms.map_batches(lambda b: _explode_norms(b, cfg),
                             batch_format="pyarrow")


def hot_block_keys(norm_blocks_ds, cfg: PipelineConfig,
                   max_keys: int = 4_000_000) -> set[int]:
    """Block keys whose total MENTION weight exceeds the cap.

    Weight = sum of n_mentions over the block's member norms — identical
    to the mention-level block size, so the hot set matches the labels
    fixture's discipline exactly. Small driver-side set, broadcast to the
    pair stage.

    The driver collect is BOUNDED: the hot set is structurally rare (at
    most total_weight / max_block_size keys), but a pathological corpus
    could make it data-sized, so past ``max_keys`` only the hottest keys
    are excluded (sort desc + limit — distributed, never an unbounded
    take_all) and a warning notes the truncation; the remaining warm keys
    stay subject to the pair stage's per-block cap^2 bound.

    Fast path (same discipline as the pair stage's
    ``norm_pairs_driver_max_rows``): the blocking table is vocabulary-
    sized, and a hash-shuffle SUM-groupby over it costs a full wave of
    aggregator-actor spawns — ~20 s of NON-SCALING wall at the 8M-turn
    tier, identical at 8 and 32 CPUs. Under
    ``cfg.hot_keys_driver_max_rows`` the two slim int64 columns are
    gathered zero-copy to the driver and reduced with one
    ``np.unique``/``bincount`` pass (~1 s at 8M rows, bounded memory);
    past the cap the distributed groupby remains the scale path.
    """
    import ray
    from ray.data.aggregate import Sum

    slim = norm_blocks_ds.select_columns(["block_key", "n_mentions"])
    n_rows = norm_blocks_ds.count()          # free: stage is persisted
    if n_rows <= cfg.hot_keys_driver_max_rows:
        # empty blocks carry a schemaless 0-column table; drop them or
        # concat_tables raises "Schema at index N was different"
        blocks = [b for b in ray.get(slim.to_arrow_refs())
                  if b.num_columns > 0 and b.num_rows > 0]
        if not blocks:
            return set()
        t = pa.concat_tables(blocks)
        keys = t["block_key"].combine_chunks().to_numpy(
            zero_copy_only=False)
        w = t["n_mentions"].combine_chunks().to_numpy(zero_copy_only=False)
        uk, inv = np.unique(keys, return_inverse=True)
        sums = np.bincount(inv, weights=w)   # float64: exact below 2^53
        hot_mask = sums > cfg.max_block_size
        if int(hot_mask.sum()) > max_keys:
            import warnings

            warnings.warn(
                f"hot_block_keys: >{max_keys} hot keys; excluding only "
                f"the hottest {max_keys} (driver-memory bound)")
            order = np.argsort(-sums[hot_mask])[:max_keys]
            return set(uk[hot_mask][order].tolist())
        return set(uk[hot_mask].tolist())

    totals = (slim
              .groupby("block_key")
              .aggregate(Sum("n_mentions", alias_name="n")))
    hot = totals.filter(expr=f"n > {cfg.max_block_size}").materialize()
    if hot.count() > max_keys:
        import warnings

        warnings.warn(
            f"hot_block_keys: >{max_keys} hot keys; excluding only the "
            f"hottest {max_keys} (driver-memory bound)")
        hot = hot.sort("n", descending=True).limit(max_keys)
    return {r["block_key"] for r in hot.take_all()}


# mention-level explosion retained for direct inspection / er_blocking query
def block_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    row_idx, keys, band_idx, mixed = block_keys_with_bands(
        batch["norm_mention"], cfg.shingle_k, cfg.num_perm, cfg.band_rows,
        cfg.seed)
    take = pa.array(row_idx, pa.int64())
    return pa.table({
        "mention_id": batch["mention_id"].take(take),
        "norm_mention": batch["norm_mention"].take(take),
        "block_key": keys,
    })


def block(prepared_ds, cfg: PipelineConfig):
    """Mention-level (mention_id, norm_mention, block_key) explosion."""
    return prepared_ds.map_batches(lambda b: block_batch(b, cfg),
                                   batch_format="pyarrow")


def sorted_neighborhood_pairs(ds, id_col: str, key_col: str,
                              window: int = 4, chunk: int = 4096):
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995; Christen
    2012 ch. 4.5): order records by a blocking key, slide a window of
    size ``window`` down the sorted list, emit every pair whose rank
    distance is < ``window``. The classic ER alternative to key-equality
    blocking — catches near-boundary records that share a sort
    neighborhood but no exact key.

    Distributed shape (no global materialization):

    1. the key's first 7 ASCII chars pack base-128 into an int < 2^49
       (order-preserving, float64-exact), so the EXACT distributed
       order statistics of ``analytics.global_rank`` apply unchanged —
       rank == ``row_number() OVER (ORDER BY key, id)``;
    2. ranks are consecutive integers, so the window condition is
       purely positional: rows land in chunk ``rank // chunk`` and the
       first ``window-1`` ranks of each chunk are REPLICATED into the
       previous chunk as ghost rows (join-side only);
    3. ONE hash shuffle on chunk id; per chunk a vectorized shifted-zip
       emits (id_a, id_b, dist) for d = 1..window-1 with the smaller
       rank's row required non-ghost — every qualifying pair exactly
       once, no cross-chunk dedup needed.

    Keys must be ASCII (the caller normalizes — e.g. strip to
    [a-z0-9]); out-of-contract non-ASCII keys pack their first 7 raw
    utf8 bytes with the high bit MASKED (a deterministic total order,
    but not the byte order a collation would give). Partitioning
    assumption: one chunk (≤ chunk + window - 1 rows) fits a worker."""
    import pandas as pd
    import pyarrow.compute as pc

    from wned_ray.pipelines.analytics import global_rank

    if window < 2:
        raise ValueError("window must be >= 2")
    if chunk < window:
        raise ValueError("chunk must be >= window")

    weights = (128 ** np.arange(6, -1, -1)).astype(np.int64)

    def add_knum(batch: pa.Table) -> pa.Table:
        # Arrow-native key packing (round-4 VERDICT minor #6: the old
        # pandas .str chain built a Python bytes object per row): the
        # first 7 utf8 BYTES come straight off the string array's value
        # buffer via offset arithmetic; the high bit is masked so the
        # base-128 packing stays exact (in-contract keys are ASCII —
        # see docstring — where byte == codepoint and the mask is a
        # no-op).
        arr = pc.fill_null(batch[key_col].cast(pa.string()),
                           "").combine_chunks()
        n = len(arr)
        off = np.frombuffer(arr.buffers()[1], np.int32)[
            arr.offset: arr.offset + n + 1].astype(np.int64)
        val = arr.buffers()[2]
        buf = (np.frombuffer(val, np.uint8) if val is not None
               else np.zeros(0, np.uint8))
        lens = np.minimum(np.diff(off), 7)
        mat = np.zeros((n, 7), np.int64)
        ir = np.repeat(np.arange(n), lens)
        within = (np.arange(int(lens.sum()))
                  - np.repeat(np.cumsum(lens) - lens, lens))
        mat[ir, within] = buf[np.repeat(off[:-1], lens) + within] & 0x7F
        return pa.table({
            id_col: batch[id_col],
            "_knum": pa.array((mat @ weights).astype(np.float64)),
        })

    keyed = ds.map_batches(add_knum, batch_format="pyarrow")
    ranked = global_rank(keyed, "_knum", id_col, out_col="_rnk")

    def assign(batch: pa.Table) -> pa.Table:
        r0 = batch["_rnk"].to_numpy(zero_copy_only=False) - 1
        ids = batch[id_col].combine_chunks()
        g = r0 // chunk
        m = ((r0 % chunk) < window - 1) & (g > 0)
        ghost_idx = np.nonzero(m)[0]
        take = pa.array(np.concatenate([np.arange(len(r0)), ghost_idx]))
        return pa.table({
            id_col: ids.take(take),
            "_r": pa.array(np.concatenate([r0, r0[ghost_idx]])),
            "_g": pa.array(np.concatenate([g, g[ghost_idx] - 1])),
            "_ghost": pa.array(np.concatenate(
                [np.zeros(len(r0), bool), np.ones(len(ghost_idx), bool)])),
        })

    def emit(gdf: pd.DataFrame) -> pd.DataFrame:
        gdf = gdf.sort_values("_r", kind="stable")
        ids = gdf[id_col].to_numpy()
        ghost = gdf["_ghost"].to_numpy()
        n = len(gdf)
        parts = []
        for d in range(1, window):
            if n <= d:
                break
            keep = ~ghost[: n - d]
            parts.append(pd.DataFrame({
                "id_a": ids[: n - d][keep],
                "id_b": ids[d:][keep],
                "dist": np.full(int(keep.sum()), d, np.int64),
            }))
        if not parts:
            return pd.DataFrame({
                "id_a": pd.Series([], dtype=gdf[id_col].dtype),
                "id_b": pd.Series([], dtype=gdf[id_col].dtype),
                "dist": pd.Series([], dtype=np.int64)})
        return pd.concat(parts, ignore_index=True)

    return (ranked.map_batches(assign, batch_format="pyarrow")
            .groupby("_g").map_groups(emit, batch_format="pandas"))


def meta_blocking(ds, id_col: str = "doc_id", text_col: str = "text",
                  scheme: str = "wnp", max_block: int = 32,
                  key_mode: str = "words"):
    """Meta-blocking: re-weight and prune a token-blocking graph so the
    surviving candidate pairs carry most of the recall at a fraction of
    the comparisons (Papadakis et al., "Meta-Blocking: Taking Entity
    Resolution to the Next Level", TKDE 2014; the (avg_a + avg_b)/2
    node-centric threshold follows BLAST, Simonini et al., VLDB 2016).

    Blocking keys are word BIGRAMS (adjacent lowercased token pairs) —
    the composite-key variant of token blocking: single tokens over a
    narrow vocabulary put every entity in every block, while bigrams
    grade block sizes smoothly (and at web scale keep hot blocks rare).

    Stages, all streaming:
      1. distinct (entity, bigram) pairs — vectorized adjacent-token
         join (pc.binary_join_element_wise over the flattened token
         stream), per-batch distinct combiner, one groupby
      2. block purging: bigrams blocking > ``max_block`` entities (or
         < 2) are dropped — the classic stop-block guard that keeps the
         self-join product bounded at web scale
      3. pair generation: one native self-join on the token + a pair
         groupby; edge weight = CBS (count of common blocks)
      4. pruning:
         - ``wep``  (weighted edge pruning): keep w >= GLOBAL mean
           weight (one scalar exchange)
         - ``wnp``  (weighted node pruning): keep w >= (mean_a +
           mean_b) / 2 of the two endpoint neighborhoods — per-node
           means via one explode + groupby, joined back distributed

    Output: (id_a, id_b, w) surviving candidate edges. Weights are
    ints and thresholds exact ratios of int sums, so the SQL twin is
    bit-reproducible."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count, Mean

    from wned_ray.util import safe_partitions

    def toks_chars(batch: pa.Table) -> pa.Table:
        # q-gram (char trigram) blocks — the short-string variant: word
        # bigrams barely exist on 1-3-token name surfaces, char q-grams
        # are the standard blocking key there (Christen ch. 4 q-grams);
        # trigrams keep the gram space selective enough that block
        # purging doesn't flatten the graph
        rows, hs = _char_bigram_sets(batch[text_col].to_pylist(), q=3)
        t = pa.table({
            id_col: batch[id_col].take(pa.array(rows)),
            "term": pa.array(hs),
        })
        return t.group_by([id_col, "term"]).aggregate([])

    def toks(batch: pa.Table) -> pa.Table:
        if key_mode == "chars":
            return toks_chars(batch)
        lists = pc.split_pattern(pc.utf8_lower(batch[text_col]),
                                 pattern=" ")
        flat = pc.list_flatten(lists).combine_chunks()
        par = pc.list_parent_indices(lists).to_numpy(
            zero_copy_only=False)
        n = len(flat)
        if n < 2:
            return pa.table({id_col: batch[id_col].slice(0, 0),
                             "term": pa.array([], pa.string())})
        a, b = flat.slice(0, n - 1), flat.slice(1, n - 1)
        gram = pc.binary_join_element_wise(a, b, "_")
        same_doc = par[1:] == par[:-1]
        nonempty = (pc.not_equal(a, "").to_numpy(zero_copy_only=False)
                    & pc.not_equal(b, "").to_numpy(zero_copy_only=False))
        m = pa.array(same_doc & nonempty)
        t = pa.table({
            id_col: batch[id_col].take(pa.array(par[:-1])).filter(m),
            "term": gram.filter(m),
        })
        return t.group_by([id_col, "term"]).aggregate([])

    ent_term = (ds.select_columns([id_col, text_col])
                .map_batches(toks, batch_format="pyarrow")
                .groupby([id_col, "term"])
                .aggregate(Count(alias_name="_c"))
                .select_columns([id_col, "term"])
                .materialize())

    sizes = (ent_term.groupby("term")
             .aggregate(Count(alias_name="_bs")))

    def keep_sizes(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b["_bs"], 2),
                    pc.less_equal(b["_bs"], int(max_block)))
        # schema-preserving projection: a filter+select chain can emit
        # schema-less empty blocks that break the downstream acero join
        return pa.table({"term": b["term"].filter(m)})

    # rows hint collapses tiny inputs to fewer partitions: a hash
    # partition that receives zero rows of one side is schema-less and
    # the per-partition Arrow join fails (see safe_partitions)
    n_et = ent_term.count()
    kept_terms = sizes.map_batches(keep_sizes, batch_format="pyarrow")
    pruned = ent_term.join(kept_terms, join_type="inner",
                           num_partitions=safe_partitions(16, rows=n_et),
                           on=("term",))

    def _ren(new):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({"term": b["term"], new: b[id_col]})
        return f

    left = pruned.map_batches(_ren("id_a"), batch_format="pyarrow")
    right = pruned.map_batches(_ren("id_b"), batch_format="pyarrow")
    edges = (left.join(right, join_type="inner",
                       num_partitions=safe_partitions(16, rows=n_et),
                       on=("term",))
             .filter(expr="id_a < id_b")
             .groupby(["id_a", "id_b"])
             .aggregate(Count(alias_name="w"))
             .materialize())

    if scheme == "wep":
        thr = edges.mean("w")

        def keep_wep(b: pa.Table) -> pa.Table:
            return b.filter(pc.greater_equal(
                pc.cast(b["w"], pa.float64()), thr))

        return edges.map_batches(keep_wep, batch_format="pyarrow")

    if scheme != "wnp":
        raise ValueError(f"unknown meta-blocking scheme: {scheme!r}")

    # per-node mean edge weight: explode each edge to both endpoints
    def ends(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([
                b["id_a"].combine_chunks(),
                b["id_b"].combine_chunks()]),
            "w": pa.concat_arrays([b["w"].combine_chunks()] * 2),
        })

    node_avg = (edges.map_batches(ends, batch_format="pyarrow")
                .groupby("node")
                .aggregate(Mean("w", alias_name="avg_w")))

    def _ren2(col, new):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({col: b["node"], new: b["avg_w"]})
        return f

    av_a = node_avg.map_batches(_ren2("id_a", "_ava"),
                                batch_format="pyarrow")
    av_b = node_avg.map_batches(_ren2("id_b", "_avb"),
                                batch_format="pyarrow")
    n_edges = edges.count()
    joined = (edges.join(av_a, join_type="inner",
                         num_partitions=safe_partitions(16, rows=n_edges),
                         on=("id_a",))
              .join(av_b, join_type="inner",
                    num_partitions=safe_partitions(16, rows=n_edges),
                    on=("id_b",)))

    def keep_wnp(b: pa.Table) -> pa.Table:
        w = b["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        thr = (b["_ava"].to_numpy(zero_copy_only=False) +
               b["_avb"].to_numpy(zero_copy_only=False)) / 2.0
        m = w >= thr
        return pa.table({"id_a": b["id_a"], "id_b": b["id_b"],
                         "w": b["w"]}).filter(pa.array(m))

    return joined.map_batches(keep_wnp, batch_format="pyarrow")


def _char_bigram_sets(texts, q: int = 2) -> tuple[np.ndarray, np.ndarray]:
    """(row_idx, qgram_hash) distinct pairs over lowercased character
    q-grams — the cheap-distance representation for canopies and the
    q-gram blocking key. Strings shorter than ``q`` contribute one
    truncated gram."""
    import pandas as pd

    import zlib

    s = pd.Series(texts).astype(str).str.lower()
    rows, hashes = [], []
    for i, t in enumerate(s):
        grams = {t[j:j + q] for j in range(max(len(t) - q + 1, 1))}
        rows.extend([i] * len(grams))
        # crc32, NOT builtin hash(): str hashing is salted per process,
        # and these keys must agree between driver-built center sets
        # and worker-side assignment batches
        hashes.extend(zlib.crc32(g.encode()) for g in grams)
    return (np.asarray(rows, np.int64),
            np.asarray(hashes, np.int64))


def canopy_pairs(ds, id_col: str, text_col: str,
                 t_loose: float = 0.25, t_tight: float = 0.55,
                 sample: int = 4096, max_centers: int = 512,
                 max_block: int = 2048):
    """Canopy clustering blocking (McCallum, Nigam & Ungar, KDD 2000):
    cheap-distance canopies — char-bigram Jaccard here — group records
    for the expensive pairwise stage; records inside the TIGHT radius
    of a center can't found new canopies, records inside the LOOSE
    radius join the canopy (canopies overlap by design, which is what
    preserves recall vs disjoint blocking keys).

    Distributed adaptation of the inherently sequential center pick:
    centers are selected greedily on a DETERMINISTIC bounded sample
    (limit(sample) collect, ordered by id — the documented driver
    bound), then broadcast; assignment is one stateless map_batches
    over the full input (vectorized membership per center). Canopies
    emit min-id star edges (the connectivity contract every blocking
    tier here shares). Output: (id_a, id_b), id_a < id_b."""
    import pandas as pd
    import ray

    # ---- greedy center selection on the bounded sample (driver) ----
    smp = ds.select_columns([id_col, text_col]).limit(sample).take_all()
    smp.sort(key=lambda r: r[id_col])
    ids = [r[id_col] for r in smp]
    rows, hs = _char_bigram_sets([r[text_col] for r in smp])
    sets = [np.sort(hs[rows == i]) for i in range(len(ids))]
    covered = np.zeros(len(ids), bool)
    centers = []
    for i in range(len(ids)):
        if covered[i] or len(centers) >= max_centers:
            continue
        centers.append((ids[i], sets[i]))
        ci = sets[i]
        for j in range(i + 1, len(ids)):
            if covered[j]:
                continue
            inter = np.intersect1d(ci, sets[j],
                                   assume_unique=True).size
            union = ci.size + sets[j].size - inter
            if union and inter / union >= t_tight:
                covered[j] = True
    c_ref = ray.put(centers)

    def assign(batch: pa.Table) -> pa.Table:
        cs = ray.get(c_ref)
        texts = batch[text_col].to_pylist()
        rids = batch[id_col].to_pylist()
        rows_, hs_ = _char_bigram_sets(texts)
        n = len(texts)
        sizes = np.bincount(rows_, minlength=n)
        out_c, out_i = [], []
        for cid, cset in cs:
            member = np.isin(hs_, cset, assume_unique=False)
            inter = np.bincount(rows_[member], minlength=n)
            union = sizes + cset.size - inter
            sim = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
            hit = np.flatnonzero(sim >= t_loose)
            out_c.extend([cid] * len(hit))
            out_i.extend(rids[h] for h in hit)
        t = batch[id_col].type
        return pa.table({"_canopy": pa.array(out_c, type=t),
                         id_col: pa.array(out_i, type=t)})

    assigned = ds.select_columns([id_col, text_col]).map_batches(
        assign, batch_format="pyarrow")

    def star(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2 or len(g) > max_block:
            return pd.DataFrame({"id_a": pd.Series([], dtype=g[id_col].dtype),
                                 "id_b": pd.Series([], dtype=g[id_col].dtype)})
        vals = np.sort(g[id_col].to_numpy())
        return pd.DataFrame({"id_a": np.repeat(vals[0], len(vals) - 1),
                             "id_b": vals[1:]})

    pairs = assigned.groupby("_canopy").map_groups(
        star, batch_format="pandas")
    # canopies overlap -> the same edge can appear in several canopies
    from ray.data.aggregate import Count

    return (pairs.groupby(["id_a", "id_b"])
            .aggregate(Count(alias_name="_c"))
            .select_columns(["id_a", "id_b"]))
