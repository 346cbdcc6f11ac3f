"""Candidate-pair generation — the first shuffle (Stage 3, SURVEY §7).

Two tiers over the distinct-norm blocking table (stages/blocking.py):

1. **Fuzzy tier** (J2): hash-partitioned self-join of the distinct-norm
   blocking rows on ``block_key`` (``Dataset.join`` — vectorized Arrow
   build/probe, no per-group Python), then one vectorized filter applying
   the canonical ``norm_a < norm_b`` ordering (the mirror-duplicate kill
   of ``…/graph/extraction/WikiGraphExtractor.java:71-72``) and the
   **first-collision-band rule**: a norm pair is kept only in the FIRST
   band whose block key both norms share and that is not hot. Each row
   carries its norm's full mixed-band-key vector (uint64 columns), so the
   first shared band is a numpy equality matrix per joined row — exact
   cross-band dedup (G7) with zero extra shuffle.
2. **Exact tier** (J1): norms that survive the hot filter pair with
   themselves; the mention expansion below turns that into within-group
   all-pairs (mentions sharing a normalized surface form).

Matched norm pairs then EXPAND to mention pairs via two thin hash joins
against the mention table (``mention_id, norm_mention, ctx``), followed
by a vectorized canonicalization (``id_a < id_b``, payload swapped
accordingly). Pair multiplicity is 1 by construction — the expensive
``groupby(id_a,id_b)`` dedup of the naive design (110s of a 125s t2 run)
is gone, and the heavy join runs over |distinct surfaces|, not
|mentions| (scale shape: 10^12 turns but ~10^8 distinct surfaces).

Skew (north_rule "skew handled explicitly"): hot keys — any block whose
total mention weight exceeds ``cfg.max_block_size``, e.g. the
empty-mention hash — are excluded before the shuffle via the broadcast
hot set (a hot block would emit O(n^2) pairs into one join partition);
the same set feeds the first-collision rule, and the labels fixture
applies the identical discipline, keeping the labeled and generated pair
universes aligned. Residual per-block fan-out is bounded by cap^2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from wned_ray.config import PipelineConfig
from wned_ray.functions.minhash import mix_band


def _drop_hot(hot_keys: set[str]):
    hot_arr = pa.array(sorted(hot_keys))

    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.invert(pc.is_in(batch["block_key"], value_set=hot_arr)))

    return fn


def hot_mixed_keys(hot_keys: set[str]) -> np.ndarray:
    """Sorted uint64 array of mixed (band, hash) hot keys for vectorized
    searchsorted membership tests (strings are "band:hash")."""
    if not hot_keys:
        return np.zeros(0, np.uint64)
    bands = np.fromiter((int(k.split(":")[0]) for k in hot_keys), np.uint64,
                        len(hot_keys))
    hashes = np.fromiter((int(k.split(":")[1]) for k in hot_keys), np.uint64,
                         len(hot_keys))
    return np.sort(mix_band(bands, hashes))


def _band_matrix(batch: pa.Table, bands: int, suffix: str) -> np.ndarray:
    return np.column_stack([
        batch[f"mb{b}{suffix}"].to_numpy(zero_copy_only=False)
        for b in range(bands)])


def _norm_pair_filter(hot_sorted: np.ndarray, bands: int):
    def fn(batch: pa.Table) -> pa.Table:
        drop = (["band_idx"] + [f"mb{b}" for b in range(bands)]
                + [f"mb{b}_b" for b in range(bands)]
                + ["n_mentions", "n_mentions_b"])
        drop = [c for c in drop if c in batch.column_names]
        cols = ["norm_a", "norm_b", "block_key"]
        if batch.num_rows == 0:
            return batch.drop(drop).select(cols)
        order_ok = pc.less(batch["norm_a"], batch["norm_b"]).to_numpy(
            zero_copy_only=False)
        A = _band_matrix(batch, bands, "")
        B = _band_matrix(batch, bands, "_b")
        eq = A == B
        if len(hot_sorted):
            pos = np.searchsorted(hot_sorted, A)
            np.clip(pos, 0, len(hot_sorted) - 1, out=pos)
            eq &= ~(hot_sorted[pos] == A)
        has = eq.any(axis=1)
        first = eq.argmax(axis=1)
        band_idx = batch["band_idx"].to_numpy(zero_copy_only=False)
        keep = order_ok & has & (first == band_idx)
        return batch.drop(drop).filter(pa.array(keep)).select(cols)

    return fn


def norm_pairs(norm_blocks_ds, hot_keys: set[str], cfg: PipelineConfig,
               num_partitions: int = 16):
    """Distinct-norm blocking rows -> Dataset (norm_a, norm_b, block_key)
    of candidate DISTINCT-surface pairs, plus the exact tier's self pairs
    (norm_a == norm_b for every surviving norm with >= 2 mentions)."""
    if hot_keys:
        norm_blocks_ds = norm_blocks_ds.map_batches(
            _drop_hot(hot_keys), batch_format="pyarrow")
    norm_blocks_ds = norm_blocks_ds.materialize()

    left = norm_blocks_ds.rename_columns({"norm_mention": "norm_a"})
    bands = cfg.num_bands
    right = (norm_blocks_ds
             .drop_columns(["band_idx"])
             .rename_columns(dict(
                 {"norm_mention": "norm_b", "n_mentions": "n_mentions_b"},
                 **{f"mb{b}": f"mb{b}_b" for b in range(bands)})))
    joined = left.join(right, join_type="inner",
                       num_partitions=num_partitions, on=("block_key",))
    fuzzy = joined.map_batches(
        _norm_pair_filter(hot_mixed_keys(hot_keys), bands),
        batch_format="pyarrow")

    # exact tier: each surviving multi-mention norm pairs with itself once
    # (min non-hot block key as the deterministic representative)
    from ray.data.aggregate import Min

    exact_src = (norm_blocks_ds
                 .filter(expr="n_mentions > 1")
                 .groupby("norm_mention")
                 .aggregate(Min("block_key", alias_name="block_key")))

    def to_self(batch: pa.Table) -> pa.Table:
        return pa.table({
            "norm_a": batch["norm_mention"], "norm_b": batch["norm_mention"],
            "block_key": batch["block_key"],
        })

    exact = exact_src.map_batches(to_self, batch_format="pyarrow")
    return fuzzy.union(exact)


def expand_pairs(mentions_ds, norm_pairs_ds, cfg: PipelineConfig,
                 num_partitions: int = 16):
    """(norm_a, norm_b) pairs x mention table -> canonical mention pairs
    (id_a, id_b, norm_a, norm_b, ctx_a, ctx_b, block_key, *extras).

    Any additional columns on ``norm_pairs_ds`` (e.g. the norm-level
    feature columns from ``score_norm_pairs``) ride through the joins
    unchanged — they are functions of the unordered norm pair, so the
    id-canonicalizing swap below does not touch them."""
    extras = [c for c in norm_pairs_ds.schema().names
              if c not in ("norm_a", "norm_b", "block_key")]
    ma = mentions_ds.rename_columns({
        "mention_id": "id_a", "norm_mention": "norm_a", "ctx": "ctx_a"})
    mb = mentions_ds.rename_columns({
        "mention_id": "id_b", "norm_mention": "norm_b", "ctx": "ctx_b"})
    j1 = norm_pairs_ds.join(ma, join_type="inner",
                            num_partitions=num_partitions, on=("norm_a",))
    j2 = j1.join(mb, join_type="inner",
                 num_partitions=num_partitions, on=("norm_b",))

    def canonical(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        ida = batch["id_a"]
        idb = batch["id_b"]
        keep = pc.less(ida, idb)             # also kills self pairs (id==id)
        b = batch.filter(keep)
        # exact-tier expansion emits both orders of every within-norm pair;
        # id_a < id_b keeps exactly one. Fuzzy pairs (norm_a != norm_b) may
        # arrive with id_a > id_b — those must be SWAPPED, not dropped, so
        # emit the swapped complement of the dropped fuzzy rows too.
        rev = batch.filter(pc.and_(pc.greater(ida, idb),
                                   pc.not_equal(batch["norm_a"],
                                                batch["norm_b"])))
        swapped = pa.table(dict(
            {
                "id_a": rev["id_b"], "id_b": rev["id_a"],
                "norm_a": rev["norm_b"], "norm_b": rev["norm_a"],
                "ctx_a": rev["ctx_b"], "ctx_b": rev["ctx_a"],
                "block_key": rev["block_key"],
            },
            **{c: rev[c] for c in extras},
        ))
        cols = ["id_a", "id_b", "norm_a", "norm_b", "ctx_a", "ctx_b",
                "block_key"] + extras
        return pa.concat_tables([b.select(cols), swapped.select(cols)])

    return j2.map_batches(canonical, batch_format="pyarrow")


def gen_pairs(prepared_ds, norm_blocks_ds, hot_keys: set[str],
              cfg: PipelineConfig, num_partitions: int = 16,
              alias_ref=None, graph_ref=None):
    """prepared + norm blocking -> canonical, unique candidate mention
    pairs (the composition used by pipelines/link.py).

    With ``alias_ref``/``graph_ref`` given, the norm-level features
    (prior/sem_sim/name_sim/lev_sim) are scored on the DISTINCT norm
    pairs BEFORE expansion — |distinct surface pairs| actor work instead
    of |mention pairs| — and ride the expand joins as payload columns."""
    mentions = prepared_ds.select_columns(["mention_id", "norm_mention", "ctx"])
    np_ds = norm_pairs(norm_blocks_ds, hot_keys, cfg, num_partitions)
    if alias_ref is not None:
        from wned_ray.stages.scoring import score_norm_pairs

        np_ds = score_norm_pairs(np_ds, alias_ref, graph_ref, cfg)
    return expand_pairs(mentions, np_ds, cfg, num_partitions)
