"""Candidate-pair generation — the first shuffle (Stage 3, SURVEY §7).

Two tiers over the distinct-norm blocking table (stages/blocking.py):

1. **Fuzzy tier** (J2): hash-partitioned self-join of the slim
   distinct-norm blocking rows on ``block_key`` (``Dataset.join`` —
   vectorized Arrow build/probe, no per-group Python), a map-side filter
   applying the canonical ``norm_a < norm_b`` ordering (the
   mirror-duplicate kill of ``…/graph/extraction/WikiGraphExtractor.java:
   71-72``), then cross-band dedup (G7) as a ``groupby(norm_a,
   norm_b).min(block_key)``: a pair colliding in b bands collapses to one
   row with a deterministic representative key. The dedup shuffle is over
   COLLIDED PAIRS (tiny — band-collision count, not the m^2 join
   product), which is why the join payload needs no band vectors.
2. **Exact tier** (J1): norms that survive the hot filter pair with
   themselves; the mention expansion below turns that into within-group
   all-pairs (mentions sharing a normalized surface form).

Matched norm pairs then EXPAND to mention pairs via two thin hash joins
against the mention table (``mention_id, norm_mention, ctx``), followed
by a vectorized canonicalization (``id_a < id_b``, payload swapped
accordingly). The heavy join runs over |distinct surfaces|, not
|mentions| (scale shape: 10^12 turns but ~10^8 distinct surfaces).

Skew (north_rule "skew handled explicitly"): hot keys — any block whose
total mention weight exceeds ``cfg.max_block_size``, e.g. the
empty-mention hash — are excluded before the shuffle via the broadcast
hot set (a hot block would emit O(n^2) pairs into one join partition);
the labels fixture applies the identical discipline, keeping the labeled
and generated pair universes aligned. Residual per-block fan-out is
bounded by cap^2.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from wned_ray.config import PipelineConfig


def _drop_hot(hot_keys: set[str]):
    hot_arr = pa.array(sorted(hot_keys))

    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.invert(pc.is_in(batch["block_key"], value_set=hot_arr)))

    return fn


def norm_pairs(norm_blocks_ds, hot_keys: set[str], cfg: PipelineConfig,
               num_partitions: int = 16):
    """Distinct-norm blocking rows -> Dataset (norm_a, norm_b, block_key)
    of candidate DISTINCT-surface pairs, plus the exact tier's self pairs
    (norm_a == norm_b for every surviving norm with >= 2 mentions)."""
    from ray.data.aggregate import Min

    if hot_keys:
        norm_blocks_ds = norm_blocks_ds.map_batches(
            _drop_hot(hot_keys), batch_format="pyarrow")
    slim = norm_blocks_ds.select_columns(
        ["norm_mention", "n_mentions", "block_key"]).materialize()

    left = (slim.select_columns(["norm_mention", "block_key"])
            .rename_columns({"norm_mention": "norm_a"}))
    right = (slim.select_columns(["norm_mention", "block_key"])
             .rename_columns({"norm_mention": "norm_b"}))
    joined = left.join(right, join_type="inner",
                       num_partitions=num_partitions, on=("block_key",))

    def canon(batch: pa.Table) -> pa.Table:
        keep = pc.less(batch["norm_a"], batch["norm_b"])
        return batch.filter(keep).select(["norm_a", "norm_b", "block_key"])

    fuzzy = (joined.map_batches(canon, batch_format="pyarrow")
             .groupby(["norm_a", "norm_b"])
             .aggregate(Min("block_key", alias_name="block_key")))

    # exact tier: each surviving multi-mention norm pairs with itself once
    # (min non-hot block key as the deterministic representative)
    exact_src = (slim
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
