"""Fuzzy-tier 3-reranker top-n UNION (AliasLuceneIndex.queryAlias:270-283):
a candidate kept by exactly ONE kernel's top-n must survive, and the
driver fast path must equal the distributed join path."""

import numpy as np
import pandas as pd
import pytest

from wned_ray.config import PipelineConfig
from wned_ray.stages.pairs import (_fuzzy_union_local, _topn_union_keep,
                                   norm_pairs)

Q = "kellerman"
# kernel top-2 sets diverge on purpose (verified values):
#   bigram-Dice / trigram top-2: kellerma, kman keller
#   Jaro-Winkler top-2:          kellerma, kelxerman
CANDS = ["kellerma", "kman keller", "ke ll er man", "kelxerman",
         "nacermelle"]


def test_union_keeps_single_kernel_survivors():
    keep = _topn_union_keep(Q, CANDS, n=2)
    kept = set(np.asarray(CANDS, object)[keep])
    assert "kman keller" in kept        # kept ONLY by the n-gram kernels
    assert "kelxerman" in kept          # kept ONLY by Jaro-Winkler
    assert "kellerma" in kept           # consensus winner
    assert kept == {"kellerma", "kman keller", "kelxerman"}


def test_union_local_pair_frame_either_side():
    """The filter is an OR of sides (each surface retains its own top-n,
    reference semantics): a pair the query side DROPS still survives when
    the candidate side — here with only one pairing, so its top-n is
    trivially everything — keeps it. Pruning therefore only bites inside
    blocks where both surfaces see competition (the all-pairs e2e below);
    a star-shaped pair set is never over-pruned."""
    fuzzy = pd.DataFrame({
        "norm_a": [min(Q, c) for c in CANDS],
        "norm_b": [max(Q, c) for c in CANDS],
        "rep_a": ["r"] * len(CANDS), "rep_b": ["r"] * len(CANDS),
        "block_key": [1] * len(CANDS),
    })
    out = _fuzzy_union_local(fuzzy, top_n=2)
    assert len(out) == len(fuzzy)

    # all-pairs universe: both sides see the full block, pruning engages
    univ = sorted([Q] + CANDS)
    ap = pd.DataFrame(
        [(a, b) for i, a in enumerate(univ) for b in univ[i + 1:]],
        columns=["norm_a", "norm_b"])
    kept = _fuzzy_union_local(ap, top_n=1)
    pairs = {tuple(sorted(p)) for p in zip(kept["norm_a"], kept["norm_b"])}
    assert len(pairs) < len(ap)
    assert tuple(sorted((Q, "kellerma"))) in pairs   # consensus top-1


@pytest.mark.parametrize("driver_path", [True, False])
def test_norm_pairs_with_union_local_equals_distributed(
        ray_session, driver_path):
    from dataclasses import replace

    import pyarrow as pa
    import ray.data as rd

    norms = [Q] + CANDS
    tbl = pa.table({
        "norm_mention": pa.array(norms, pa.string()),
        "n_mentions": pa.array([2] * len(norms), pa.int64()),
        "rep_id": pa.array([f"m{i}" for i in range(len(norms))],
                           pa.string()),
        "block_key": pa.array([7] * len(norms), pa.int64()),
    })
    cfg = replace(PipelineConfig(), fuzzy_rerank_top_n=2,
                  norm_pairs_driver_max_rows=(10_000 if driver_path else 0))
    out = (norm_pairs(rd.from_arrow(tbl), set(), cfg, num_partitions=2)
           .to_pandas())
    fuzzy = out[out["norm_a"] != out["norm_b"]]
    pairs = {tuple(sorted(p))
             for p in zip(fuzzy["norm_a"], fuzzy["norm_b"])}
    # exact tier untouched: every multi-mention norm self-pairs
    assert (out["norm_a"] == out["norm_b"]).sum() == len(norms)
    # the union filter pruned the all-pairs block
    assert tuple(sorted((Q, "kelxerman"))) in pairs
    assert tuple(sorted((Q, "kman keller"))) in pairs
    assert len(pairs) < len(norms) * (len(norms) - 1) // 2
    if driver_path:
        global _DRIVER_PAIRS
        _DRIVER_PAIRS = pairs
    else:
        assert pairs == _DRIVER_PAIRS   # local == distributed
