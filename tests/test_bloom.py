"""Bloom filter kernel + bloom-pushdown semi-join."""

from __future__ import annotations

import numpy as np
import pandas as pd

from wned_ray.functions.bloom import BloomFilter


def test_bloom_no_false_negatives_and_bounded_fp():
    rng = np.random.default_rng(17)
    keys = rng.choice(np.arange(1_000_000, dtype=np.int64), 50_000,
                      replace=False)
    bf = BloomFilter.sized(len(keys), fp_rate=0.01)
    bf.add(keys)
    assert bf.contains(keys).all()                  # no false negatives
    others = np.setdiff1d(
        rng.integers(2_000_000, 10_000_000, 100_000).astype(np.int64), keys)
    fp = bf.contains(others).mean()
    assert fp < 0.03, fp                            # ~1% target, slack 3x
    # empty probe
    assert bf.contains(np.array([], np.int64)).shape == (0,)


def test_bloom_partial_or_merge_equals_single_build():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 1 << 60, 10_000).astype(np.int64)
    whole = BloomFilter(1 << 17, 5)
    whole.add(keys)
    merged = BloomFilter(1 << 17, 5)
    for chunk in np.array_split(keys, 7):
        part = BloomFilter(1 << 17, 5)
        part.add(chunk)
        merged.words |= part.words
    assert (merged.words == whole.words).all()


def test_bloom_bit_positions_scatter_equals_add():
    # the distributed build's partial representation: set-bit positions
    # (bounded by rows x hashes) scattered on the driver must reproduce
    # the filter built by add() exactly
    rng = np.random.default_rng(4)
    keys = rng.integers(0, 1 << 60, 5_000).astype(np.int64)
    whole = BloomFilter(1 << 16, 5)
    whole.add(keys)
    scattered = BloomFilter(1 << 16, 5)
    for chunk in np.array_split(keys, 9):
        pos = scattered.bit_positions(chunk)
        assert len(pos) <= len(chunk) * 5      # bounded, never n_bits/8
        scattered.set_bits(pos)
    assert (scattered.words == whole.words).all()


def test_bloom_semi_join_exact(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.datawork import bloom_semi_join

    rng = np.random.default_rng(9)
    big = pd.DataFrame({
        "o_key": np.arange(20_000, dtype=np.int64),
        "o_cust": rng.integers(0, 5000, 20_000),
    })
    keys = pd.DataFrame({"c_cust": rng.choice(np.arange(5000), 400,
                                              replace=False)})
    keys = pd.concat([keys, keys.head(50)])          # dup keys: no row dup
    out = (bloom_semi_join(rd.from_pandas(big), rd.from_pandas(keys),
                           on="o_cust", key_col="c_cust", num_partitions=4)
           .to_pandas().sort_values("o_key").reset_index(drop=True))
    want = (big[big["o_cust"].isin(set(keys["c_cust"]))]
            .sort_values("o_key").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out[["o_key", "o_cust"]].astype("int64"),
        want[["o_key", "o_cust"]].astype("int64"))
