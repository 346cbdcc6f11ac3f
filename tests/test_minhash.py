"""MinHash / LSH blocking kernels: determinism, jaccard fidelity."""

import numpy as np

from wned_ray.functions.minhash import (
    band_keys, block_keys_for, jaccard_from_signatures, minhash_signatures,
    shingle_gram_hashes)


def test_shingles_deterministic_and_boundary_safe():
    texts = ["university of alberta", "university of alberta", "ab", ""]
    g1, o1 = shingle_gram_hashes(texts, 4)
    g2, o2 = shingle_gram_hashes(texts, 4)
    assert np.array_equal(g1, g2) and np.array_equal(o1, o2)
    # identical strings -> identical gram multisets
    assert np.array_equal(g1[o1[0]:o1[1]], g1[o1[1]:o1[2]])
    # short string and empty string produce exactly one gram each
    assert o1[3] - o1[2] == 1 and o1[4] - o1[3] == 1
    # grams never cross string boundaries: "taab" would be a cross gram;
    # check no gram of texts[0] equals any gram of a string that only
    # appears concatenated
    ga, _ = shingle_gram_hashes(["abcdefgh"], 4)
    gb, _ = shingle_gram_hashes(["abcd", "efgh"], 4)
    assert set(gb.tolist()) <= set(ga.tolist())
    assert len(set(gb.tolist())) == 2  # only the two within-string grams


def test_minhash_jaccard_estimate():
    rng = np.random.default_rng(3)
    base = "the quick brown fox jumps over the lazy dog " * 3
    variant = base.replace("quick", "quikc").replace("lazy", "hazy")
    other = "completely different text about ray data pipelines and arrow"
    texts = [base, variant, other]
    grams, offsets = shingle_gram_hashes(texts, 4)
    sig = minhash_signatures(grams, offsets, 128, seed=42)
    j_same = jaccard_from_signatures(sig[0:1], sig[1:2])[0]
    j_diff = jaccard_from_signatures(sig[0:1], sig[2:3])[0]
    assert j_same > 0.5
    assert j_diff < 0.2


def test_band_keys_collide_for_similar():
    texts = ["varnel cortiva", "varnel cortiva", "varnel cortvia", "zzz yyy xxx"]
    row_idx, keys = block_keys_for(texts, k=4, num_perm=64, band_rows=4, seed=42)
    keys = keys.to_pylist()
    n_bands = 16
    k0 = set(keys[0:n_bands])
    k1 = set(keys[n_bands:2 * n_bands])
    k2 = set(keys[2 * n_bands:3 * n_bands])
    k3 = set(keys[3 * n_bands:4 * n_bands])
    assert k0 == k1                       # identical strings share all bands
    assert k0 & k2                        # typo variant shares >=1 band
    assert not (k0 & k3)                  # unrelated shares none


def test_band_keys_shape():
    sig = np.arange(2 * 64, dtype=np.uint64).reshape(2, 64)
    bk = band_keys(sig, 4)
    assert bk.shape == (2, 16)
    assert not np.array_equal(bk[0], bk[1])


def test_block_keys_are_nonnegative_int64():
    """Ray Data's hash-shuffle aggregates cannot round-trip uint64 values
    >= 2^63 (they come back as mixed int64 / pickled-extension schemas and
    segfault Arrow's HashShuffleAggregator — the round-1 ER crash). Block
    keys must therefore be non-negative int64, always."""
    import pyarrow as pa

    from wned_ray.functions.minhash import block_keys_with_bands, mix_band

    texts = [f"surface form number {i}" for i in range(200)]
    _, keys = block_keys_for(texts, k=4, num_perm=64, band_rows=4, seed=7)
    assert keys.type == pa.int64()
    vals = keys.to_numpy(zero_copy_only=False)
    assert (vals >= 0).all()

    _, keys2, _, mixed = block_keys_with_bands(texts, 4, 64, 4, seed=7)
    assert keys2.type == pa.int64()
    assert mixed.dtype == np.int64 and (mixed >= 0).all()

    # mix_band masks the top bit even when the raw mix sets it
    hi = mix_band(np.arange(16, dtype=np.uint64),
                  np.full(16, 0xFFFF_FFFF_FFFF_FFFF, np.uint64))
    assert hi.dtype == np.int64 and (hi >= 0).all()


def test_high_bit_int64_keys_groupby_roundtrip(ray_session):
    """Regression for the round-1 segfault: keys with the 63rd bit set
    must survive a Ray hash-shuffle groupby/aggregate with schema intact."""
    import pyarrow as pa
    import ray
    from ray.data.aggregate import Min, Sum

    keys = np.array([(1 << 62) + 13, (1 << 62) + 13, (1 << 61) - 1, 5, 5, 5],
                    np.int64)
    t = pa.table({"block_key": pa.array(keys, pa.int64()),
                  "n": pa.array([1] * 6, pa.int64())})
    ds = ray.data.from_arrow(t).repartition(3)
    out = (ds.groupby("block_key")
             .aggregate(Sum("n", alias_name="n"), Min("n", alias_name="m"))
             .take_all())
    got = {r["block_key"]: r["n"] for r in out}
    assert got == {(1 << 62) + 13: 2, (1 << 61) - 1: 1, 5: 3}
    for r in out:
        assert isinstance(r["block_key"], int)


def test_whole_string_hashes_arrow_matches_list():
    import pyarrow as pa

    from wned_ray.functions.minhash import whole_string_hashes

    texts = ["", "a", "ab", "varquo sotanor", "x" * 500, "varquo sotanor"]
    h_list = whole_string_hashes(texts)
    h_arrow = whole_string_hashes(pa.array(texts, pa.string()))
    h_chunked = whole_string_hashes(pa.chunked_array(
        [pa.array(texts[:3]), pa.array(texts[3:])]))
    assert (h_list == h_arrow).all()
    assert (h_list == h_chunked).all()
    # equal strings hash equal; distinct strings distinct
    assert h_list[3] == h_list[5]
    assert len({int(x) for x in h_list[:5]}) == 5
    # order-aware (not a bag hash)
    a, b = whole_string_hashes(["ab", "ba"])
    assert a != b


def test_whole_string_hashes_sliced_and_null_arrays():
    import pyarrow as pa

    from wned_ray.functions.minhash import whole_string_hashes

    arr = pa.array(["aa", "bb", "cc", "dd"])
    full = whole_string_hashes(arr)
    sliced = whole_string_hashes(arr.slice(1, 2))
    assert (sliced == full[1:3]).all()
    withnull = whole_string_hashes(pa.array(["aa", None, "cc"]))
    empty = whole_string_hashes([""])[0]
    assert withnull[1] == empty                  # nulls hash as ""


def test_shingle_gram_hashes_arrow_entry_matches_list():
    import pyarrow as pa

    from wned_ray.functions.minhash import shingle_gram_hashes

    texts = ["abcdefgh", "ab", "", "abcdefgh xyz", "q" * 3]
    g1, o1 = shingle_gram_hashes(texts, 4)
    g2, o2 = shingle_gram_hashes(pa.array(texts), 4)
    assert (o1 == o2).all() and (g1 == g2).all()


def test_word_ngram_hashes_equal_iff_same_gram():
    """Equal token windows hash equal; order matters; short rows emit 0."""
    import numpy as np

    from wned_ray.functions.minhash import (whole_string_hashes,
                                            word_ngram_hashes)

    rows = [["a", "b", "c", "d"],          # grams: abc, bcd
            ["b", "c", "d"],               # gram: bcd
            ["c", "b", "a"],               # gram: cba (order differs)
            ["a", "b"],                    # too short: none
            []]                            # empty: none
    flat = [t for r in rows for t in r]
    th = whole_string_hashes(flat)
    off = np.cumsum([0] + [len(r) for r in rows]).astype(np.int64)
    g, go = word_ngram_hashes(th, off, 3)
    assert go.tolist() == [0, 2, 3, 4, 4, 4]
    assert g[1] == g[2]                    # bcd == bcd
    assert g[0] != g[1] and g[3] != g[0]   # abc != bcd, cba != abc
    assert len(set(g.tolist())) == 3
