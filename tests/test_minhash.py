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
