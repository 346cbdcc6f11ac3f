"""Batch string-sim kernels vs scalar reference implementations (K9)."""

import numpy as np
import pytest

from wned_ray.functions import strsim

PAIRS = [
    ("kitten", "sitting"),
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("jellyfish", "smellyfish"),
    ("", ""),
    ("", "abc"),
    ("abc", ""),
    ("same", "same"),
    ("university of alberta", "univ of alberta"),
    ("a", "b"),
    ("ab", "ba"),
    ("varnel cortiva", "varnel cortiva inc"),
    ("o'neill", "oneill"),
    ("x" * 70, "x" * 70 + "y"),  # truncation path
]


def _arrs():
    a = np.array([p[0] for p in PAIRS], dtype=object)
    b = np.array([p[1] for p in PAIRS], dtype=object)
    return a, b


def test_levenshtein_batch_matches_scalar():
    a, b = _arrs()
    got = strsim.levenshtein_batch(a, b)
    want = [strsim.levenshtein_scalar(x[:64], y[:64]) for x, y in PAIRS]
    assert got.tolist() == want


def test_levenshtein_known_values():
    assert strsim.levenshtein_scalar("kitten", "sitting") == 3
    assert strsim.levenshtein_scalar("flaw", "lawn") == 2


def test_levenshtein_sim_range():
    a, b = _arrs()
    sim = strsim.levenshtein_sim_batch(a, b)
    assert np.all(sim >= 0.0) and np.all(sim <= 1.0)
    assert sim[PAIRS.index(("same", "same"))] == 1.0
    assert sim[PAIRS.index(("", ""))] == 1.0
    assert sim[PAIRS.index(("", "abc"))] == 0.0


def test_jaro_winkler_batch_matches_scalar():
    a, b = _arrs()
    got = strsim.jaro_winkler_batch(a, b)
    want = [strsim.jaro_winkler_scalar(x[:64], y[:64]) for x, y in PAIRS]
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_jaro_winkler_known_values():
    # classic textbook values
    assert strsim.jaro_scalar("MARTHA", "MARHTA") == pytest.approx(0.944444, abs=1e-5)
    assert strsim.jaro_winkler_scalar("MARTHA", "MARHTA") == pytest.approx(0.961111, abs=1e-5)
    assert strsim.jaro_scalar("DWAYNE", "DUANE") == pytest.approx(0.822222, abs=1e-5)
    assert strsim.jaro_winkler_scalar("DIXON", "DICKSONX") == pytest.approx(0.813333, abs=1e-4)


def test_ngram_sim():
    assert strsim.ngram_sim_scalar("abc", "abc") == 1.0
    assert strsim.ngram_sim_scalar("abcd", "abce") == pytest.approx(2 * 2 / 6)
    assert strsim.ngram_sim_scalar("ab", "cd") == 0.0
    assert strsim.ngram_sim_scalar("a", "a") == 1.0  # short-circuit len<n
    a, b = _arrs()
    got = strsim.ngram_sim_batch(a, b)
    assert got[PAIRS.index(("same", "same"))] == 1.0


def test_lcs_length():
    # reference returns raw longest-common-substring length
    assert strsim.lcs_length_scalar("university", "universe") == 7  # "univers"
    assert strsim.lcs_length_scalar("abc", "xyz") == 0
    assert strsim.lcs_length_scalar("", "abc") == 0


def test_random_fuzz_levenshtein_and_jw():
    rng = np.random.default_rng(7)
    alphabet = list("abcdef ")
    strs = ["".join(rng.choice(alphabet, size=rng.integers(0, 15))) for _ in range(200)]
    a = np.array(strs[:100], dtype=object)
    b = np.array(strs[100:], dtype=object)
    lev = strsim.levenshtein_batch(a, b)
    jw = strsim.jaro_winkler_batch(a, b)
    for i in range(100):
        assert lev[i] == strsim.levenshtein_scalar(a[i], b[i]), (a[i], b[i])
        assert jw[i] == pytest.approx(strsim.jaro_winkler_scalar(a[i], b[i]), abs=1e-12), (a[i], b[i])


def test_abbreviation_predicate():
    from wned_ray.functions.strsim import is_abbreviation

    assert is_abbreviation("IBM")
    assert is_abbreviation("U.S.")
    assert not is_abbreviation("Ibm")          # only one uppercase
    assert not is_abbreviation("I")            # too short
    assert not is_abbreviation("ABCDEFGHIJK")  # too long (11)
    assert not is_abbreviation("two words")    # not a single word


def test_abbrev_sim_orders():
    from wned_ray.functions.strsim import abbrev_sim, extract_abbrev

    assert extract_abbrev("International Business Machines") == "IBM"
    exact = abbrev_sim("IBM", "International Business Machines")
    scrambled = abbrev_sim("BMI", "International Business Machines")
    wrong = abbrev_sim("IBM", "Apple Computer Inc")
    assert exact == 1.0
    assert scrambled == 1.0      # letter-sorted comparison is order-free
    assert wrong < exact
    assert abbrev_sim("", "Whatever Name") == 0.0


def test_soft_tfidf_batch_matches_scalar_fuzz():
    """Fuzz: batch SoftTFIDF agrees with the scalar on random multi-token
    strings, with and without an IDF table."""
    import numpy as np

    from wned_ray.functions.strsim import soft_tfidf_batch, soft_tfidf_scalar

    rng = np.random.default_rng(17)
    vocab = ["varquo", "sotanor", "kipenik", "inc", "dr", "gul", "morrin",
             "sotnor", "v", ""]
    pairs = []
    for _ in range(200):
        na, nb = rng.integers(0, 4), rng.integers(0, 4)
        a = " ".join(rng.choice(vocab, na))
        b = " ".join(rng.choice(vocab, nb))
        pairs.append((a, b))
    pairs += [("", ""), ("varquo", ""), ("", "varquo"),
              ("varquo sotanor", "sotanor varquo"),
              ("varquo varquo", "varquo")]
    a = np.array([p[0] for p in pairs], object)
    b = np.array([p[1] for p in pairs], object)
    idf = {"varquo": 2.0, "sotanor": 3.0, "inc": 0.1}
    for table in (None, idf):
        got = soft_tfidf_batch(a, b, idf=table)
        want = np.array([soft_tfidf_scalar(x, y, idf=table)
                         for x, y in pairs])
        assert np.allclose(got, want), np.abs(got - want).max()


def test_soft_tfidf_reorder_beats_jw():
    """The motivating case: token reorder is identity for SoftTFIDF but
    poison for char-level JW."""
    import numpy as np

    from wned_ray.functions.strsim import (jaro_winkler_batch,
                                           soft_tfidf_batch)

    a = np.array(["varquo sotanor holdings international"], object)
    b = np.array(["international holdings sotanor varquo"], object)
    assert soft_tfidf_batch(a, b)[0] == 1.0
    assert jaro_winkler_batch(a, b)[0] < soft_tfidf_batch(a, b)[0]
