"""M13 abbreviation-definition mining + J3 multi-key lookup + K9 tail
(Monge-Elkan / SoftTFIDF) kernels."""

import numpy as np

from wned_ray.functions.abbrev import (definition_map, find_definition,
                                       find_definition_backward,
                                       find_definition_forward,
                                       multi_key_candidates)
from wned_ray.functions.strsim import (monge_elkan_batch, monge_elkan_scalar,
                                       soft_tfidf_scalar)


def test_pattern_abbrev_paren_definition():
    texts = ["please check VS (Varquo Sotanor) and update the record"]
    assert find_definition("VS", texts) == "Varquo Sotanor"


def test_pattern_definition_paren_abbrev_backward():
    text = "the team at Varquo Sotanor (VS) shipped the fix"
    pos = text.index("(VS)")
    cands = find_definition_backward("VS", text, pos)
    assert "Varquo Sotanor" in cands
    assert find_definition("VS", [text]) == "Varquo Sotanor"


def test_forward_scan_finds_cooccurring_full_form():
    texts = ["please review the items", "we met Varquo Sotanor yesterday",
             "VS said the rollout is fine"]
    assert "Varquo Sotanor" in find_definition_forward("VS", texts[1])
    assert find_definition("VS", texts) == "Varquo Sotanor"


def test_mismatched_initials_rejected():
    # initials of the co-occurring name don't match the abbreviation
    texts = ["we met Tursot Belanor yesterday about the rollout"]
    assert find_definition("VS", texts) is None


def test_backward_scan_stops_at_punctuation_and_window():
    # the '=' token ends the backward window before reaching the far name
    text = "Morzel Takibex = something unrelated Varquo Sotanor (VS)"
    pos = text.index("(VS)")
    cands = find_definition_backward("VS", text, pos)
    assert "Varquo Sotanor" in cands
    assert not any("Morzel" in c for c in cands)


def test_definition_map_only_mines_abbrev_shaped():
    mentions = ["VS", "Varquo Sotanor", "Prof. Belrin"]
    texts = ["VS (Varquo Sotanor) shipped", "Varquo Sotanor agreed",
             "Prof. Belrin reviewed"]
    m = definition_map(mentions, texts)
    assert m == {"VS": "Varquo Sotanor"}


def test_multi_key_candidates_sums_weights():
    cand = {"vs": [("Video Systems", 0.6), ("Varquo Sotanor", 0.4)],
            "varquo sotanor": [("Varquo Sotanor", 1.0)]}
    out = multi_key_candidates(cand, {"vs", "varquo sotanor"})
    assert out[0] == ("Varquo Sotanor", 1.4)
    assert out[1] == ("Video Systems", 0.6)
    assert multi_key_candidates(cand, {"missing"}) == []


def test_monge_elkan():
    assert monge_elkan_scalar("john smith", "john smith") == 1.0
    assert monge_elkan_scalar("smith john", "john smith") == 1.0  # token bag
    # asymmetric: extra token on the right costs nothing, on the left it does
    assert monge_elkan_scalar("john", "john smith") == 1.0
    assert monge_elkan_scalar("john smith", "john") < 1.0
    assert monge_elkan_scalar("", "") == 1.0
    assert monge_elkan_scalar("john", "") == 0.0
    a = np.asarray(["john smith", "smith john", "john", "zzz"], object)
    b = np.asarray(["john smith", "john smith", "john smith", "qqq"], object)
    got = monge_elkan_batch(a, b)
    want = [monge_elkan_scalar(x, y) for x, y in zip(a, b)]
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_soft_tfidf():
    assert abs(soft_tfidf_scalar("john smith", "john smith") - 1.0) < 1e-12
    assert soft_tfidf_scalar("aaa bbb", "ccc ddd") == 0.0
    # a soft (above-theta) match contributes, scaled by the similarity
    s = soft_tfidf_scalar("jonh smith", "john smith")
    assert 0.5 < s < 1.0
    # idf weighting downweights the common token
    idf = {"smith": 0.1, "john": 2.0, "jon": 2.0}
    s_idf = soft_tfidf_scalar("jon smith", "john smith", idf=idf)
    s_uni = soft_tfidf_scalar("jon smith", "john smith")
    assert s_idf != s_uni
