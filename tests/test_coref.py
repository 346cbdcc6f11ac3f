"""Person-coref substring promotion (M8, ELUtils.resolve:178-208)."""

import pandas as pd

from wned_ray.functions.coref import apply_promotion, promotion_map


def test_promotion_basics():
    norms = ["varquo", "varquo sotanor", "varquo s", "varquo sotnor", ""]
    m = promotion_map(norms)
    assert m["varquo"] == "varquo sotanor"
    assert m["varquo s"] == "varquo sotanor"      # abbrev char-prefix
    assert "varquo sotnor" not in m               # typo is NOT a substring
    out = apply_promotion(norms)
    assert out == ["varquo sotanor", "varquo sotanor", "varquo sotanor",
                   "varquo sotnor", ""]


def test_promotion_token_boundary():
    # "varquo" must NOT promote into "gulvarquo fenarvo" (mid-token match)
    m = promotion_map(["varquo", "gulvarquo fenarvo"])
    assert "varquo" not in m
    # but a second-token boundary match is fine
    m2 = promotion_map(["sotanor", "varquo sotanor"])
    assert m2["sotanor"] == "varquo sotanor"


def test_promotion_deterministic_tiebreak_and_chain():
    # two equal-length containers: lexicographically smaller wins
    m = promotion_map(["varquo", "varquo sotanyx", "varquo sotanor"])
    assert m["varquo"] == "varquo sotanor"
    # chains collapse to the longest
    m2 = promotion_map(["var quo", "var quo sot", "var quo sotanor"])
    assert m2["var quo"] == "var quo sotanor"
    assert m2["var quo sot"] == "var quo sotanor"


def test_variant_clusters_initials():
    """M7 OrthoMatcher initials rule: dotted/bare first initials cluster
    with the unique compatible full form; all-initials and ambiguous
    shorts stay put."""
    from wned_ray.functions.coref import variant_clusters

    m = variant_clusters(["v. sotanor", "varquo sotanor"])
    assert m["v. sotanor"] == "varquo sotanor"
    # bare (undotted) initial works too
    m2 = variant_clusters(["v sotanor", "varquo sotanor"])
    assert m2["v sotanor"] == "varquo sotanor"
    # ambiguous: two compatible longs → conservative, no promotion
    m3 = variant_clusters(["v. sotanor", "varquo sotanor", "velbel sotanor"])
    assert "v. sotanor" not in m3
    # all-initials has no anchor token → never promotes
    m4 = variant_clusters(["v. s.", "varquo sotanor"])
    assert "v. s." not in m4
    # token-count mismatch is containment's business, not initials'
    m5 = variant_clusters(["v. sotanor", "varquo sotanor fenarvo"])
    assert "v. sotanor" not in m5


def test_variant_clusters_subsumes_containment():
    from wned_ray.functions.coref import variant_clusters

    m = variant_clusters(["varquo", "varquo sotanor", "v. sotanor"])
    assert m["varquo"] == "varquo sotanor"
    assert m["v. sotanor"] == "varquo sotanor"


def test_promote_mentions_stage(ray_session):
    import ray.data as rd

    from wned_ray.config import PipelineConfig
    from wned_ray.stages.normalize import promote_mentions

    df = pd.DataFrame({
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": [0, 1, 0],
        "mention_id": ["c1:0", "c1:1", "c2:0"],
        "norm_mention": ["varquo", "varquo sotanor", "varquo"],
    })
    out = (promote_mentions(rd.from_pandas(df), PipelineConfig())
           .to_pandas().set_index("mention_id")["norm_mention"])
    assert out["c1:0"] == "varquo sotanor"        # promoted within c1
    assert out["c2:0"] == "varquo"                # no long form in c2


def test_promotion_table_local_rules():
    """Corpus-wide substring promotion: unique extension promotes,
    near-dup extensions promote to the lexicographic min, genuinely
    ambiguous extensions stay unpromoted."""
    from wned_ray.stages.normalize import _promotion_table_local

    vocab = [
        # unique extension
        "varquo", "varquo sotanor",
        # typo-variant extensions (JW >= 0.9 pairwise) -> promote to min
        "belfen", "belfen lunullin", "belfen lunullyn",
        # ambiguous: two genuinely different extensions -> no promotion
        "john", "john smith", "john doe",
    ]
    t = _promotion_table_local(vocab, max_token_block=64)
    promo = dict(zip(t["norm_a"].to_pylist(), t["norm_promoted"].to_pylist()))
    assert promo["varquo"] == "varquo sotanor"
    assert promo["belfen"] == "belfen lunullin"
    assert "john" not in promo


def test_global_promote_composes_chains(ray_session):
    """a ⊂ "a b" ⊂ "a b c": the promotion map composes to fixpoint, so
    every variant lands on the single canonical norm."""
    import pandas as pd
    import ray.data as rd

    from wned_ray.config import PipelineConfig
    from wned_ray.stages.normalize import global_promote

    df = pd.DataFrame({
        "mention_id": ["m0", "m1", "m2"],
        "norm_mention": ["varquo", "varquo sotanor", "varquo sotanor inc"],
    })
    out = (global_promote(rd.from_pandas(df), PipelineConfig())
           .to_pandas().sort_values("mention_id"))
    assert out["norm_mention"].tolist() == ["varquo sotanor inc"] * 3
    assert out["norm_orig"].tolist() == df["norm_mention"].tolist()
