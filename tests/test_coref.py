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
