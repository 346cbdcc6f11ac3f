"""Soundex encoder + phonetic blocking tests (functions/phonetic.py).
The encoder is gated on the canonical NARA test vectors including the
h/w-transparency cases most implementations get wrong."""

from __future__ import annotations

import numpy as np
import pandas as pd


def test_soundex_nara_vectors():
    from wned_ray.functions.phonetic import soundex

    cases = {
        "Robert": "R163", "Rupert": "R163",
        "Ashcraft": "A261",   # h transparent: NOT A226
        "Ashcroft": "A261",
        "Tymczak": "T522",    # adjacent same-class across vowel kept
        "Pfister": "P236",    # first-letter-class duplicate dropped
        "Honeyman": "H555",
        "Washington": "W252",
        "Lee": "L000",        # zero padding
        "Gutierrez": "G362",
        "Jackson": "J250",
        "VanDeusen": "V532",
        "Deusen": "D250",
    }
    got = soundex(pd.Series(list(cases))).tolist()
    assert got == list(cases.values())


def test_soundex_edge_cases():
    from wned_ray.functions.phonetic import soundex

    s = soundex(pd.Series(["", "   ", "123", "A", "a b c", "Smith Jones"]))
    # empty / non-alpha -> ""; single letter pads; first TOKEN only
    assert s.tolist() == ["", "", "", "A000", "A000", "S530"]


def test_soundex_first_token_and_case():
    from wned_ray.functions.phonetic import soundex

    assert soundex(pd.Series(["McDONALD", "mcdonald"])).nunique() == 1


def test_phonetic_key_pairs(ray_session):
    import ray.data as rd

    from wned_ray.functions.phonetic import phonetic_key_pairs

    df = pd.DataFrame({
        "id": ["m1", "m2", "m3", "m4", "m5"],
        "name": ["Robert", "Rupert", "Ashcraft", "Ashcroft", "Lee"],
    })
    got = (phonetic_key_pairs(rd.from_pandas(df), "id", "name")
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    # R163 block {m1,m2} and A261 block {m3,m4}; Lee alone -> no edge
    assert got[["id_a", "id_b"]].values.tolist() == [
        ["m1", "m2"], ["m3", "m4"]]


def test_phonetic_hot_block_dropped(ray_session):
    import ray.data as rd

    from wned_ray.functions.phonetic import phonetic_key_pairs

    df = pd.DataFrame({
        "id": [f"m{i}" for i in range(30)],
        "name": ["Robert"] * 30,
    })
    got = phonetic_key_pairs(rd.from_pandas(df), "id", "name",
                             max_block=10).to_pandas()
    assert len(got) == 0
