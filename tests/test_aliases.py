"""Redirect/synonym resolution semantics (J6/A4).

The regression these lock in: multi-source base rows — one (entity,
alias) pair per source ('name', 'link', ...) — must ALL survive
resolution, because ``build_alias_candidates`` sums their freq into the
prior. The round-2 review found a keep-one-per-(entity, alias) collapse
that silently dropped 60/180 fixture rows' freq mass.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from wned_ray.stages.aliases import resolve_redirects, resolve_redirects_table

ALIAS = pa.table({
    "entity": ["e1", "e1", "e2", "e2"],
    "alias":  ["acme corp", "acme corp", "bolt ltd", "acme old"],
    "source": ["link", "name", "name", "name"],
    "freq":   [10, 40, 7, 3],
})
# 'acme old' -> 'acme corp' (collides with e2's DIRECT 'acme old' row for
# the e2 target? no — targets e1's alias); 'former bolt' -> 'bolt ltd'
REDIRECTS = pa.table({
    "from_alias": ["acme old", "former bolt"],
    "to_alias":   ["acme corp", "bolt ltd"],
})


def _check(df: pd.DataFrame):
    df = df.sort_values(["entity", "alias", "source"]).reset_index(drop=True)
    # every base row survives, including BOTH e1 'acme corp' source rows
    base = df[df["source"] != "redirect"]
    assert len(base) == 4
    assert base["freq"].sum() == 60
    # redirect row freq = SUM of the target rows' freq (10 + 40)
    red = df[df["source"] == "redirect"].set_index(["entity", "alias"])
    assert red.loc[("e2", "former bolt"), "freq"] == 7
    # 'acme old' already a DIRECT alias of e2 but NOT of e1: the e1
    # redirect row is kept, the e2 direct row is untouched
    assert red.loc[("e1", "acme old"), "freq"] == 50
    assert ("e2", "acme old") not in red.index
    assert len(df) == 6


def test_resolve_redirects_table_preserves_multi_source_rows():
    out = resolve_redirects_table(ALIAS, REDIRECTS)
    _check(out.to_pandas())


def test_resolve_redirects_distributed_matches_table(ray_session):
    import ray.data as rd

    out = resolve_redirects(rd.from_arrow(ALIAS), rd.from_arrow(REDIRECTS),
                            num_partitions=2)
    _check(out.to_pandas())
    # the two forms agree row-for-row
    table = (resolve_redirects_table(ALIAS, REDIRECTS).to_pandas()
             .sort_values(["entity", "alias", "source"])
             .reset_index(drop=True))
    dist = (out.to_pandas().sort_values(["entity", "alias", "source"])
            .reset_index(drop=True)[table.columns.tolist()])
    pd.testing.assert_frame_equal(
        dist.astype({"freq": "int64"}), table.astype({"freq": "int64"}))
