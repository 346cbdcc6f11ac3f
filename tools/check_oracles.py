"""Driver-simulation: run each queries() entry and compare with its DuckDB
oracle at a given sf (row count + sorted-column value hash, like
CORRECTNESS_r{N}.json). Usage: python tools/check_oracles.py [sf_dir] [names...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        try:
            return res.to_pandas()
        except TypeError:
            return res.to_pandas(limit=None)
    raise TypeError(type(res))


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return hashlib.sha256(pd.util.hash_pandas_object(df, index=False)
                          .to_numpy().tobytes()).hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "8"))

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            failures.append((name, f"RAY ERROR: {ex}"))
            print(f"{name:28s} RAY-ERROR {ex}")
            continue
        if name not in oracles:
            print(f"{name:28s} rows-only  rows={len(got)}")
            continue
        want = con.execute(oracles[name]).fetch_df()
        rc = "OK" if len(got) == len(want) else f"ROWS {len(got)} vs {len(want)}"
        sc = ("OK" if sorted(got.columns) == sorted(want.columns)
              else f"SCHEMA {sorted(got.columns)} vs {sorted(want.columns)}")
        vh = "?"
        if rc == "OK" and sc == "OK":
            vh = "OK" if value_hash(got) == value_hash(want) else "HASH-MISMATCH"
        status = "PASS" if (rc, sc, vh) == ("OK", "OK", "OK") else "FAIL"
        if status == "FAIL":
            failures.append((name, (rc, sc, vh)))
        print(f"{name:28s} {status}  rows={rc} schema={sc} values={vh}")
    ray.shutdown()
    if failures:
        print("\nFAILURES:", failures)
        sys.exit(1)
    print("\nall checked queries PASS")


if __name__ == "__main__":
    main()
