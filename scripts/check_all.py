"""Driver-style correctness replication: run EVERY ``queries()`` entry and
compare against its ``oracle_sql()`` twin in DuckDB (row count, schema,
canonicalized value hash) — the same three checks the round driver records
in ``CORRECTNESS_r{N}.json``.

Usage (owns the Ray session, per repo convention):

    python scripts/check_all.py                 # sf0.01, 32 CPUs
    GRAFT_SF_DIR=/root/testdata/sf0.001 RAY_GRAFT_CPUS=8 \
        python scripts/check_all.py

Prints one status line per query, a TOTAL line, and writes the full
result dict to ``/tmp/check_all_results.json``. Queries without an
oracle entry (LSH / iterative / model-scored ops the driver checks
rows-only) report ROWS_ONLY; ``er_metrics``'s F1 row is echoed so the
flagship gate (micro-F1 >= 0.99) is visible in the transcript.

NOTE: sf0.01 is the authoritative sweep tier. ``oracle_sql()`` takes no
sf argument (driver contract), so the two oracles over synthetic fixture
tables (``alias_redirect_resolved``, ``anchor_aliases``) embed the
sf0.01-tier fixture paths and will report FAIL at any other sf — that is
a tier mismatch, not a correctness regression.
"""

import hashlib
import json
import os
import sys
import time

import ray

ray.init(address="local",
         num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
         include_dashboard=False, logging_level="ERROR",
         log_to_driver=False)
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __ray_entry__ as e  # noqa: E402

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

con = duckdb.connect()
for t in TABLES:
    p = os.path.join(SF, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")


def canon(df: pd.DataFrame) -> str:
    """Column-name-sorted, row-sorted, float-rounded value hash — mirrors
    the driver's compare (which is why every aggregate column must carry
    the SAME name in the Ray code and the SQL)."""
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


qs = e.queries()
oracles = e.oracle_sql()
only = set(sys.argv[1:])         # optional: sweep just the named queries
if only:
    unknown = only - set(qs)
    if unknown:
        sys.exit(f"unknown queries: {sorted(unknown)}")
    qs = {k: v for k, v in qs.items() if k in only}
results = {}
for name, fn in qs.items():
    t0 = time.time()
    try:
        res = fn(SF)
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        n = len(df)
        if name in oracles:
            odf = con.execute(oracles[name]).fetchdf()
            rows_ok = n == len(odf)
            schema_ok = (sorted(map(str, df.columns))
                         == sorted(map(str, odf.columns)))
            hash_ok = (canon(df) == canon(odf)
                       if (rows_ok and schema_ok) else False)
            status = "PASS" if (rows_ok and schema_ok and hash_ok) else "FAIL"
            results[name] = dict(status=status, rows=n, oracle_rows=len(odf),
                                 rows_ok=rows_ok, schema_ok=schema_ok,
                                 hash_ok=hash_ok,
                                 sec=round(time.time() - t0, 1))
            if status == "FAIL":
                results[name]["cols"] = sorted(map(str, df.columns))
                results[name]["ocols"] = sorted(map(str, odf.columns))
        else:
            results[name] = dict(status="ROWS_ONLY", rows=n,
                                 sec=round(time.time() - t0, 1))
            if name == "er_metrics":
                results[name]["detail"] = df.to_dict("records")
    except Exception as ex:  # noqa: BLE001 — record and keep sweeping
        import traceback

        results[name] = dict(status="ERROR",
                             err=f"{type(ex).__name__}: {ex}",
                             tb=traceback.format_exc()[-1500:])
    r = results[name]
    print(f"{name:32s} {r['status']:9s} rows={r.get('rows')} "
          f"sec={r.get('sec')}", flush=True)
    if r["status"] not in ("PASS", "ROWS_ONLY"):
        print(json.dumps(r, indent=1, default=str), flush=True)

n_pass = sum(1 for r in results.values() if r["status"] == "PASS")
n_rows = sum(1 for r in results.values() if r["status"] == "ROWS_ONLY")
n_bad = len(results) - n_pass - n_rows
print(f"\nTOTAL: {n_pass} pass, {n_rows} rows-only, {n_bad} bad "
      f"of {len(results)}")
if "detail" in results.get("er_metrics", {}):
    print("er_metrics:",
          json.dumps(results["er_metrics"]["detail"], default=str))
json.dump(results, open("/tmp/check_all_results.json", "w"),
          indent=1, default=str)
ray.shutdown()
sys.exit(1 if n_bad else 0)
