"""Driver-mimic correctness harness: run each __spark_entry__ query on
Spark AND its DuckDB oracle on the same sf dir, compare row count,
column names, and order-insensitive values (exact; floats also reported
at 1e-9 tolerance so rounding-boundary issues are visible).

Usage: python tests/oracle_check.py [query ...]   (default: all)
Env:   ORACLE_SF_DIR (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_conn(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda x: None if x is None or (isinstance(x, float) and np.isnan(x)) else x)
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> dict:
    res = {"name": name, "spark_rows": len(sdf), "oracle_rows": len(odf)}
    if sorted(sdf.columns) != sorted(odf.columns):
        res["status"] = "SCHEMA_MISMATCH"
        res["spark_cols"] = sorted(sdf.columns)
        res["oracle_cols"] = sorted(odf.columns)
        return res
    if len(sdf) != len(odf):
        res["status"] = "ROWCOUNT_MISMATCH"
        return res
    a, b = normalize(sdf), normalize(odf)
    exact = True
    approx = True
    bad_col = None
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(
            b[c].to_numpy().dtype, np.floating
        ):
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            col_exact = np.array_equal(av, bv, equal_nan=True)
            col_approx = bool(np.all(np.isclose(av, bv, atol=1e-9, rtol=0, equal_nan=True)))
        else:
            col_exact = col_approx = bool((pd.Series(av).fillna("\0") == pd.Series(bv).fillna("\0")).all())
        if not col_exact:
            exact = False
            if bad_col is None:
                bad_col = c
        if not col_approx:
            approx = False
            bad_col = c
    res["status"] = "OK" if exact else ("APPROX" if approx else "VALUE_MISMATCH")
    if bad_col is not None:
        res["bad_col"] = bad_col
        mism = a[bad_col].to_numpy() != b[bad_col].to_numpy()
        idx = np.flatnonzero(np.asarray(mism))[:3]
        res["examples"] = [
            (a.iloc[int(i)].to_dict(), b.iloc[int(i)].to_dict()) for i in idx
        ]
    return res


def main():
    import __spark_entry__ as entry
    from lucene_spark.session import get_spark

    sf_dir = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:] or sorted(entry.queries().keys())
    spark = get_spark(master=os.environ.get("SPARK_TEST_MASTER", "local[8]"),
                      shuffle_partitions=8)
    con = duck_conn(sf_dir)
    qs, osql = entry.queries(), entry.oracle_sql()
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name:20s} SPARK_ERROR {type(e).__name__}: {str(e)[:2000]}")
            failures += 1
            continue
        if name not in osql:
            print(f"{name:20s} rows-only  rows={len(sdf)}  ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(osql[name]).df()
        except Exception as e:
            print(f"{name:20s} ORACLE_ERROR {type(e).__name__}: {str(e)[:2000]}")
            failures += 1
            continue
        r = compare(name, sdf, odf)
        line = f"{name:20s} {r['status']:16s} rows={r['spark_rows']}/{r['oracle_rows']} ({time.time()-t0:.1f}s)"
        if r["status"] != "OK":
            failures += 1
            line += f" bad_col={r.get('bad_col')}"
            for ex in r.get("examples", []):
                line += f"\n    spark={ex[0]}\n    duck ={ex[1]}"
            if "spark_cols" in r:
                line += f"\n    spark_cols={r['spark_cols']}\n    duck_cols={r['oracle_cols']}"
        print(line, flush=True)
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
