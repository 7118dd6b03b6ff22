"""Local replica of the driver's correctness gate.

Runs every registered Spark query and its DuckDB oracle at the given
scale factor, compares row count, column names, and an
order-insensitive value hash (floats rounded, rows sorted).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
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
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, round floats, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64").round(4)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None)
        else:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.md5()
    h.update("|".join(df.columns).encode())
    h.update(df.to_csv(index=False, float_format="%.4f").encode())
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from dataprocessingframework_spark import queries as q
    from dataprocessingframework_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures, passed, no_oracle = [], 0, 0
    for name, (fn, sql) in q.REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {type(e).__name__}: {e}"))
            print(f"  FAIL {name}: spark error {e}")
            continue
        if sql is None:
            no_oracle += 1
            print(f"  ---- {name}: rows={len(sdf)} (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {type(e).__name__}: {e}"))
            print(f"  FAIL {name}: oracle error {e}")
            continue
        cs, co = canon(sdf), canon(odf)
        problems = []
        if len(cs) != len(co):
            problems.append(f"rowcount {len(cs)} vs {len(co)}")
        if list(cs.columns) != list(co.columns):
            problems.append(f"cols {list(cs.columns)} vs {list(co.columns)}")
        if not problems and value_hash(cs) != value_hash(co):
            diff_cols = []
            for c in cs.columns:
                if not cs[c].equals(co[c]):
                    diff_cols.append(c)
            problems.append(f"hash mismatch in cols {diff_cols}")
            ex = None
            for c in diff_cols:
                neq = cs[c] != co[c]
                if neq.any():
                    i = int(np.argmax(neq.values))
                    ex = (c, i, cs[c].iloc[i], co[c].iloc[i])
                    break
            if ex:
                problems.append(f"first diff {ex}")
        if problems:
            failures.append((name, "; ".join(str(p) for p in problems)))
            print(f"  FAIL {name}: {problems}")
        else:
            passed += 1
            print(f"  ok   {name} rows={len(cs)} [{time.time()-t0:.1f}s]")

    print(f"\n{passed} passed, {len(failures)} failed, {no_oracle} no-oracle @ {sf_dir}")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
