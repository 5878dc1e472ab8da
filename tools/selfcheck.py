#!/usr/bin/env python3
"""Dev-only mirror of the driver's correctness gate (NOT shipped library code).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark output), runs the matching SQL from
<verifyOutDir>/oracle_sql.json in DuckDB with views over <sfDir>/*.parquet, and
compares: column names (sorted), row counts, and exact values after sorting rows.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


NATIVE_INTS = {"int8", "int16", "int32", "int64"}


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype) in NATIVE_INTS:
            # Widening within native signed ints is invisible to the driver's
            # hash (q89 int32-vs-int64 passes its gate). A DuckDB HUGEINT
            # (int128 — pandas surfaces it as float64/object) is NOT in this
            # set and stays as-is, so the strict dtype compare below fails it.
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def dtype_mismatches(g: pd.DataFrame, w: pd.DataFrame):
    """Strict dtype comparison after native-int widening — the driver's hash
    is type-sensitive to HUGEINT vs BIGINT, and the round-8 int64 coercion of
    EVERY integer dtype masked exactly that bug class (9 driver failures the
    local mirror called green).
    """
    return [(c, str(g[c].dtype), str(w[c].dtype))
            for c in g.columns if g[c].dtype != w[c].dtype]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            want = con.execute(sql).fetchdf()
            g, w = normalize(got), normalize(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
                failures += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                failures += 1
                continue
            bad = dtype_mismatches(g, w)
            if bad:
                print(f"FAIL {name}: dtype mismatch (spark vs oracle): {bad}")
                failures += 1
                continue
            try:
                pd.testing.assert_frame_equal(g, w, check_exact=True, check_dtype=True)
                print(f"OK   {name}: {len(g)} rows, {len(g.columns)} cols")
            except AssertionError as e:
                print(f"FAIL {name}: value mismatch: {str(e)[:500]}")
                failures += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'} "
          f"({len(oracle)} oracle-checked queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
