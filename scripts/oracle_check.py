#!/usr/bin/env python3
"""Dev-loop oracle differ (mimics the driver's t2 gate).

Usage:
  python3 scripts/oracle_check.py <verify_out_dir> <sf_dir>

Reads <verify_out_dir>/<name>/ parquet written by graft.Verify plus
oracle_sql.json, runs each oracle in DuckDB with views over the sf_dir
parquet tables, and compares: columns sorted by name, rows sorted by all
columns, floats to 1e-6 relative tolerance.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame, keys) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # list columns (parquet arrays / duckdb lists) aren't sortable; tuple-ize
    for c in df.columns:
        if df[c].map(lambda v: hasattr(v, "__len__") and not isinstance(v, str)).any():
            df[c] = df[c].map(lambda v: tuple(v) if hasattr(v, "__len__") and not isinstance(v, str) else v)
    df = df.sort_values(by=keys, ignore_index=True)
    return df


def values_close(a, b) -> bool:
    if a is None and b is None:
        return True
    # normalize list-likes (numpy arrays from parquet, lists from duckdb)
    if hasattr(a, "__len__") and not isinstance(a, str):
        if not (hasattr(b, "__len__") and not isinstance(b, str)):
            return False
        return len(a) == len(b) and all(values_close(x, y) for x, y in zip(a, b))
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-6, abs_tol=1e-9)
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def frames_match(spark_df: pd.DataFrame, ora_df: pd.DataFrame) -> str:
    if sorted(spark_df.columns) != sorted(ora_df.columns):
        return f"schema mismatch: spark={sorted(spark_df.columns)} oracle={sorted(ora_df.columns)}"
    if len(spark_df) != len(ora_df):
        return f"row count mismatch: spark={len(spark_df)} oracle={len(ora_df)}"
    # one shared sort-key order: float-in-either-frame columns last, so
    # sub-tolerance fp noise can't reorder rows, and both frames agree
    keys = sorted(
        spark_df.columns,
        key=lambda c: (spark_df[c].dtype.kind == "f" or ora_df[c].dtype.kind == "f", c))
    a, b = canon(spark_df, keys), canon(ora_df, keys)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            # timestamps: compare as pandas objects
            if isinstance(x, pd.Timestamp) or isinstance(y, pd.Timestamp):
                if pd.Timestamp(x) != pd.Timestamp(y):
                    return f"col {col} row {i}: {x!r} != {y!r}"
            elif not values_close(x, y):
                return f"col {col} row {i}: {x!r} != {y!r}"
    return ""


def main():
    out_dir, sf_dir = Path(sys.argv[1]), Path(sys.argv[2])
    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = n_skip = 0
    for name in sorted(d.name for d in out_dir.iterdir() if d.is_dir()):
        spark_df = pd.read_parquet(out_dir / name)
        if name not in oracles:
            status = "SKIP (no oracle, rows=%d)" % len(spark_df)
            n_skip += 1
            print(f"{name:40s} {status}")
            continue
        try:
            ora_df = con.execute(oracles[name]).df()
        except Exception as e:
            n_fail += 1
            print(f"{name:40s} FAIL (oracle error: {e})")
            continue
        err = frames_match(spark_df, ora_df)
        if err:
            n_fail += 1
            print(f"{name:40s} FAIL ({err})")
        else:
            n_pass += 1
            print(f"{name:40s} PASS ({len(spark_df)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
