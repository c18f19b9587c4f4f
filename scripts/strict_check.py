#!/usr/bin/env python3
"""Strict oracle differ: exact-equality proxy for the driver's hash gate.

Usage:
  python3 scripts/strict_check.py <verify_out_dir> <sf_dir> [name ...]

Unlike oracle_check.py (1e-6 tolerance), this requires exact value
equality after canonicalization, so a pass here predicts hash_match=true
in the driver's CORRECTNESS gate. Reports the first few differing cells
per query with dtypes to make dtype/rounding drift obvious.
"""
import json
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].map(lambda v: hasattr(v, "__len__") and not isinstance(v, (str, bytes))).any():
            df[c] = df[c].map(
                lambda v: tuple(v) if hasattr(v, "__len__") and not isinstance(v, (str, bytes)) else v)
    # Sort on ROUNDED float keys (the comparison below tolerates 1e-9
    # relative drift; raw float sort keys could order the two frames
    # differently within that tolerance and misalign rows), non-float
    # columns first so equal-prefix rows tie-break on the rounded key.
    keys = {}
    float_cols, other_cols = [], []
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            keys[f"__k_{c}"] = df[c].map(
                lambda v: None if pd.isna(v) else float(f"{v:.9e}"))
            float_cols.append(f"__k_{c}")
        else:
            other_cols.append(c)
    tmp = df.assign(**keys) if keys else df
    tmp = tmp.sort_values(by=other_cols + float_cols, ignore_index=True)
    return tmp[df.columns.tolist()]


import datetime
import math


def kind(v):
    """Driver-predictive type kind: the hash gate distinguishes int from
    float (26857 != 26857.0) but not int32 from int64, and normalizes
    date vs timestamp. Calibrated against CORRECTNESS_r03."""
    if isinstance(v, (bool, np.bool_)):
        return "b"
    if isinstance(v, (int, np.integer)):
        return "i"
    if isinstance(v, (float, np.floating)):
        return "f"
    if isinstance(v, (pd.Timestamp, datetime.date, datetime.datetime, np.datetime64)):
        return "t"
    return "o"


def cells_match(x, y):
    kx, ky = kind(x), kind(y)
    if kx != ky:
        return False
    if kx == "f":
        x, y = float(x), float(y)
        if math.isnan(x) and math.isnan(y):
            return True
        # r03 evidence: 1e-12-relative float drift hash-passes (the
        # driver rounds floats before hashing); keep a margin.
        return math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-12)
    if kx == "t":
        return pd.Timestamp(x) == pd.Timestamp(y)
    if kx == "i":
        return int(x) == int(y)
    return x == y


def cell_repr(v):
    if isinstance(v, (np.floating,)):
        return repr(float(v))
    if isinstance(v, (np.integer,)):
        return repr(int(v))
    return repr(v)


def diff(name, spark_df, ora_df):
    if sorted(spark_df.columns) != sorted(ora_df.columns):
        return [f"schema: spark={sorted(spark_df.columns)} oracle={sorted(ora_df.columns)}"]
    if len(spark_df) != len(ora_df):
        return [f"rows: spark={len(spark_df)} oracle={len(ora_df)}"]
    a, b = canon(spark_df), canon(ora_df)
    out = []
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        bad = 0
        for i, (x, y) in enumerate(zip(av, bv)):
            try:
                both_na = pd.isna(x) and pd.isna(y)
            except (TypeError, ValueError):
                both_na = False
            if both_na:
                continue
            ok = (len(x) == len(y) and all(cells_match(p, q) for p, q in zip(x, y))) \
                if isinstance(x, tuple) and isinstance(y, tuple) else cells_match(x, y)
            if not ok:
                out.append(f"cell {col}[{i}]: spark={cell_repr(x)} oracle={cell_repr(y)}")
                bad += 1
                if bad >= 3:
                    break
    return out


def main():
    out_dir, sf_dir = Path(sys.argv[1]), Path(sys.argv[2])
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(d.name for d in out_dir.iterdir() if d.is_dir()):
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        spark_df = pd.read_parquet(out_dir / name)
        try:
            ora_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name:40s} FAIL oracle error: {e}")
            n_fail += 1
            continue
        # A pathological frame (mixed tuple/NaN sort keys etc.) must fail
        # that query alone, not abort the whole check run.
        try:
            problems = diff(name, spark_df, ora_df)
        except Exception as e:
            problems = [f"comparator error: {type(e).__name__}: {e}"]
        if problems:
            n_fail += 1
            print(f"{name:40s} STRICT-FAIL")
            for p in problems[:8]:
                print(f"    {p}")
        else:
            n_pass += 1
            print(f"{name:40s} PASS")
    print(f"\n{n_pass} strict-pass, {n_fail} strict-fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
