#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB with views named after the
testdata tables, sorts columns by name and rows by all columns, and
compares. Reports exact match / float-only drift / real mismatch.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize temporal columns to ns for cross-engine compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c])
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name, spark_df, oracle_df):
    s, o = canon(spark_df), canon(oracle_df)
    if list(s.columns) != list(o.columns):
        return f"SCHEMA mismatch: spark={list(s.columns)} oracle={list(o.columns)}"
    if len(s) != len(o):
        return f"ROWS mismatch: spark={len(s)} oracle={len(o)}"
    # The driver hashes dtype-sensitively: a DuckDB HUGEINT/DECIMAL output
    # column surfaces as float64/object in pandas and hash-mismatches an
    # int64 engine column even when every value is equal (q_mix_temperature,
    # round 8). Flag kind mismatches (int vs float vs object) as hard errors.
    dt = [
        (c, s[c].dtype.kind, o[c].dtype.kind)
        for c in s.columns
        if s[c].dtype.kind != o[c].dtype.kind
        and {s[c].dtype.kind, o[c].dtype.kind} != {"M", "M"}
    ]
    if dt:
        return f"DTYPE mismatch (driver hash would fail): {dt}"
    bad = []
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if a == b:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if (math.isnan(a) and math.isnan(b)) or abs(a - b) < 1e-9:
                    bad.append((c, i, a, b, "float-drift"))
                    continue
            bad.append((c, i, a, b, "value"))
            if len(bad) > 5:
                return f"VALUE mismatch: {bad[:5]}"
    drift = [x for x in bad if x[4] == "float-drift"]
    hard = [x for x in bad if x[4] == "value"]
    if hard:
        return f"VALUE mismatch: {hard[:5]}"
    if drift:
        return f"ok (float drift<1e-9 on {len(drift)} cells, would still FAIL exact hash: {drift[:2]})"
    return "ok"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver testdata is a single file; ScaleGen replicas are Spark
        # parquet DIRECTORIES — glob the part files in that case
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        elif not os.path.exists(path):
            # targeted ScaleGen replicas carry a table SUBSET; DuckDB binds
            # views eagerly, so a missing table must be skipped here — any
            # oracle that references it then fails ITS check loudly
            # (ORACLE SQL ERROR) instead of killing the whole compare
            print(f"(no {t} table at {sf_dir} — views skipped)")
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # CHECK_SKIP / CHECK_ONLY: comma-separated query names. Some oracles are
    # intentionally naive (e.g. q_ngram_jaccard's all-pairs join) and become
    # intractable on scaled replicas even though the engine side is fine.
    skip = set(filter(None, os.environ.get("CHECK_SKIP", "").split(",")))
    only = set(filter(None, os.environ.get("CHECK_ONLY", "").split(",")))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        if name in skip or (only and name not in only):
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"{name:24s} NO SPARK OUTPUT: {e}")
            continue
        try:
            oracle_df = con.execute(sql).df()
        except Exception as e:
            print(f"{name:24s} ORACLE SQL ERROR: {e}")
            continue
        r = compare(name, spark_df, oracle_df)
        if r.startswith("ok"):
            n_ok += 1
        print(f"{name:24s} {r}")
    print(f"== {n_ok}/{len(oracle)} ok")


if __name__ == "__main__":
    main()
