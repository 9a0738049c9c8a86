#!/usr/bin/env python3
"""Exact cosine near-dup oracle for the decades where DuckDB's quadratic
scan is intractable (100x = 200k vectors = 2e10 pairs ~ 37 min; this
blocked-BLAS path covers it in ~1 min).

Independence: shares nothing with the Spark engine — numpy float32 GEMM
screens pairs at (threshold - margin), then every candidate is re-scored
in float64. The float32 screen is LOSSLESS at the gate threshold because
its absolute error on unit-vector dots is ~1e-6 while the margin is 1e-3.

Checks, against a graft.Verify output directory:
  1. q_embed_neardup: engine pair set == exact pair set, and per-pair
     cos agrees within 1e-9 before the 6-decimal round.
  2. q_embed_neardup_lsh verdict: the 'brute_pairs' row equals the exact
     pair count (the other rows are engine-computed booleans).

Usage: tools/embed_neardup_oracle.py <sf_dir> <verify_out_dir> [threshold]
Exit 0 = parity, 1 = mismatch.
"""
import os
import sys

import duckdb
import numpy as np

THRESH = float(sys.argv[3]) if len(sys.argv) > 3 else 0.45
MARGIN = 1e-3  # float32 screen slack; >> 1e-6 GEMM error on unit vectors
BLOCK = 4096


def exact_pairs(sf_dir):
    # driver testdata is a single file; ScaleGen replicas are Spark
    # directories of part files — glob in that case
    src = f"{sf_dir}/embeddings.parquet"
    if os.path.isdir(src):
        src = f"{src}/*.parquet"
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{src}' ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    X = np.array([r[1] for r in rows], dtype=np.float32)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    X64 = X.astype(np.float64)
    n = len(ids)
    pairs = {}
    for i0 in range(0, n, BLOCK):
        i1 = min(i0 + BLOCK, n)
        # screen block-vs-tail (j > i only) in float32
        C = Xn[i0:i1] @ Xn[i0:].T
        bi, bj = np.nonzero(C >= THRESH - MARGIN)
        for bi_, bj_ in zip(bi.tolist(), bj.tolist()):
            i, j = i0 + bi_, i0 + bj_
            if j <= i:
                continue
            # float64 re-score, engine formula: dot / (|x| * |y|)
            x, y = X64[i], X64[j]
            c = float(x @ y) / (np.sqrt(float(x @ x)) * np.sqrt(float(y @ y)))
            if c >= THRESH:
                pairs[(int(ids[i]), int(ids[j]))] = c
    return pairs


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    truth = exact_pairs(sf_dir)
    print(f"[embed-neardup-oracle] exact pairs: {len(truth)}")
    ok = True

    got = duckdb.sql(
        f"SELECT a, b, cos FROM '{out_dir}/q_embed_neardup/*.parquet'").fetchall()
    got_set = {(int(a), int(b)): float(c) for a, b, c in got}
    missed = set(truth) - set(got_set)
    extra = set(got_set) - set(truth)
    if missed or extra:
        ok = False
        print(f"  q_embed_neardup PAIR-SET mismatch: engine missed "
              f"{len(missed)} (e.g. {sorted(missed)[:3]}), "
              f"extra {len(extra)} (e.g. {sorted(extra)[:3]})")
    else:
        worst = max((abs(round(truth[k], 6) - got_set[k]) for k in truth),
                    default=0.0)
        # engine rounds to 6 dp; anything beyond 1e-9 past the rounding
        # grid means a real numeric divergence, not reassociation noise
        if worst > 1e-9 + 5e-7:
            ok = False
            print(f"  q_embed_neardup COS mismatch: worst |delta| {worst}")
        else:
            print(f"  q_embed_neardup ok ({len(got_set)} pairs, "
                  f"worst rounded-cos delta {worst:.2e})")

    v = dict((m, int(val)) for m, val, _ in duckdb.sql(
        "SELECT metric, value, pass FROM "
        f"'{out_dir}/q_embed_neardup_lsh/*.parquet'").fetchall())
    if v.get("brute_pairs") != len(truth):
        ok = False
        print(f"  q_embed_neardup_lsh brute_pairs {v.get('brute_pairs')} "
              f"!= exact {len(truth)}")
    else:
        print("  q_embed_neardup_lsh brute_pairs ok")

    passes = duckdb.sql(
        "SELECT bool_and(pass) FROM "
        f"'{out_dir}/q_embed_neardup_lsh/*.parquet'").fetchone()[0]
    if not passes:
        ok = False
        print("  q_embed_neardup_lsh has a failing verdict row")

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
