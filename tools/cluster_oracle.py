#!/usr/bin/env python3
"""Independent union-find oracle for duplicate-cluster gates at replica
scale, where the SQL transitive-closure oracle blows up: a percolating
similarity graph holds components of 10^5+ members, and the recursive
CTE's reach table is sum(k_i^2) rows — 2.8e10 at the 100x media corpus.

This verifies the CLUSTER step against the already-ORACLE-VERIFIED pair
output (the pair gate is cross-engine exact at the same replica), so the
chain stays end-to-end checked: pairs exact vs DuckDB, clusters exact vs
an independent python union-find over those exact pairs (min-label
contract: every member labelled with its component's minimum id).

Usage: cluster_oracle.py <pairsParquetDir> <clustersParquetDir> [a b id cluster]
"""
import sys

import duckdb


def main():
    pairs_dir, clusters_dir = sys.argv[1], sys.argv[2]
    a_col, b_col, id_col, cl_col = (sys.argv[3:7] or ["a", "b", "id", "cluster"])

    con = duckdb.connect()
    edges = con.execute(
        f"SELECT {a_col}, {b_col} FROM read_parquet('{pairs_dir}/*.parquet')"
    ).fetchall()

    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN root so the final find is the min-label directly
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    want = {}
    for a, b in edges:
        want[a] = find(a)
        want[b] = find(b)

    got = dict(con.execute(
        f"SELECT {id_col}, {cl_col} FROM read_parquet('{clusters_dir}/*.parquet')"
    ).fetchall())

    if set(got) != set(want):
        only_e = len(set(got) - set(want))
        only_o = len(set(want) - set(got))
        print(f"MEMBERSHIP mismatch: engine-only ids={only_e} oracle-only ids={only_o}")
        sys.exit(1)
    bad = [k for k in want if got[k] != want[k]]
    if bad:
        k = bad[0]
        print(f"LABEL mismatch on {len(bad)} ids (first: {k}: "
              f"engine={got[k]} oracle={want[k]})")
        sys.exit(1)
    ncomp = len({v for v in want.values()})
    print(f"ok ({len(want)} clustered ids, {ncomp} components, "
          f"{len(edges)} edges, min-label exact)")


if __name__ == "__main__":
    main()
