#!/usr/bin/env python3
"""Route each gate's oracle compare by output size.

<= ROW_CUT rows: tools/check_oracle.py (driver-faithful pandas compare).
 > ROW_CUT rows: tools/except_all_check.py (DuckDB-native EXCEPT ALL).
Both carry the dtype-KIND guard, so the routing never weakens the check.

Usage: python3 tools/route_compare.py <sfDir> <verifyOutDir> q1,q2,...
"""
import os
import subprocess
import sys

import duckdb

ROW_CUT = 1_000_000


def main():
    sf_dir, out_dir, gates = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    con = duckdb.connect()
    small, big = [], []
    for g in gates:
        path = f"{out_dir}/{g}"
        if not os.path.isdir(path):
            print(f"{g:24s} NO ENGINE OUTPUT")
            continue
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{path}/*.parquet')"
        ).fetchone()[0]
        (small if n <= ROW_CUT else big).append(g)
    tools = os.path.dirname(os.path.abspath(__file__))
    if small:
        subprocess.run(
            [sys.executable, f"{tools}/check_oracle.py", sf_dir, out_dir],
            env={**os.environ, "CHECK_ONLY": ",".join(small)}, check=False)
    if big:
        subprocess.run(
            [sys.executable, f"{tools}/except_all_check.py", sf_dir, out_dir,
             ",".join(big)], check=False)


if __name__ == "__main__":
    main()
