#!/usr/bin/env python3
"""Huge-output oracle parity via DuckDB EXCEPT ALL (both directions).

check_oracle.py's pandas per-cell loop is the driver-faithful compare but
chokes past ~10M rows; this tool proves the same rows+schema+multiset
equality natively in DuckDB (the SURVEY §14.6 pattern: 100M rows in ~18 s
per direction). Columns are aligned by sorted name, mirroring the driver.

Usage: python3 tools/except_all_check.py <sfDir> <verifyOutDir> q1,q2,...
"""
import json
import os
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf_dir, out_dir, qlist = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        elif not os.path.exists(path):
            # targeted replicas carry a table subset (see check_oracle.py);
            # an oracle referencing a skipped table fails its own check
            print(f"(no {t} table at {sf_dir} — view skipped)")
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name in qlist:
        sql = oracle.get(name)
        if sql is None:
            print(f"{name:24s} NO ORACLE")
            continue
        eng = f"{out_dir}/{name}/*.parquet"
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{eng}')").fetchall()]
        sel = ", ".join(f'"{c}"' for c in sorted(cols))
        try:
            con.execute(f"CREATE OR REPLACE TEMP TABLE __o AS SELECT {sel} "
                        f"FROM ({sql})")
            # Dtype-KIND assertion (mirrors check_oracle.py's r9 guard):
            # EXCEPT ALL coerces to a common type, so an int64 engine column
            # vs a HUGEINT/DOUBLE oracle column would compare value-equal
            # and hide exactly the q_mix_temperature r8 trap.
            def kind(t):
                t = t.upper()
                if any(k in t for k in ("INT", "HUGE")):
                    return "int"
                if any(k in t for k in ("DOUBLE", "FLOAT", "DECIMAL")):
                    return "float"
                return t
            etypes = {r[0]: r[1] for r in con.execute(
                f"DESCRIBE SELECT {sel} FROM read_parquet('{eng}')").fetchall()}
            otypes = {r[0]: r[1] for r in con.execute(
                "DESCRIBE SELECT * FROM __o").fetchall()}
            bad = [c for c in etypes
                   if kind(etypes[c]) != kind(otypes.get(c, "?"))
                   or "HUGEINT" in otypes.get(c, "").upper()]
            if bad:
                print(f"{name:24s} DTYPE-KIND mismatch: " + ", ".join(
                    f"{c}: engine={etypes[c]} oracle={otypes.get(c)}"
                    for c in bad))
                continue
            ne, no = (con.execute(
                f"SELECT (SELECT count(*) FROM read_parquet('{eng}')), "
                f"(SELECT count(*) FROM __o)").fetchone())
            if ne != no:
                print(f"{name:24s} ROWS mismatch: engine={ne} oracle={no}")
                continue
            d1 = con.execute(
                f"SELECT count(*) FROM (SELECT {sel} FROM read_parquet('{eng}') "
                f"EXCEPT ALL SELECT * FROM __o)").fetchone()[0]
            d2 = con.execute(
                f"SELECT count(*) FROM (SELECT * FROM __o EXCEPT ALL "
                f"SELECT {sel} FROM read_parquet('{eng}'))").fetchone()[0]
            if d1 == 0 and d2 == 0:
                n_ok += 1
                print(f"{name:24s} ok ({ne} rows, EXCEPT-ALL both directions)")
            else:
                print(f"{name:24s} DIFF: engine-only={d1} oracle-only={d2}")
        except Exception as e:
            print(f"{name:24s} ERROR: {str(e)[:200]}")
        finally:
            con.execute("DROP TABLE IF EXISTS __o")
    print(f"== {n_ok}/{len(qlist)} ok")


if __name__ == "__main__":
    main()
