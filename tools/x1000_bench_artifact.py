#!/usr/bin/env python3
"""Assemble the committed 1000x artifact from an x1000_full_sweep.sh log.

The sweep's engine passes print `[verify] <gate>  <secs> s` per gate and
the compare phases print `<gate> EXACT MATCH` / `ok (N rows, ...)` /
mismatch lines. This folds both into one BENCH_x1000-shaped JSON line:
per-gate wall seconds (single pass, local[32]) plus the oracle verdict,
so the scale evidence is a committed artifact instead of a claim in
SURVEY prose.

Usage: tools/x1000_bench_artifact.py <sweep_log> <out_json> [sfDir]
"""
import json
import re
import sys

VERIFY_RE = re.compile(r"\[verify\] (q_\w+)\s+([0-9.]+) s")
OK_RE = re.compile(r"^(q_\w+)\s+(ok|ok \(.*)$")
BAD_RE = re.compile(
    r"^(q_\w+)\s+((?:SCHEMA|ROWS|VALUE|DTYPE|DTYPE-KIND) mismatch.*|DIFF:.*|"
    r"ERROR.*|NO SPARK OUTPUT.*|NO ENGINE OUTPUT.*|ORACLE SQL ERROR.*|NO ORACLE.*)$")


def main():
    log, out = sys.argv[1], sys.argv[2]
    sf = sys.argv[3] if len(sys.argv) > 3 else "/tmp/graft_sf100"
    times, verdicts = {}, {}
    for line in open(log, errors="replace"):
        line = line.replace("[error] ", "").strip()
        m = VERIFY_RE.search(line)
        if m:
            times[m.group(1)] = round(float(m.group(2)), 3)
            continue
        m = OK_RE.match(line)
        if m:
            verdicts[m.group(1)] = "ok"
            continue
        m = BAD_RE.match(line)
        if m:
            verdicts[m.group(1)] = m.group(2)[:120]
    gates = sorted(set(times) | set(verdicts))
    n_ok = sum(1 for g in gates if verdicts.get(g) == "ok")
    bad = {g: v for g, v in verdicts.items() if v != "ok"}
    doc = {
        "metric": "total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": {g: times[g] for g in sorted(times)},
        "oracle_ok": n_ok,
        "oracle_checked": len(verdicts),
        "oracle_bad": bad,
        "sf": sf,
        "note": ("single engine pass per gate at the 1000x star-schema "
                 "replica (600M lineitem / 150M orders / 100M events / "
                 "5M docs / 2M vecs), local[32]; oracle = DuckDB "
                 "(driver-faithful compare <=1M rows, EXCEPT ALL above)"),
    }
    with open(out, "w") as f:
        f.write(json.dumps(doc, separators=(",", ":")) + "\n")
    print(f"{out}: {len(times)} timed gates, {n_ok}/{len(verdicts)} oracle-ok")
    if bad:
        print("BAD:", json.dumps(bad, indent=1))


if __name__ == "__main__":
    main()
