#!/usr/bin/env python3
"""Assemble the committed 1000x artifact from an x1000_full_sweep.sh log.

The sweep's engine passes print `[verify] <gate>  <secs> s` per gate and
the compare phases print per-gate verdict lines in the formats the
compare tools actually emit:
  check_oracle.py:     `<gate> ok`
                       `<gate> ok (float drift<1e-9 ..., would still FAIL exact hash: ...)`
                       `<gate> SCHEMA|ROWS|VALUE|DTYPE|DTYPE-KIND mismatch ...`
  except_all_check.py: `<gate> ok (N rows, ...)`
                       `<gate> DIFF: ...`
  either:              `<gate> ERROR ...` / `<gate> NO SPARK OUTPUT ...` etc.
This folds both into one BENCH_x1000-shaped JSON line: per-gate wall
seconds (single pass, local[32]) plus the oracle verdict, so the scale
evidence is a committed artifact instead of a claim in SURVEY prose.

Evidence-integrity guards (round-11 ADVICE):
  - a gate timed by [verify] but never adjudicated by a compare line is
    recorded in oracle_bad as 'NOT ADJUDICATED' (a compare-phase crash or
    verdict-format drift can no longer read as full parity);
  - 'ok (float drift...)' keeps its parenthetical under oracle_drift
    instead of being silently upgraded to exact;
  - a later 'ok' overwriting an earlier non-ok verdict (gate re-run
    appended to the same log) is recorded under 'retried'.

Usage: tools/x1000_bench_artifact.py <sweep_log> <out_json> [sfDir]
"""
import json
import re
import sys

VERIFY_RE = re.compile(
    r"\[verify\] (q_\w+)\s+([0-9.]+) s(?: \(prep ([0-9.]+) s\))?")
OK_RE = re.compile(r"^(q_\w+)\s+(ok|ok \(.*)$")
BAD_RE = re.compile(
    r"^(q_\w+)\s+((?:SCHEMA|ROWS|VALUE|DTYPE|DTYPE-KIND) mismatch.*|DIFF:.*|"
    r"ERROR.*|NO SPARK OUTPUT.*|NO ENGINE OUTPUT.*|ORACLE SQL ERROR.*|NO ORACLE.*)$")


def main():
    log, out = sys.argv[1], sys.argv[2]
    sf = sys.argv[3] if len(sys.argv) > 3 else "/tmp/graft_sf100"
    times, verdicts, drift, retried, preps = {}, {}, {}, {}, {}

    def record(gate, verdict):
        prior = verdicts.get(gate)
        if prior is not None and prior != "ok" and verdict == "ok":
            # a re-run appended to the same log healed this gate — keep
            # the flaky first verdict visible instead of erasing it
            retried[gate] = prior
            print(f"RETRIED: {gate}, earlier={prior}")
        verdicts[gate] = verdict

    for line in open(log, errors="replace"):
        line = line.replace("[error] ", "").strip()
        m = VERIFY_RE.search(line)
        if m:
            times[m.group(1)] = round(float(m.group(2)), 3)
            if m.group(3):  # PrepClock fixture/ingest segment (inside the time)
                preps[m.group(1)] = round(float(m.group(3)), 3)
            continue
        m = OK_RE.match(line)
        if m:
            gate, msg = m.group(1), m.group(2)
            # drift-tolerated ok is NOT exact — keep the parenthetical
            # (except_all_check's "ok (N rows, ...)" is exact; only
            # check_oracle's float-drift caveat is a weaker verdict)
            if "drift" in msg:
                drift[gate] = msg[:160]
            record(gate, "ok")
            continue
        m = BAD_RE.match(line)
        if m:
            record(m.group(1), m.group(2)[:120])
    # a timed gate with no compare verdict means the compare phase never
    # adjudicated it (crash / format drift) — that is a coverage gap, not
    # a pass; surface it in oracle_bad so the artifact can't read as full
    # parity while gates went unchecked
    unchecked = sorted(set(times) - set(verdicts))
    for g in unchecked:
        verdicts[g] = "NOT ADJUDICATED (timed by [verify], no compare verdict in log)"
        print(f"WARNING: {g} timed but never adjudicated")
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
    if preps:
        # PrepClock-flagged fixture/ingest seconds INSIDE each gate's time
        # (stream slice-file writes) — subtract for operator-only cost
        doc["prep_s"] = {g: preps[g] for g in sorted(preps)}
    if drift:
        doc["oracle_drift"] = drift  # ok-but-not-exact, with the caveat text
    if retried:
        doc["retried"] = retried  # gates whose first verdict was non-ok
    with open(out, "w") as f:
        f.write(json.dumps(doc, separators=(",", ":")) + "\n")
    print(f"{out}: {len(times)} timed gates, {n_ok}/{len(verdicts)} oracle-ok")
    if bad:
        print("BAD:", json.dumps(bad, indent=1))


if __name__ == "__main__":
    main()
