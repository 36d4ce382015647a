#!/usr/bin/env python3
"""Derive the BASELINE.md census counts from artifacts — never hand-typed.

Round-12 lesson (VERDICT r12 item 2): hand-maintained census numbers drifted
from the shipped artifacts ("322 gates" vs 321 bench_full keys; "408 tests /
41 suites" vs sbt's own 391/40). This script reads the artifacts themselves
and prints the one-line summary the census table embeds:

  python3 tools/census.py \
      --bench tmp/bench_full_YYYYMMDD_HHMMSS.json \
      --oracle /tmp/check13_full.log \
      --sbt /tmp/sbt_test.log

Each input is optional; whatever is given is summarized. The gate count is
len(bench_full) (or the CORRECTNESS json's key count — same map); the oracle
line is check_oracle.py's own closing "== N pass, M fail =="; tests/suites
come from sbt's "Total number of tests run" / "Suites: completed" lines.
"""
import argparse
import json
import re
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", help="bench_full_*.json or CORRECTNESS_r*.json")
    ap.add_argument("--oracle", help="check_oracle.py stdout log")
    ap.add_argument("--sbt", help="sbt test stdout log")
    args = ap.parse_args()
    out = {}
    if args.bench:
        with open(args.bench) as f:
            d = json.load(f)
        if "bench_full" in d:
            qs = d["bench_full"]
        elif d and all(isinstance(v, dict) and "rows_match" in v for v in d.values()):
            qs = d  # CORRECTNESS_r*.json: gate -> {rows_match, ...}
        else:
            # Refuse shapes like the contract line ({"metric":..,"queries":{top-25}})
            # rather than silently printing a bogus gate count.
            sys.exit(f"--bench {args.bench}: neither a bench_full dump nor a "
                     "CORRECTNESS map; refusing to count its top-level keys")
        out["gates"] = len(qs)
        vals = [v for v in qs.values() if isinstance(v, (int, float))]
        if vals:
            # Failure sentinels (-1.0) are counted separately; summing them
            # would understate the total by 1s per failed gate.
            out["bench_total_sec"] = round(sum(v for v in vals if v >= 0), 1)
            out["bench_failed"] = sum(1 for v in vals if v < 0)
        if "load" in d:
            out["load"] = d["load"]
    if args.oracle:
        txt = open(args.oracle).read()
        m = re.search(r"==\s*(\d+) pass, (\d+) fail\s*==", txt)
        if m:
            out["oracle_pass"], out["oracle_fail"] = int(m.group(1)), int(m.group(2))
        out["rows_only"] = len(re.findall(r"\[rows-only", txt))
        out["no_oracle"] = len(re.findall(r"no_oracle", txt))
    if args.sbt:
        txt = open(args.sbt).read()
        m = re.search(r"Total number of tests run: (\d+)", txt)
        if m:
            out["tests"] = int(m.group(1))
        m = re.search(r"Suites: completed (\d+), aborted (\d+)", txt)
        if m:
            out["suites"] = int(m.group(1))
            out["suites_aborted"] = int(m.group(2))
        m = re.search(r"Tests: succeeded (\d+), failed (\d+)", txt)
        if m:
            out["tests_passed"] = int(m.group(1))
            out["tests_failed"] = int(m.group(2))
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
