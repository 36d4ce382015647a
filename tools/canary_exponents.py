#!/usr/bin/env python3
"""Fit per-query scaling exponents from BenchOne canary outputs.

Usage: canary_exponents.py <label:file:scale> [<label:file:scale> ...]

Each file is a BenchOne log (lines `<query> RUN<i>: <t> s`, possibly
sbt-prefixed). `scale` is the data multiple vs the sf0.1 base (1, 10, 100).
For every query present in >=2 files, prints t_r2 at each scale and the
log-log slope fitted over the SECOND-run times (first run absorbs cache
builds / JIT). Rows whose largest t_r2 is under 5 s are flagged
overhead-bound (the ~1 s scheduling floor swamps the data term).
"""
import re
import sys
import math
from collections import defaultdict

LINE = re.compile(r"(\w+) RUN(\d+): ([0-9.]+) s")


def load(path):
    runs = defaultdict(dict)
    with open(path, errors="replace") as f:
        for line in f:
            m = LINE.search(line)
            if m:
                runs[m.group(1)][int(m.group(2))] = float(m.group(3))
    return runs


def main():
    series = []  # (scale, {query: {rep: t}})
    for arg in sys.argv[1:]:
        label, path, scale = arg.rsplit(":", 2)
        series.append((label, float(scale), load(path)))
    series.sort(key=lambda s: s[1])
    queries = sorted({q for _, _, r in series for q in r})
    hdr = " | ".join(f"{lab} r1/r2" for lab, _, _ in series)
    print(f"| query | {hdr} | slope(r2) | note |")
    print("|---" * (len(series) + 3) + "|")
    for q in queries:
        pts = []
        cells = []
        for _, scale, runs in series:
            if q in runs:
                r1 = runs[q].get(1)
                r2 = runs[q].get(2, r1)
                cells.append(
                    f"{r1:.2f}/{r2:.2f}" if r1 is not None else "—")
                if r2 is not None:
                    pts.append((math.log10(scale), math.log10(r2)))
            else:
                cells.append("—")
        slope = ""
        note = ""
        if len(pts) >= 2:
            n = len(pts)
            sx = sum(x for x, _ in pts)
            sy = sum(y for _, y in pts)
            sxx = sum(x * x for x, _ in pts)
            sxy = sum(x * y for x, y in pts)
            b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
            slope = f"{b:.2f}"
            tmax = max(10 ** y for _, y in pts)
            if tmax < 5:
                note = "overhead-bound"
            elif b > 1.3:
                note = "SUPER-LINEAR"
        print(f"| {q} | {' | '.join(cells)} | {slope} | {note} |")


if __name__ == "__main__":
    main()
