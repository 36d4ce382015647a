#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness compare.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
after running:  sbt "runMain graft.Verify <sfDir> <outDir>"

For each query dumped by graft.Verify into <outDir>/<name>/ (parquet), runs
the matching SQL from <outDir>/oracle_sql.json in DuckDB against views named
after the testdata tables, then compares: schema (column names), row count,
and a hash over column-name-sorted, row-sorted values.
"""
import sys, os, json, glob
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def list_cols(df: pd.DataFrame):
    """Columns holding list/ndarray cells. The DRIVER's comparator cannot
    sort these (pandas lexsort raises 'unhashable type: numpy.ndarray'),
    so an oracle-checked gate emitting an array column fails THERE even if
    a lenient local render would pass — r7 lost feature_last_events and
    index_postings to exactly this. Gates must serialize arrays to
    delimited strings; this checker now mirrors the driver and hard-fails."""
    return [c for c in df.columns
            if df[c].dtype == object and df[c].map(
                lambda v: isinstance(v, (list, tuple, np.ndarray))
            ).any()]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # Subset mode (matches Verify's optional 3rd arg): only flag missing
    # dumps for the queries actually requested.
    if only:
        oracles = {k: v for k, v in oracles.items() if k in only}
    n_pass = n_fail = 0
    # An oracle whose query dump is missing means the query CRASHED in
    # Verify — that must fail the gate, not vanish from it.
    dumped = {d for d in os.listdir(out_dir)
              if os.path.isdir(os.path.join(out_dir, d))}
    for name in sorted(set(oracles) - dumped):
        print(f"[FAIL-miss] {name}: oracle present but no query dump (query crashed?)")
        n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
            if files else pd.DataFrame()
        if name not in oracles:
            print(f"[rows-only] {name}: rows={len(got)}")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL-sql ] {name}: oracle error: {e}")
            n_fail += 1
            continue
        bad = sorted(set(list_cols(got)) | set(list_cols(want)))
        if bad:
            print(f"[FAIL-arr ] {name}: array-valued output column(s) {bad} "
                  "— driver comparator cannot sort these; serialize to string")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        ok_schema = list(g.columns) == list(w.columns)
        ok_rows = len(g) == len(w)
        # The driver hashes rendered values, so an int column on one side
        # and float on the other (e.g. DuckDB HUGEINT sums -> float64 in
        # pandas) fails there even though values compare equal here. Treat
        # a numeric-kind mismatch as a hard fail to mirror the driver.
        if ok_schema:
            kinds_differ = [c for c in g.columns
                            if (g[c].dtype.kind in "iu") != (w[c].dtype.kind in "iu")
                            and {g[c].dtype.kind, w[c].dtype.kind} <= set("iuf")]
            if kinds_differ:
                print(f"[FAIL-type ] {name}: int/float kind mismatch on "
                      f"{[(c, str(g[c].dtype), str(w[c].dtype)) for c in kinds_differ]}")
                n_fail += 1
                continue
        ok_vals = False
        if ok_schema and ok_rows:
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                              check_exact=False, rtol=0, atol=0)
                ok_vals = True
            except AssertionError as e:
                ok_vals = False
                detail = str(e).splitlines()[:6]
        if ok_schema and ok_rows and ok_vals:
            print(f"[PASS      ] {name}: rows={len(g)}")
            n_pass += 1
        else:
            n_fail += 1
            print(f"[FAIL      ] {name}: schema={ok_schema} rows={len(g)}/{len(w)} vals={ok_vals}")
            if not ok_schema:
                print(f"    got : {sorted(got.columns)}")
                print(f"    want: {sorted(want.columns)}")
            elif ok_rows and not ok_vals:
                for ln in detail:
                    print("   ", ln)
                # show first differing row
                neq = (g.fillna("\0NULL") != w.fillna("\0NULL")).any(axis=1)
                if neq.any():
                    i = neq.idxmax()
                    print("    first diff row idx", i)
                    print("    got :", g.loc[i].to_dict())
                    print("    want:", w.loc[i].to_dict())
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
