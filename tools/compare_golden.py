#!/usr/bin/env python3
"""Diff the reference's outputs (tools/ref_golden.py) against this
engine's (graft.GoldenDump) on the shared fixtures: column names must
match exactly; rows compared as multisets with numeric coercion
(pandas renders exploded ints as floats) and NaN/null unified.

Usage: python3 tools/compare_golden.py /tmp/ref_golden /tmp/graft_golden
"""
import glob, math, os, sys
import pandas as pd


def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for t in df.itertuples(index=False):
        row = []
        for v in t:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append(None)
            else:
                try:
                    row.append(round(float(v), 9))
                except (TypeError, ValueError):
                    row.append(str(v))
        rows.append(tuple(row))
    rows.sort(key=repr)
    return rows


def main(ref_dir, got_dir):
    n_ok = 0
    cases = sorted(os.path.splitext(os.path.basename(p))[0]
                   for p in glob.glob(f"{ref_dir}/*.csv"))
    for case in cases:
        ref = pd.read_csv(f"{ref_dir}/{case}.csv")
        parts = glob.glob(f"{got_dir}/{case}/*.csv")
        if not parts:
            print(f"FAIL {case}: engine output missing")
            continue
        got = pd.concat([pd.read_csv(p) for p in parts])
        # pandas reset_index keeps its own column order; names must agree
        if sorted(ref.columns) != sorted(got.columns):
            print(f"FAIL {case}: cols ref={sorted(ref.columns)} got={sorted(got.columns)}")
            continue
        r, g = normalize(ref), normalize(got)
        if r != g:
            print(f"FAIL {case}: ref={r[:4]}... got={g[:4]}...")
            continue
        print(f"OK   {case} ({len(r)} rows)")
        n_ok += 1
    print(f"== {n_ok}/{len(cases)} reference-differential cases match")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
