#!/usr/bin/env python3
"""Bit-determinism sweep: compare two independent graft.Verify dumps.

Usage: determinism_check.py <out_dir_a> <out_dir_b>

For each query directory present in both dumps, loads the parquet,
sorts columns by name and rows by all columns (the driver's compare
normalization), and asserts cell-exact equality. Exit 1 on any diff.
"""
import sys, os, glob
import pandas as pd

def load(d):
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    names = sorted(n for n in os.listdir(a_dir)
                   if os.path.isdir(os.path.join(a_dir, n)))
    bad = 0
    for n in names:
        if not os.path.isdir(os.path.join(b_dir, n)):
            print(f"MISS {n} (absent in {b_dir})"); bad += 1; continue
        a, b = load(os.path.join(a_dir, n)), load(os.path.join(b_dir, n))
        if a.shape != b.shape:
            print(f"DIFF {n}: shape {a.shape} vs {b.shape}"); bad += 1; continue
        # exact compare incl. NaN==NaN (repr-stringify like the driver)
        ra, rb = a.map(repr), b.map(repr)
        if not ra.equals(rb):
            neq = (ra != rb).any(axis=1)
            print(f"DIFF {n}: {int(neq.sum())} differing rows; first:")
            print(pd.concat([a[neq].head(2), b[neq].head(2)]))
            bad += 1
        else:
            print(f"SAME {n} ({len(a)} rows)")
    print(f"\n== {len(names) - bad} identical, {bad} differing ==")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
