#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness gate.

Usage: oracle_check.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name> parquet directory (written by graft.Verify),
runs the matching oracle SQL from <out_dir>/oracle_sql.json in DuckDB over
the sf_dir tables, sorts columns by name and rows by all columns, and
compares exactly. Reports per-query PASS/FAIL plus the first differing
cells. Queries present in the output dir but absent from oracle_sql.json
are reported as rows-only (count > 0).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
try:
    # pyarrow's default jemalloc pool hoards freed arenas across
    # pd.read_parquet calls; on sf0.1 sweeps that starves DuckDB's
    # allocator into spurious tiny-block OOMs (q83's generated-SQL oracle
    # failed at a 16KB allocation with >100 GB free, deterministically,
    # whenever ANY pandas parquet read preceded it). The system allocator
    # returns memory to the OS and the interference disappears.
    import pyarrow as _pa
    _pa.set_memory_pool(_pa.system_memory_pool())
except Exception:
    pass

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Generated-SQL giants whose oracles hit DuckDB's tiny-block
# "bad allocation" OOM mode at sf0.1. Root cause pinned in round 14: the
# failure is THREAD-SCALED allocator pressure, not memory — q83 fails at
# the default 32 threads with >100 GB free (even solo, in a fresh
# process, no pandas read anywhere) and passes at 4 threads with a
# 4.4 GB peak RSS. Late-sweep heap fragmentation (the r12/r13 "long
# connection" theory) only LOWERS the threshold; the thread count is the
# lever. Giants therefore get a fresh connection AND a capped thread
# count from the start (ORACLE_GIANT_THREADS, default 4); negligible
# cost at sf0.01 (a connect + view DDLs; the driver's gate semantics for
# non-giants are untouched). Membership = every query observed in the
# mode across the r12-r14 sweeps; the set drifts with host state, so a
# chunked sweep (scripts/sf01_sweep.sh) is the belt to this suspender.
FRESH_CONN_DEFAULT = {"q83_pq_residual_model", "q89_sq8_error",
                      "q90_duplicate_spans", "q91_span_scrub",
                      "q92_gopher_quality", "q93_bigram_lm",
                      "q94_doc_ce", "q98_bpe_merges"}

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify everything so float64-vs-float32 / int32-vs-int64 don't
    # produce spurious type-level diffs (driver hashes values)
    def cell(v):
        if isinstance(v, float):
            return repr(round(v, 9))
        return repr(v)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df.map(cell) if len(df) else df

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    # optional filters for long sf0.1 sweeps: --only a,b / --skip a,b
    only = skip = None
    fresh_conn = False
    args = sys.argv[3:]
    while args:
        if args[0] == "--only": only = set(args[1].split(",")); args = args[2:]
        elif args[0] == "--skip": skip = set(args[1].split(",")); args = args[2:]
        elif args[0] == "--fresh-conn": fresh_conn = True; args = args[1:]
        else: raise SystemExit(f"unknown arg {args[0]}")
    con = duckdb.connect()
    # sf0.1 sweeps: a few generated-SQL oracles (PQ k-means unrolls, span
    # self-joins, bigram LM) exceed an in-memory connection's allocation
    # ceiling; a temp_directory enables DuckDB's out-of-core spill and an
    # explicit memory_limit keeps the process from fighting the host.
    # Defaults (unset) preserve the driver's sf0.01 behavior exactly.
    def esc(v):  # SQL string literal: double embedded single quotes
        return v.replace("'", "''")
    def configure(c):
        if os.environ.get("ORACLE_TEMP_DIR"):
            c.execute(f"SET temp_directory='{esc(os.environ['ORACLE_TEMP_DIR'])}'")
        if os.environ.get("ORACLE_MEMORY_LIMIT"):
            c.execute(f"SET memory_limit='{esc(os.environ['ORACLE_MEMORY_LIMIT'])}'")
        if os.environ.get("ORACLE_THREADS"):
            c.execute(f"SET threads={int(os.environ['ORACLE_THREADS'])}")
        for t in TABLES:
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return c
    configure(con)
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d))
                   and (only is None or d in only)
                   and (skip is None or d not in skip))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        parts = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not parts:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
        if name not in oracle:
            # the driver's rows-only path STILL sorts the frame in pandas;
            # array-typed cells (unhashable ndarray) crash it and ship as a
            # RED row (CORRECTNESS_r06 q77/q79/q80) — mimic the sort here
            # so that failure mode is caught locally
            try:
                if len(got) > 0:
                    got.sort_values(by=list(got.columns), kind="mergesort")
            except Exception as e:
                print(f"FAIL {name}: rows-only frame not driver-sortable: {e}")
                n_fail += 1; continue
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY"
            print(f"{status} {name}: {len(got)} rows"); n_rowsonly += 1
            continue
        try:
            # --fresh-conn: one connection per oracle. A single long-lived
            # connection accumulates buffer-pool fragmentation across a
            # multi-hour sf0.1 sweep (after the q77 45-min signature
            # re-derivation, unrelated small oracles start failing with
            # tiny-block "bad allocation" OOMs; each passes alone). The
            # driver's sf0.01 gate never runs long enough to hit this —
            # the flag is for local full-scale sweeps.
            fresh = fresh_conn or name in FRESH_CONN_DEFAULT
            qcon = configure(duckdb.connect()) if fresh else con
            if name in FRESH_CONN_DEFAULT and not os.environ.get("ORACLE_THREADS"):
                qcon.execute(
                    f"SET threads={int(os.environ.get('ORACLE_GIANT_THREADS', '4'))}")
            want = qcon.execute(oracle[name]).fetchdf()
            if fresh:
                qcon.close()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        # dtype parity warning: the driver may hash typed values, so an
        # int32-vs-int64 or float-vs-double skew is a latent hash mismatch
        gt = {c: str(got.dtypes[c]) for c in sorted(got.columns)}
        wt = {c: str(want.dtypes[c]) for c in sorted(want.columns)}
        skew = {c: (gt[c], wt[c]) for c in gt if c in wt and gt[c] != wt[c]}
        if skew:
            print(f"WARN {name}: dtype skew {skew}")
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} duckdb={list(w.columns)}")
            n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows spark={len(g)} duckdb={len(w)}")
            n_fail += 1; continue
        if len(g) == 0:
            print(f"PASS {name} (0 rows — weak)"); n_pass += 1; continue
        neq = (g != w)
        if neq.any().any():
            n_fail += 1
            rows, cols = neq.any(axis=1), neq.any(axis=0)
            bad_rows = list(g.index[rows])[:3]
            bad_cols = list(g.columns[cols])
            print(f"FAIL {name}: {int(neq.any(axis=1).sum())}/{len(g)} rows differ; cols={bad_cols}")
            for r in bad_rows:
                for c in bad_cols:
                    if g.at[r, c] != w.at[r, c]:
                        print(f"   row {r} col {c}: spark={g.at[r, c]} duckdb={w.at[r, c]}")
        else:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
