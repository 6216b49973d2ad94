#!/bin/bash
# One-pass sf0.1 oracle sweep in FRESH-PROCESS chunks.
#
# Why chunks: a single multi-hour oracle_check process accumulates heap
# fragmentation across ~230 pandas parquet reads, which lowers the
# threshold of DuckDB's thread-scaled tiny-block OOM mode (see
# FRESH_CONN_DEFAULT in oracle_check.py) — the r13 and r14 long runs
# both eventually hit it mid-sweep, and in-process fresh connections
# share the poisoned heap. A fresh process per chunk resets the heap;
# with the giants' 4-thread cap this makes the sweep one-pass.
#
# Usage: scripts/sf01_sweep.sh <verify_dump_dir> <sf_dir> [chunk_size]
# Output: per-query PASS/FAIL lines on stdout (same format as
# oracle_check.py, summary lines stripped); exit 1 if any chunk fails.
set -u
OUT=${1:?verify dump dir}
SF=${2:?sf dir}
CHUNK=${3:-40}
cd "$(dirname "$0")/.."
rc=0
while read -r batch; do
  python3 scripts/oracle_check.py "$OUT" "$SF" \
    --only "$(echo "$batch" | tr ' ' ',')" | grep -vE "^$|^== "
  [ "${PIPESTATUS[0]}" -eq 0 ] || rc=1
done < <(ls -d "$OUT"/*/ | xargs -n1 basename | sort | xargs -n "$CHUNK")
exit $rc
