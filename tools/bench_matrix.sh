#!/bin/bash
# The reference's results matrix (README.md:87-105): 3 model variants x 2
# benchmark geometries. Runs bench.py per cell on the real chip and appends
# one JSON line each to /tmp/bench_matrix.jsonl. Run ALONE on the chip.
#
#   PYTHONPATH=/root/repo:/root/.axon_site bash tools/bench_matrix.sh [out.jsonl]
set -u
OUT=${1:-/tmp/bench_matrix.jsonl}
: > "$OUT"
for GEO in dsec ddd17; do
  for VAR in fusion rgb event; do
    echo "=== $GEO/$VAR ===" >&2
    FRN_BENCH_GEOMETRY=$GEO FRN_BENCH_VARIANT=$VAR FRN_BENCH_MESH=0 \
      timeout 3600 python bench.py >> "$OUT" 2>/dev/null || \
      echo "{\"metric\": \"${GEO}_${VAR}_infer_fps_per_chip\", \"error\": \"failed/timeout\"}" >> "$OUT"
    tail -1 "$OUT" >&2
  done
done
