#!/bin/bash
# One-shot TPU re-measurement after the tunnel returns (see CLAUDE.md
# "PENDING TPU measurements").  Serializes every job; each under timeout.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/remeasure_all.log}
{
  echo "=== $(date) gather-form re-adjudication (fixed use_quad gate) ==="
  timeout 590 python scripts/ab_batch.py
  echo "=== single-seq forms ==="
  timeout 590 python scripts/ab_track.py
  echo "=== bench (cold) ==="
  timeout 590 python bench.py
  echo "=== bench (warm rerun) ==="
  timeout 590 python bench.py
  echo "=== done $(date) ==="
} >"$LOG" 2>&1
grep -v WARNING "$LOG" | tail -40
