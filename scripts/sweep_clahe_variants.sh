#!/bin/bash
# VERDICT r4 item 6: measure the two remaining chunk-loop ideas on-chip —
# bf16/int8 one-hot D-matmul materialization and the separable row/col
# blend (all bit-identical to the oracle; tests/test_clahe.py).  Each step
# is a fresh process (the CIA_CLAHE_* knobs are read at trace time).
# Run on an otherwise-idle box; results go to BENCH.md as an r5 session.
set -u
cd "$(dirname "$0")/.."
run() {
  echo "=== $* ==="
  env "$@" timeout 900 python bench.py 2>&1 | tail -1
}
run CIA_NOOP=1                                        # baseline re-measure
run CIA_CLAHE_MXU_VARIANT=bf16
run CIA_CLAHE_MXU_VARIANT=int8
run CIA_CLAHE_SEP=1
run CIA_CLAHE_MXU_VARIANT=int8 CIA_CLAHE_SEP=1
run CIA_CLAHE_MXU_VARIANT=bf16 CIA_CLAHE_SEP=1
