#!/bin/bash
# Round-2 session-5 experiment queue — run ONCE the chip is back, strictly
# sequentially (one JAX process at a time on the tunnel).  Each config is a
# separate process because the knobs are read at trace time.  Per-step
# timeouts (-k: hung axon clients ignore SIGTERM) keep one flaky step from
# stalling the queue; 1800 s covers a cold fused-graph remote compile.
set -u
cd "$(dirname "$0")/.."
log() { echo "=== $* ($(date +%H:%M:%S)) ==="; }
run() { timeout -k 10 1800 "$@" || echo "STEP FAILED rc=$?"; }

log "1. default stardist bench (bf16 CLAHE one-hots + m_cap overflow reduce vs 3345.1)"
run python bench.py

log "2. s2d U-Net decoder tail ON"
run env CIA_UNET_S2D_TAIL=1 python bench.py

log "3. raster tile=256"
run env CIA_BENCH_SD_TILE=256 python bench.py

log "4. raster m_cap=8"
run env CIA_BENCH_SD_MCAP=8 python bench.py

log "5. raster tile=64 m_cap=8"
run env CIA_BENCH_SD_TILE=64 CIA_BENCH_SD_MCAP=8 python bench.py

log "5b. bf16 U-Net conv stack (re-measure post-s2d-level0; was marginal)"
run env CIA_BENCH_SD_DTYPE=bfloat16 python bench.py

log "6. decoder-tail micro A/B"
run python scripts/probe_unet_ab.py 8 1024

log "7. stage decomposition (fwd / +cand / +nms / +raster / stage A / fused)"
run python scripts/probe_stardist.py 8 1024

log "sweep done"
