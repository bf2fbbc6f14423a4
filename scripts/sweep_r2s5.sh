#!/bin/bash
# Round-2 session-5 experiment queue — run ONCE the chip is back, strictly
# sequentially (one JAX process at a time on the tunnel).  Each config is a
# separate process because the knobs are read at trace time.
set -u
cd "$(dirname "$0")/.."
log() { echo "=== $* ($(date +%H:%M:%S)) ==="; }

log "1. default stardist bench (measures the bf16 CLAHE corner one-hots vs 3345.1)"
python bench.py

log "2. s2d U-Net decoder tail ON"
CIA_UNET_S2D_TAIL=1 python bench.py

log "3. raster tile=256"
CIA_BENCH_SD_TILE=256 python bench.py

log "4. raster m_cap=8"
CIA_BENCH_SD_MCAP=8 python bench.py

log "5. raster tile=64 m_cap=8"
CIA_BENCH_SD_TILE=64 CIA_BENCH_SD_MCAP=8 python bench.py

log "6. decoder-tail micro A/B"
python scripts/probe_unet_ab.py 8 1024

log "7. stage decomposition (fwd / +cand / +nms / +raster / stage A / fused)"
python scripts/probe_stardist.py 8 1024

log "sweep done"
