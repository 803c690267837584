#!/bin/bash
# One-shot TPU measurement sweep for the round-3 gather/scatter rework.
# Appends everything to /tmp/tpu_r3_results.txt; each piece is its own
# bounded subprocess so a worker kill only loses one step.
cd /root/repo
OUT=/tmp/tpu_r3_results.txt
log() { echo "=== $1 ($(date +%H:%M:%S)) ===" >> $OUT; }

log "kernel matrix 10k (scatter-dense default)"
timeout 600 python scripts/kernel_matrix.py 3334 >> $OUT 2>&1

log "kernel matrix 10k CHEMLAB_DENSE=gather"
KM_KINDS=cell CHEMLAB_DENSE=gather timeout 420 python scripts/kernel_matrix.py 3334 >> $OUT 2>&1

log "kernel matrix 100k (scatter-dense default)"
timeout 900 python scripts/kernel_matrix.py 33334 >> $OUT 2>&1

log "kernel matrix 100k CHEMLAB_DENSE=gather"
KM_KINDS=cell CHEMLAB_DENSE=gather timeout 600 python scripts/kernel_matrix.py 33334 >> $OUT 2>&1

log "kernel matrix 100k retuned caps"
KM_KINDS=cell KM_RETUNE=1 timeout 900 python scripts/kernel_matrix.py 33334 >> $OUT 2>&1

log "rebuild A/B 100k fused"
timeout 600 python scripts/rebuild_ab.py 33334 >> $OUT 2>&1

log "rebuild A/B 100k split"
CHEMLAB_REBUILD=split timeout 600 python scripts/rebuild_ab.py 33334 >> $OUT 2>&1

log "step bisect 100k"
timeout 900 python scripts/step_bisect.py 33334 >> $OUT 2>&1

log "bench.py"
timeout 1800 python bench.py >> $OUT 2>&1

log "done"
echo SWEEP_COMPLETE >> $OUT
