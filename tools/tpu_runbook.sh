#!/bin/bash
# On-chip measurement runbook — run when the TPU tunnel is up.
# Round-3c queue (the stdio relay died mid-session before these ran;
# ROADMAP.md "Next targets" has the rationale for each):
#   1. step profile at the bench's adaptive-grown ray count
#   2. iota-sort table-gradient A/B (RAW_NGP_IOTA_SORT)
#   3. L1xC32 grid sweep vs the shipped L2xC16 (quality-gated; the CPU
#      proxy result is recorded in ROADMAP — confirm on-chip)
#   4. grid_partial_fraction 0.25 -> 0.125 A/B (edit config override)
#   5. bench.py for the official number
# Each stage is independently resumable; ~60-90 min total with a warm
# compile cache. Requires: no other TPU client running (single-tenant),
# and `ps aux | grep tpu_init` showing the relay alive.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
export RAW_NGP_COMPILE_CACHE=/tmp/raw_ngp_jax_cache

timeout 1800 python tools/tpu_profile.py step --rays 16384 \
    2>&1 | tee /tmp/prof_step16k.log
RAW_NGP_IOTA_SORT=1 timeout 1800 python tools/tpu_profile.py step \
    2>&1 | tee /tmp/prof_iota.log
timeout 3600 python tools/perf_sweep.py \
    --variants 64:32:cdf 64:32:1:32:cdf 64:16:cdf \
    --out /tmp/perf_sweep.json 2>&1 | tee /tmp/perf_sweep.log
timeout 3600 python tools/quality_run.py --iters 5000 --eval_every 500 \
    --out /tmp/quality_run.json 2>&1 | tee /tmp/quality_run.log
timeout 1800 python bench.py 2>&1 | tee /tmp/bench.log
