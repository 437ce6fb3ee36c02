#!/bin/bash
# Round-3 on-chip measurement runbook — run when the TPU tunnel is up.
# Produces, in order:
#   1. march-variant perf sweep (quality-gated)   -> /tmp/perf_sweep.json
#   2. 5k-step quality curve with the eps fix     -> /tmp/quality_run.json
#   3. bench.py                                    -> /tmp/bench_r3.json
# Each stage is independently resumable; ~60-80 min total with a warm
# compile cache. Requires: no other TPU client running (single-tenant).
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
export RAW_NGP_COMPILE_CACHE=/tmp/raw_ngp_jax_cache

timeout 3600 python tools/perf_sweep.py --out /tmp/perf_sweep.json \
    2>&1 | tee /tmp/perf_sweep.log
timeout 3600 python tools/quality_run.py --iters 5000 --eval_every 500 \
    --out /tmp/quality_run.json 2>&1 | tee /tmp/quality_run.log
timeout 1800 python bench.py 2>&1 | tee /tmp/bench_r3.json.log
