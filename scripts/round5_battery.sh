#!/usr/bin/env bash
# Round-5 measurement battery — run unattended on the real chip.
#
#   PYTHONPATH must keep /root/.axon_site (the TPU plugin). Each stage
#   logs to benchmarks/logs/ and appends rows to results_r5.jsonl where
#   the underlying script does. Stages are ordered cheapest-first so a
#   mid-battery chip outage still leaves the headline numbers. The box
#   has ONE CPU: never run anything else while a stage is timing (host
#   legs of the build are CPU-bound).
#
# Usage: bash scripts/round5_battery.sh [stage ...]
#   stages: headline hamming highdim sweep m1 cold inc1m deep768 deep10m
#   (default: headline hamming highdim sweep m1)
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/logs
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
STAGES=("$@")
[ ${#STAGES[@]} -eq 0 ] && STAGES=(headline hamming highdim sweep m1)

run() { # name cmd...
  local name=$1; shift
  echo "=== [$name] $(date +%H:%M:%S) :: $*" | tee -a benchmarks/logs/battery_r5.log
  "$@" > "benchmarks/logs/${name}_r5.log" 2>&1
  local rc=$?
  tail -3 "benchmarks/logs/${name}_r5.log" | tee -a benchmarks/logs/battery_r5.log
  echo "=== [$name] rc=$rc $(date +%H:%M:%S)" | tee -a benchmarks/logs/battery_r5.log
}

for s in "${STAGES[@]}"; do
  case "$s" in
    headline)  # 100k x 768 cosine — the driver-visible bench (bulk path)
      run headline python bench.py ;;
    hamming)   # packed-metric recall sweep at 100k
      run hamming env HANNOY_BENCH_METRIC=hamming HANNOY_BENCH_EF=50,100,200 \
        python bench.py ;;
    highdim)   # 1536d / 3072d parity configs (arroy_hannoy.md:39-73)
      run highdim_1536 env HANNOY_BENCH_D=1536 HANNOY_BENCH_N=100000 python bench.py
      run highdim_3072 env HANNOY_BENCH_D=3072 HANNOY_BENCH_N=50000 python bench.py ;;
    sweep)     # hamming-with-compute rows (cosine_hamming.md:91-115)
      run sweep_h96  env HANNOY_BENCH_METRIC=hamming HANNOY_BENCH_EFC=96  python bench.py
      run sweep_h192 env HANNOY_BENCH_METRIC=hamming HANNOY_BENCH_EFC=192 python bench.py ;;
    m1)        # 1M x 768 cosine (baseline row: build 506 s, r@10 0.94)
      run m1 env HANNOY_BENCH_N=1000000 python bench.py ;;
    cold)      # fresh-process cold build x2 (persistent-cache proof) +
               # time-to-first-query against the incremental store
      run cold_build_a python scripts/cold_paths.py build100k
      run cold_build_b python scripts/cold_paths.py build100k
      [ -d /tmp/inc1000000 ] && \
        run cold_open env COLD_PATH=/tmp/inc1000000 python scripts/cold_paths.py open ;;
    inc1m)     # incremental +100k/-10k at 1M (journal-driven delta build)
      run inc1m env INC_PATH=/tmp/inc1000000 python scripts/incremental_1m.py ;;
    deep768)   # the reference's own 10M row: 10M x 768 cosine, sharded,
               # int8 serving tier (>1-chip-HBM configuration)
      run deep768 env DEEP_N=10000000 DEEP_D=768 DEEP_METRIC=cosine \
        DEEP_SHARDS=8 DEEP_TIER=int8 DEEP_RESUME=1 DEEP_PATH=/tmp/deep768 \
        python scripts/deep10m.py ;;
    deep10m)   # 10M x 96 sharded store-backed (r4 config, euclidean)
      run deep10m env DEEP_N=10000000 DEEP_D=96 DEEP_SHARDS=4 \
        DEEP_PATH=/tmp/deep10m python scripts/deep10m.py ;;
    *) echo "unknown stage $s" ;;
  esac
done
echo "=== battery done $(date +%H:%M:%S)" | tee -a benchmarks/logs/battery_r5.log
