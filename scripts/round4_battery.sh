#!/usr/bin/env bash
# Round-4 measurement battery — run unattended on the real chip.
#
#   PYTHONPATH must keep /root/.axon_site (the TPU plugin). Each stage
#   logs to benchmarks/logs/ and appends rows to results_r4.jsonl where
#   the underlying script does. Stages are ordered cheapest-first so a
#   mid-battery chip outage still leaves the headline numbers.
#
# Usage: bash scripts/round4_battery.sh [stage ...]
#   stages: headline hamming highdim sweep m1 deep10m   (default: all)
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/logs
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
STAGES=("$@")
[ ${#STAGES[@]} -eq 0 ] && STAGES=(headline hamming highdim sweep m1 deep10m)

run() { # name cmd...
  local name=$1; shift
  echo "=== [$name] $(date +%H:%M:%S) :: $*" | tee -a benchmarks/logs/battery_r4.log
  "$@" > "benchmarks/logs/${name}_r4.log" 2>&1
  local rc=$?
  tail -3 "benchmarks/logs/${name}_r4.log" | tee -a benchmarks/logs/battery_r4.log
  echo "=== [$name] rc=$rc $(date +%H:%M:%S)" | tee -a benchmarks/logs/battery_r4.log
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
    deep10m)   # 10M x 96 sharded store-backed (VERDICT r3 #2)
      run deep10m env DEEP_N=10000000 DEEP_D=96 DEEP_SHARDS=4 \
        DEEP_PATH=/tmp/deep10m python scripts/deep10m.py ;;
    deep4m)    # fallback scale row if the 10M window is too tight
      run deep4m env DEEP_N=4000000 DEEP_D=96 DEEP_SHARDS=4 \
        DEEP_PATH=/tmp/deep4m python scripts/deep10m.py ;;
    *) echo "unknown stage $s" ;;
  esac
done
echo "=== battery done $(date +%H:%M:%S)" | tee -a benchmarks/logs/battery_r4.log
