#!/usr/bin/env bash
# Probe-gated driver-bench campaign: 4 fresh-JVM reps of graft.Bench
# at sf0.1, probes before/after each.
set -uo pipefail
cd /root/repo
LOG=BENCH/bench_gated_r5.jsonl
: > "$LOG"
probe() {
  tools/run_tool.sh graft.tools.CpuProbe 8 3 cpu 2>/dev/null | tail -1
}
for rep in 1 2 3 4; do
  p=$(probe)
  echo "{\"probe_before\":\"$p\",\"rep\":$rep}" >> "$LOG"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_DRIVER_MEM=32g tools/run_tool.sh graft.Bench 2>/dev/null \
    | grep '^{"metric"' | sed "s/^{/{\"rep\":$rep,/" >> "$LOG"
done
echo '{"done":true}' >> "$LOG"
