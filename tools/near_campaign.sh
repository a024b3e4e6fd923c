#!/usr/bin/env bash
# NEAR/spanNot 8M latency campaign: probe-gated, interleaved 32c/8c
# query legs (matched 32g heap, frozen classpath), 2 cycles.
set -uo pipefail
cd /root/repo
LOG=BENCH/near_campaign.jsonl
: > "$LOG"
probe() {
  tools/run_tool.sh graft.tools.CpuProbe 8 3 cpu 2>/dev/null | tail -1
}
for cycle in 1 2; do
  for cpus in 32 8; do
    p=$(probe)
    echo "{\"probe_before\":\"$p\",\"cycle\":$cycle,\"cpus\":$cpus}" >> "$LOG"
    SPARK_DRIVER_MEM=32g tools/run_tool.sh graft.tools.ScalingBench \
      queries "$cpus" 8000000 2>/dev/null \
      | grep '^{' | sed "s/^{/{\"cycle\":$cycle,\"cpus\":$cpus,/" >> "$LOG"
    p=$(probe)
    echo "{\"probe_after\":\"$p\",\"cycle\":$cycle,\"cpus\":$cpus}" >> "$LOG"
  done
done
echo '{"done":true}' >> "$LOG"
