#!/usr/bin/env bash
# MLT-external + constant-score 8M campaign: probe-gated, interleaved
# 32c/8c, 2 cycles, matched heap (prefix_id94 rides as anchor).
set -uo pipefail
cd /root/repo
LOG=BENCH/mlt_campaign.jsonl
: > "$LOG"
probe() {
  tools/run_tool.sh graft.tools.CpuProbe 8 3 cpu 2>/dev/null | tail -1
}
for cycle in 1 2; do
  for cpus in 32 8; do
    p=$(probe)
    echo "{\"probe_before\":\"$p\",\"cycle\":$cycle,\"cpus\":$cpus}" >> "$LOG"
    SPARK_DRIVER_MEM=32g GRAFT_QUERY_FILTER='mlt_ext|constscore_|prefix_id94' \
      tools/run_tool.sh graft.tools.ScalingBench \
      queries "$cpus" 8000000 2>/dev/null \
      | grep '^{' | sed "s/^{/{\"cycle\":$cycle,\"cpus\":$cpus,/" >> "$LOG"
    p=$(probe)
    echo "{\"probe_after\":\"$p\",\"cycle\":$cycle,\"cpus\":$cpus}" >> "$LOG"
  done
done
echo '{"done":true}' >> "$LOG"
