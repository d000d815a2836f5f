#!/bin/bash
# Passive reclaim watcher: one line every 3s — timestamp, MemAvailable(GB),
# and the kernel reclaim/compaction counters that distinguish "quiet" from
# "direct-reclaim storm" during benchmark query windows. Pure /proc reads.
while true; do
  ma=$(awk '/MemAvailable/{printf "%.1f", $2/1048576}' /proc/meminfo)
  v=$(awk '/^(pgscan_direct |pgscan_kswapd|pgsteal_direct |pgsteal_kswapd|pgmajfault|allocstall|compact_stall)/{printf "%s=%s ", $1, $2}' /proc/vmstat)
  echo "$(date +%H:%M:%S) avail_gb=$ma $v"
  sleep 3
done
