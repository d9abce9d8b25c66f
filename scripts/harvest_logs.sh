#!/bin/bash
# Copy the measurement queue's one-line JSON results into the repo so a
# machine swap or session end cannot lose them (round-2i lost /tmp twice).
cd "$(dirname "$0")/.."
for f in /tmp/r2g_*.log; do
  [ -e "$f" ] || continue
  n=$(basename "$f" .log)
  grep -h '^{' "$f" | tail -1 > "bench_logs/$n.json" 2>/dev/null
  [ -s "bench_logs/$n.json" ] || rm -f "bench_logs/$n.json"
done
ls bench_logs/
