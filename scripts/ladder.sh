#!/bin/bash
# Scaling-ladder driver: one sequential window, in-window CPU ceiling,
# then pyramid at 32 -> 8 -> 2 cores, 3 warm reps per level (min-of-3
# is the metric), appending one JSON line per level to $OUT and load
# markers (+ Spark stderr) to $LOG. Protocol documented in BENCH.md;
# produced bench_runs/r5_ladder_x256_final.{jsonl,loadlog}.
# Usage: bash scripts/ladder.sh <mult> <out-prefix>   e.g. 256 bench_runs/r5_ladder_x256_final
set -u
cd "$(dirname "$0")/.."
MULT=${1:?mult}
PREFIX=${2:?out-prefix}
OUT=$PREFIX.jsonl
LOG=$PREFIX.loadlog
echo "# window start $(date +%H:%M:%S) load: $(cat /proc/loadavg)" >> "$LOG"
python - >> "$OUT" <<'PYEOF'
import sys, json
sys.path.insert(0, 'scripts')
from scaling_bench import cpu_ceiling
print(json.dumps({"cpu_ceiling": cpu_ceiling()}))
PYEOF
echo "# ceiling done $(date +%H:%M:%S) load: $(cat /proc/loadavg)" >> "$LOG"
for CPUS in 32 8 2; do
  SPARK_GRAFT_SCALING_REPS=3 python scripts/scaling_bench.py run "$CPUS" "$MULT" pyramid 2>>"$LOG" | grep '^{' >> "$OUT"
  RC=${PIPESTATUS[0]}
  echo "# === level $CPUS done rc=$RC $(date +%H:%M:%S) load: $(cat /proc/loadavg)" >> "$LOG"
done
echo "# window end $(date +%H:%M:%S) load: $(cat /proc/loadavg)" >> "$LOG"
echo LADDER_COMPLETE
