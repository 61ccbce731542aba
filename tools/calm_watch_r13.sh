#!/bin/bash
# Poll the bench calibration probes via a 2-query spot run; when all three
# read <= 1.15x the pins (cpu 0.876 / shuffle 0.883 / scan 0.203), launch
# the full official round-13 bench and exit. Logs every reading.
cd /root/repo
LOG=/tmp/calm_watch.log
DEADLINE=$(( $(date +%s) + 16200 ))   # 4.5 h
echo "watch start $(date -u)" >> "$LOG"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  OUT=$(SPARK_GRAFT_BENCH_ONLY=window_running_total,ext_text_stats \
        SPARK_GRAFT_BENCH_REPS=3 python bench.py 2>/dev/null | tail -1)
  rm -f BENCH_DETAIL_r13c.json
  READ=$(echo "$OUT" | python3 -c "
import json,sys
try:
    d=json.loads(sys.stdin.readline())
    c=d['calibration_s']/0.876; s=d['calibration_shuffle_s']/0.883; n=d['calibration_scan_s']/0.203
    calm = 'CALM' if (c<=1.15 and s<=1.15 and n<=1.15) else 'busy'
    print(f'{calm} cpu={c:.2f} shuf={s:.2f} scan={n:.2f}')
except Exception as e:
    print('parse-error', e)
")
  echo "$(date -u +%H:%M:%S) $READ" >> "$LOG"
  if [[ "$READ" == CALM* ]]; then
    echo "$(date -u +%H:%M:%S) launching official bench" >> "$LOG"
    SPARK_GRAFT_ROUND=13 python bench.py > /tmp/bench_r13_official.log 2>&1
    echo "$(date -u +%H:%M:%S) official bench done rc=$?" >> "$LOG"
    exit 0
  fi
  sleep 660
done
echo "$(date -u +%H:%M:%S) deadline reached, no calm window" >> "$LOG"
exit 1
