#!/bin/bash
# DEV-ONLY bench window hunt (see BASELINE.md window-hunt convention):
# every ~13 min cycle logs host telemetry (1-thread ALU loop, 512 MB
# copy GB/s, in-gate /proc/stat deltas), runs the anchor pre-gate, and
# fires a full Bench window only when the anchor set passes; stops on
# a QUALIFIED full window. Telemetry rides every verdict so weather
# thresholds are calibrated from the archive, not asserted.
set -u
cd /root/repo
W=${HUNT_W_START:-1}
MAX_CYCLES=${HUNT_MAX_CYCLES:-40}
LOG=${HUNT_LOG:-/tmp/window_hunt.log}
snap() { head -1 /proc/stat | awk '{print $2,$3,$4,$5,$6,$7,$8,$9}'; }
pct() { python3 -c "
a='$1'.split(); b='$2'.split()
d=[int(y)-int(x) for x,y in zip(a,b)]; t=sum(d) or 1
print('user=%.1f%% idle=%.1f%% iowait=%.1f%% steal=%.2f%%' % (100*d[0]/t,100*d[3]/t,100*d[4]/t,100*d[7]/t))"; }
probe() { python3 -c "
import numpy as np, time
a=np.zeros(64*1024*1024); b=np.empty_like(a); np.copyto(b,a)
ts=[]
for _ in range(3):
    t=time.perf_counter(); np.copyto(b,a); ts.append(time.perf_counter()-t)
bw=2*512/1024/min(ts)
t=time.perf_counter()
x=0
for i in range(10_000_000): x+=i
print('alu=%.3fs bw=%.1fGB/s' % (time.perf_counter()-t, bw))"; }
echo "hunt3 start $(date -u +%H:%M:%S)" >> "$LOG"
for cycle in $(seq 1 $MAX_CYCLES); do
  P=$(probe)
  A=$(snap)
  ANCHOR_OUT=/tmp/anchor_hunt.json bash tools/qualify_window.sh > /tmp/gate_out.txt 2>&1
  GATE=$?
  B=$(snap)
  echo "cycle $cycle $(date -u +%H:%M:%S) $P gate_exit=$GATE in-gate: $(pct "$A" "$B")" >> "$LOG"
  cat /tmp/gate_out.txt >> "$LOG"
  if [ $GATE -eq 0 ]; then
    echo "cycle $cycle ANCHORS PASS — full window w$W" >> "$LOG"
    A=$(snap)
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_OUT=${HUNT_OUT_PREFIX:-/tmp/bench_w}$W.json \
    sbt -batch "runMain graft.Bench" > ${HUNT_OUT_PREFIX:-/tmp/bench_w}$W.log 2>&1
    B=$(snap)
    echo "w$W in-window: $(pct "$A" "$B")" >> "$LOG"
    python3 tools/check_anchors.py ${HUNT_OUT_PREFIX:-/tmp/bench_w}$W.json >> "$LOG" 2>&1
    if [ $? -eq 0 ]; then
      echo "WINDOW w$W QUALIFIED $(date -u +%H:%M:%S)" >> "$LOG"
      echo "QUALIFIED w$W" > /tmp/window_hunt_result.txt
      exit 0
    fi
    echo "w$W full window degraded" >> "$LOG"
    W=$((W+1))
  fi
  sleep 540
done
echo "NO_QUALIFIED_WINDOW" > /tmp/window_hunt_result.txt
