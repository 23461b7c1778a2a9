#!/usr/bin/env python3
"""Hypervisor CPU-steal probe — the measured mechanism behind 'window weather'.

The anchor gate (tools/check_anchors.py) has rejected six consecutive
bench windows across rounds 18-19 while the host sat at near-zero load
between them. Round 19 measured the mechanism directly: /proc/stat's
steal field read 5.2% of all cycles under a 16-thread burn in the same
regime where windows were failing (anchors 1.2-2.6x over pins), i.e.
the hypervisor is giving this VM's vCPUs away to neighbors. Steal is
invisible to load average and to Spark's own metrics — wall clock
stretches while executor CPU time stays flat, which is exactly the
signature SCALE.md's window-scoped-slope rule exists to handle.

Usage: python3 tools/steal_probe.py [seconds] [threads]
Prints one JSON line {"steal_pct": float, "user_pct": float, ...};
exit 0 iff steal_pct <= 1.0.

The <=1% threshold is a working hypothesis, not a calibrated pin: no
steal readings exist for the historical qualified windows (the probe
postdates them). Observed so far: 5.2% and 1.7-2.1% in the regime
where r19 windows w1-w3 were anchor-rejected. Use as a CHEAP pre-gate
ordered before tools/qualify_window.sh (anchor-set run, ~3 min) which
remains the authoritative gate; record probe readings alongside each
window so the threshold can be calibrated from data.
"""
import json
import subprocess
import sys
import time


def snap():
    fields = open('/proc/stat').readline().split()
    return list(map(int, fields[1:9]))


def main():
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
    threads = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    burn = ('x=0\nimport time\nt=time.time()\n'
            f'while time.time()-t<{secs + 2}: x+=1')
    procs = [subprocess.Popen(['python3', '-c', burn])
             for _ in range(threads)]
    time.sleep(1)  # let the burn saturate before sampling
    a = snap()
    time.sleep(secs)
    b = snap()
    for p in procs:
        p.kill()
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d) or 1
    names = ['user', 'nice', 'system', 'idle',
             'iowait', 'irq', 'softirq', 'steal']
    pct = {n: round(100.0 * v / tot, 2) for n, v in zip(names, d)}
    print(json.dumps({'steal_pct': pct['steal'], 'user_pct': pct['user'],
                      'idle_pct': pct['idle'], 'secs': secs,
                      'threads': threads}))
    return 0 if pct['steal'] <= 1.0 else 1


if __name__ == '__main__':
    sys.exit(main())
