#!/usr/bin/env python3
"""DEV-ONLY o12s stream-vs-batch drive stage diff (r17 verdict #1).

Parses Spark event logs (spark.eventLog.enabled=true JSON lines) and
aggregates per stage-name (callsite): wall duration, executor run time,
spill and shuffle mass. Run over the 100x census legs of the o12 batch
drive and the o12s stream drive, then diff the two tables to name the
stage(s) carrying the 3.2x stream-twin term SCALE.md r17 localized.

Usage:
    python3 tools/stage_diff.py <eventlog-file> [<eventlog-file2>]
With two files, prints each table then a name-keyed diff sorted by
wall-time delta (file2 - file1).
"""
import json
import sys
from collections import defaultdict


def parse(path):
    stages = {}  # (stageId, attempt) -> dict
    tasks = defaultdict(lambda: defaultdict(float))  # stage key -> metric sums
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            t = ev.get("Event")
            if t == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                key = (si["Stage ID"], si["Stage Attempt ID"])
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                stages[key] = {
                    "name": si.get("Stage Name", "?"),
                    "wall_ms": (comp - sub) if sub and comp else 0,
                    "tasks": si.get("Number of Tasks", 0),
                }
            elif t == "SparkListenerTaskEnd":
                key = (ev["Stage ID"], ev["Stage Attempt ID"])
                tm = ev.get("Task Metrics") or {}
                agg = tasks[key]
                agg["run_ms"] += tm.get("Executor Run Time", 0)
                agg["cpu_ms"] += tm.get("Executor CPU Time", 0) / 1e6
                agg["mem_spill"] += tm.get("Memory Bytes Spilled", 0)
                agg["disk_spill"] += tm.get("Disk Bytes Spilled", 0)
                sr = tm.get("Shuffle Read Metrics") or {}
                agg["shuf_read"] += (sr.get("Local Bytes Read", 0)
                                     + sr.get("Remote Bytes Read", 0))
                sw = tm.get("Shuffle Write Metrics") or {}
                agg["shuf_write"] += sw.get("Shuffle Bytes Written", 0)
    byname = defaultdict(lambda: defaultdict(float))
    for key, st in stages.items():
        b = byname[st["name"]]
        b["wall_ms"] += st["wall_ms"]
        b["n_stages"] += 1
        b["tasks"] += st["tasks"]
        for m, v in tasks[key].items():
            b[m] += v
    return byname


def gb(x):
    return f"{x/2**30:7.2f}g"


def table(byname, title, top=25):
    print(f"\n== {title} (top {top} by wall time) ==")
    print(f"{'wall_s':>8} {'run_s':>8} {'spill(mem)':>10} {'spill(dsk)':>10} "
          f"{'shufR':>8} {'shufW':>8} {'n':>4}  stage")
    rows = sorted(byname.items(), key=lambda kv: -kv[1]["wall_ms"])
    for name, m in rows[:top]:
        print(f"{m['wall_ms']/1e3:8.1f} {m['run_ms']/1e3:8.1f} "
              f"{gb(m['mem_spill'])} {gb(m['disk_spill'])} "
              f"{gb(m['shuf_read'])} {gb(m['shuf_write'])} "
              f"{int(m['n_stages']):4d}  {name[:70]}")
    tot = sum(m["wall_ms"] for m in byname.values()) / 1e3
    spill = sum(m["disk_spill"] for m in byname.values())
    print(f"TOTAL wall {tot:.1f}s  disk-spill {gb(spill)}")


def main():
    a = parse(sys.argv[1])
    table(a, sys.argv[1])
    if len(sys.argv) > 2:
        b = parse(sys.argv[2])
        table(b, sys.argv[2])
        print(f"\n== diff (file2 - file1) by wall time ==")
        names = set(a) | set(b)
        rows = sorted(names,
                      key=lambda n: -(b[n]["wall_ms"] - a[n]["wall_ms"]))
        print(f"{'d_wall_s':>9} {'f1_s':>8} {'f2_s':>8} {'d_spill_dsk':>11}  stage")
        for n in rows[:30]:
            d = (b[n]["wall_ms"] - a[n]["wall_ms"]) / 1e3
            ds = b[n]["disk_spill"] - a[n]["disk_spill"]
            print(f"{d:9.1f} {a[n]['wall_ms']/1e3:8.1f} "
                  f"{b[n]['wall_ms']/1e3:8.1f} {gb(ds)}  {n[:70]}")


if __name__ == "__main__":
    main()
