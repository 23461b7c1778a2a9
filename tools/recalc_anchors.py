#!/usr/bin/env python3
"""Recompute check_anchors.py's pins from the committed window archive.

Basis (r16): per-anchor cross-window MEDIAN over every committed
full-suite record — BENCH_r13_full.json, BENCH_r14_full.json, and all
BENCH_r15_w*.json (later rounds: add their window records to FILES).
The median is robust to degraded windows (r15 w1 read anchors at
2-5x), which is the point: the pin should describe the typical window,
not the luckiest one. Prints the ANCHORS block to paste into
check_anchors.py; the old -> new values go to SCALE.md.
"""
import glob
import json
import statistics

ANCHORS = ["a9_pq_adc", "a9c_ivfadc", "a9b_pq_trained",
           "a4b_ivf_train_iters", "c10_weighted_sample",
           "a6_ann_quantized"]
FILES = (["BENCH_r13_full.json", "BENCH_r14_full.json"]
         + sorted(glob.glob("BENCH_r15_w*.json")))


def main():
    per_window = []
    for f in FILES:
        qs = json.load(open(f))["queries"]
        per_window.append({a: qs.get(a) for a in ANCHORS})
        print(f"# {f}: " + " ".join(
            f"{a}={qs.get(a, float('nan')):.2f}" for a in ANCHORS))
    print("ANCHORS = {")
    for a in ANCHORS:
        vals = [w[a] for w in per_window if w[a] is not None]
        print(f'    "{a}": {statistics.median(vals):.3f},')
    print("}")


if __name__ == "__main__":
    main()
