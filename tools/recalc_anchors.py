#!/usr/bin/env python3
"""Recompute check_anchors.py's pins from the committed window archive.

Basis (r17, revised per the r16 advisor): per-anchor median of the
FASTEST HALF of all committed full-suite records. The r16 basis (plain
median over ALL windows) included the degraded windows the gate exists
to reject (r15 w1 read anchors at 2-5x), biasing every pin upward
10-30% — combined with the 1.15 tolerance, a window 22% slower than
the standing record could read QUALIFIED. Host degradation only ever
SLOWS an anchor, so the fast half of the archive approximates the calm
population; its median is a pin that describes a genuinely calm
window. (Not the minimum: a single anomalously-fast draw — wrong sf
dir, partial run — must not set the pin either.)

FILES: every committed full-suite record (later rounds: append their
window records). Prints the ANCHORS block to paste into
check_anchors.py; record old -> new values in SCALE.md.
"""
import glob
import json
import statistics

ANCHORS = ["a9_pq_adc", "a9c_ivfadc", "a9b_pq_trained",
           "a4b_ivf_train_iters", "c10_weighted_sample",
           "a6_ann_quantized"]
FILES = (["BENCH_r13_full.json", "BENCH_r14_full.json"]
         + sorted(glob.glob("BENCH_r15_w*.json"))
         + sorted(glob.glob("BENCH_r16_w*.json"))
         + sorted(glob.glob("BENCH_r17_w*.json")))


def main():
    per_window = []
    for f in FILES:
        qs = json.load(open(f))["queries"]
        per_window.append({a: qs.get(a) for a in ANCHORS})
        print(f"# {f}: " + " ".join(
            f"{a}={qs.get(a, float('nan')):.2f}" for a in ANCHORS))
    print("ANCHORS = {")
    for a in ANCHORS:
        vals = sorted(w[a] for w in per_window if w[a] is not None)
        fast_half = vals[:(len(vals) + 1) // 2]
        print(f'    "{a}": {statistics.median(fast_half):.3f},')
    print("}")


if __name__ == "__main__":
    main()
