#!/usr/bin/env python3
"""DEV-ONLY bench window qualification (r14 verdict #1).

The bench host swings up to 4x on identical code (SCALE.md's weather
log), so a full-suite record drawn in a degraded window misreads as a
regression. This check gates record-taking on a pinned ANCHOR set of
compute-bound queries that reproduce within ~8% across weather
(identified in SCALE.md r13/r14): a window qualifies when every anchor's
median lands within TOLERANCE of its pinned reference (the mean of the
committed r13/r14 full-suite medians — two independent calm-ish windows).

Usage:
    tools/qualify_window.sh [sfDir]      # runs Bench on the anchor set,
                                         # then this check (quick probe)
    python3 tools/check_anchors.py <bench_out.json>   # full record too

Exit 0 = window qualified; exit 1 = degraded (do not commit a record
from this window; re-run later).

AUTHORITATIVE reading: run this over the FULL-SUITE record's own
per-query medians (the full bench_out.json works as input directly).
The pins come from full-suite context, where each query runs inside a
long-JIT-warmed session; the isolated 6-query probe via
qualify_window.sh is systematically slower (measured r15: isolated
anchor medians read 1.4-3.0x pins across two back-to-back windows while
full-suite context reproduces within ~10%), so treat the probe as a
cheap pre-check and qualify the record itself post-hoc.
"""
import json
import sys

# Pinned reference: mean of BENCH_r13_full.json / BENCH_r14_full.json
# per-query medians (sf0.1, local[32]). Do not retune these to "make a
# window pass" — they change only when the anchor queries themselves
# change, with the old/new values recorded in SCALE.md.
ANCHORS = {
    "a9_pq_adc": 1.793,
    "a9c_ivfadc": 1.781,
    "a9b_pq_trained": 2.844,
    "a4b_ivf_train_iters": 2.537,
    "c10_weighted_sample": 0.327,
    "a6_ann_quantized": 1.400,
}
TOLERANCE = 1.15  # each anchor must land within +15% of its pin


def main(path):
    rec = json.load(open(path))
    qs = rec["queries"]
    ok = True
    print(f"{'anchor':28s} {'pinned':>8s} {'median':>8s} {'ratio':>7s}")
    for name, pin in ANCHORS.items():
        got = qs.get(name)
        if got is None:
            print(f"{name:28s} {pin:8.3f} {'MISSING':>8s}")
            ok = False
            continue
        ratio = got / pin
        flag = "" if ratio <= TOLERANCE else "  <-- over"
        print(f"{name:28s} {pin:8.3f} {got:8.3f} {ratio:6.2f}x{flag}")
        if ratio > TOLERANCE:
            ok = False
    print("WINDOW QUALIFIED" if ok else "WINDOW DEGRADED - do not record")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"))
