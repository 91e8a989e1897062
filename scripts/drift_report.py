#!/usr/bin/env python
"""Two-fresh-run drift report (BASELINE.md §r4 protocol, r5 tooling).

Reads two full bench ledgers + BASELINE.md anchors and classifies every
anchored query:

  * ok        — <= 1.3x of anchor in at least one run
  * drift     — > 1.3x in BOTH runs (reproducible; re-anchor candidate,
                new anchor = max(run1, run2) per the r4 convention)
  * transient — > 1.3x in exactly one run (machine noise; keep anchor)

Usage: python scripts/drift_report.py BENCH_LOCAL_r5_run1.json \
           BENCH_LOCAL_r5_run2.json [threshold]
Prints the classification and, for the drift class, a ready-to-paste
markdown re-anchor table.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import baseline_anchors  # noqa: E402


def main() -> None:
    run1 = json.load(open(sys.argv[1]))["queries"]
    run2 = json.load(open(sys.argv[2]))["queries"]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    anchors = baseline_anchors()
    drift, transient = [], []
    for q in sorted(set(run1) & set(run2)):
        a = anchors.get(q)
        if not a:
            continue
        r1, r2 = run1[q] / a, run2[q] / a
        if r1 > thr and r2 > thr:
            drift.append((max(r1, r2), q, a, run1[q], run2[q]))
        elif r1 > thr or r2 > thr:
            transient.append((max(r1, r2), q, a, run1[q], run2[q]))
    print(f"anchored both runs: {len(set(run1) & set(run2) & set(anchors))}")
    print(f"drift (> {thr}x in BOTH runs): {len(drift)}")
    for r, q, a, t1, t2 in sorted(drift, reverse=True):
        print(f"  {q}: anchor {a} run1 {t1} run2 {t2} (worst {r:.2f}x)")
    print(f"transient (> {thr}x in ONE run): {len(transient)}")
    for r, q, a, t1, t2 in sorted(transient, reverse=True):
        print(f"  {q}: anchor {a} run1 {t1} run2 {t2} (worst {r:.2f}x)")
    if drift:
        print("\nre-anchor table (new anchor = max of the two runs):\n")
        print("| query | old | run1 | run2 | new anchor |")
        print("|---|---|---|---|---|")
        for r, q, a, t1, t2 in sorted(drift, reverse=True):
            print(f"| `{q}` | {a} | {t1} | {t2} | {round(max(t1, t2), 2)} |")


if __name__ == "__main__":
    main()
