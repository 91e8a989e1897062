#!/usr/bin/env python
"""Emit the rotating 50-query gate sample (VERDICT r4 #5, r3 #9).

The driver's per-round correctness gate has sampled the same 50
reference-core queries every round, so most of the surface has never
been driver-gate-checked.  This script computes the documented
20-fixed + 30-rotated composition as a machine-readable artifact the
driver can adopt verbatim:

  * 20 FIXED ANCHORS — never rotate; a regression here is catastrophic.
  * 30 ROTATED — the remaining ORACLE-BACKED queries ordered by
    (rounds_since_last_sampled DESC, name ASC); never-sampled queries
    sort first (last_sampled = -inf), so the newest work rotates in
    before anything repeats.  Deterministic given the committed
    CORRECTNESS_r*.json history — no builder input, reproducible by
    anyone.

Usage:  python scripts/gate_sample.py [round_number]
Writes GATE_SAMPLE_r{N}.json in the repo root (N defaults to one past
the highest committed CORRECTNESS_r*.json) and prints it.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FIXED_ANCHORS = [
    "q_scan_filter", "q_count", "q_group_customers", "q_multiway",
    "q_merge_join", "q_theta_join", "q_grand_agg", "q_having",
    "q_sql_strict", "q_sql_entry",
    "q_tpch_q1", "q_tpch_q3", "q_tpch_q5", "q_tpch_q6", "q_tpch_q9",
    "q_tpch_q18",
    "q_window_rank", "q_sessionize", "q_dedup_exact", "q_knn_bruteforce",
]


def history() -> dict[str, int]:
    """query -> last round it appeared in a gate artifact — the
    driver's CORRECTNESS_r*.json OR the builder's self-run
    CORRECTNESS_SELF_r*.json (scripts/self_gate.py), so self-running
    the sample advances the rotation."""
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_*r*.json"))):
        m = re.search(r"CORRECTNESS_(?:SELF_)?r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            data = json.load(fh)
        for name in data:
            last[name] = max(last.get(name, 0), rnd)
    return last


def main() -> None:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    oracle_backed = sorted(entry.oracle_sql())
    last = history()
    this_round = (
        int(sys.argv[1])
        if len(sys.argv) > 1
        else (max(last.values()) if last else 0) + 1
    )

    pool = [q for q in oracle_backed if q not in FIXED_ANCHORS]
    # never-sampled first (staleness = +inf), then stalest, then name
    pool.sort(key=lambda q: (-(this_round - last.get(q, -(10 ** 6))), q))
    rotated = pool[:30]

    out = {
        "round": this_round,
        "scheme": "20 fixed anchors + 30 rotated by "
                  "(rounds_since_last_sampled DESC, name ASC) over "
                  "oracle-backed queries; regenerate with "
                  "scripts/gate_sample.py",
        "fixed": FIXED_ANCHORS,
        "rotated": rotated,
        "sample": FIXED_ANCHORS + rotated,
        "pool_size": len(oracle_backed),
        "never_gate_checked_remaining": sum(
            1 for q in oracle_backed if q not in last and q not in rotated
            and q not in FIXED_ANCHORS
        ),
    }
    dest = os.path.join(REPO, f"GATE_SAMPLE_r{this_round}.json")
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out, indent=1))
    print(f"# written to {dest}", file=sys.stderr)


if __name__ == "__main__":
    main()
