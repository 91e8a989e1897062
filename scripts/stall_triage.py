#!/usr/bin/env python
"""Bench-stall triage (VERDICT r6 #5): adjudicate >threshold baseline
ratios in a bench ledger by re-measuring just those queries ISOLATED —
one fresh process per query, bench.py's own protocol (session warm-up
prefix, per-query warm-up, median of 3) — and emit a verdict file.

Why: a single driver bench session occasionally stalls for a few
consecutive positions (GC, page-cache eviction, CPU contention), which
shows up as a run of ADJACENT queries all >2x while clean re-runs
measure them at ~1x (r5: positions 120-123; r6: 66-67 and 187-190).
The three-way evidence protocol (driver ledger vs builder ledgers vs
isolated re-run) was manual; this makes it one command the driver can
also run.

Usage:
    python scripts/stall_triage.py <ledger.json> <out.json> [threshold]

<ledger.json> is either a driver BENCH_r{N}.json (its `parsed` stdout
object carries only the headline subset + drift roll-up; per-query
ratios are then taken from BENCH_LOCAL_latest.json, the full ledger
the same bench run wrote) or a full BENCH_LOCAL_*.json.

Verdicts per flagged query:
  noise       — isolated re-measure <= 1.3x anchor (and typically the
                ledger positions were adjacent: the stall signature)
  borderline  — 1.3x < re-measure <= 1.5x
  regression  — re-measure > 1.5x (a real slowdown; investigate)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def load_ledger(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    # a driver stdout object carries only the headline queries; the
    # full per-query map (with baseline_ratios) is the local ledger
    if "baseline_ratios" not in d or len(d.get("baseline_ratios", {})) < len(
        d.get("queries", {})
    ):
        local = os.path.join(REPO, "BENCH_LOCAL_latest.json")
        if os.path.exists(local):
            with open(local) as fh:
                full = json.load(fh)
            if len(full.get("queries", {})) >= len(d.get("queries", {})):
                print(
                    f"# ledger has no full ratio map; using {local}",
                    file=sys.stderr,
                )
                d = full
    return d


def flagged_with_positions(
    ledger: dict, threshold: float
) -> list[dict]:
    """Flag every anchored query whose ledger ratio exceeds the
    threshold, annotated with its bench POSITION (run order = dict
    order in the ledger) and whether it sits in an adjacent run with
    another flagged query — the consecutive-stall signature."""
    ratios = ledger.get("baseline_ratios") or {}
    order = list(ledger.get("queries", {}))
    pos = {n: i for i, n in enumerate(order)}
    flagged = sorted(
        (
            {"query": n, "ledger_ratio": r, "position": pos.get(n, -1)}
            for n, r in ratios.items()
            if r > threshold
        ),
        key=lambda e: e["position"],
    )
    positions = {e["position"] for e in flagged}
    for e in flagged:
        p = e["position"]
        e["adjacent_to_flagged"] = (p - 1 in positions) or (p + 1 in positions)
    return flagged


def isolated_remeasure(names: list[str]) -> dict[str, dict]:
    """Re-run bench.py once per query in a FRESH process (its own JVM,
    page-cache state aside) and collect the clean timing + ratio.
    BENCH_LOCAL_latest.json is snapshotted and restored — triage must
    not clobber the round's committed ledger."""
    local = os.path.join(REPO, "BENCH_LOCAL_latest.json")
    saved = None
    if os.path.exists(local):
        with open(local) as fh:
            saved = fh.read()
    out: dict[str, dict] = {}
    try:
        for name in names:
            env = dict(os.environ, SPARK_GRAFT_BENCH_ONLY=name)
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                env=env,
                capture_output=True,
                text=True,
                cwd=REPO,
                timeout=1800,
            )
            try:
                with open(local) as fh:
                    run = json.load(fh)
                t = run["queries"].get(name)
                r = (run.get("baseline_ratios") or {}).get(name)
                out[name] = {"isolated_sec": t, "isolated_ratio": r}
            except (OSError, json.JSONDecodeError, KeyError) as exc:
                out[name] = {
                    "error": f"{type(exc).__name__}: {exc}"[:200],
                    "rc": proc.returncode,
                }
            print(f"# {name}: isolated {out[name]}", file=sys.stderr)
    finally:
        if saved is not None:
            with open(local, "w") as fh:
                fh.write(saved)
    return out


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    ledger_path, out_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    ledger = load_ledger(ledger_path)
    flagged = flagged_with_positions(ledger, threshold)
    if not flagged:
        result = {
            "ledger": ledger_path,
            "threshold": threshold,
            "flagged": [],
            "summary": {"n_flagged": 0, "noise": 0, "borderline": 0,
                        "regression": 0},
        }
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=1)
            fh.write("\n")
        print(json.dumps(result["summary"]))
        return
    re_runs = isolated_remeasure([e["query"] for e in flagged])
    for e in flagged:
        e.update(re_runs.get(e["query"], {}))
        r = e.get("isolated_ratio")
        if r is None:
            e["verdict"] = "error"
        elif r <= 1.3:
            e["verdict"] = "noise"
        elif r <= 1.5:
            e["verdict"] = "borderline"
        else:
            e["verdict"] = "regression"
    summary = {
        "n_flagged": len(flagged),
        "noise": sum(e["verdict"] == "noise" for e in flagged),
        "borderline": sum(e["verdict"] == "borderline" for e in flagged),
        "regression": sum(e["verdict"] == "regression" for e in flagged),
        "adjacent_runs": sum(e["adjacent_to_flagged"] for e in flagged),
    }
    result = {
        "ledger": ledger_path,
        "threshold": threshold,
        "flagged": flagged,
        "summary": summary,
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
        fh.write("\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
