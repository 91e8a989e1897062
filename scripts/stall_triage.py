#!/usr/bin/env python
"""Bench-stall triage (VERDICT r6 #5; taxonomy fixed per VERDICT r7 #5):
adjudicate >threshold baseline ratios in a bench ledger by re-measuring
just those queries ISOLATED — one fresh process per query, bench.py's
own protocol (session warm-up prefix, per-query warm-up, median of 3) —
and emit a verdict file.

Why: a single driver bench session occasionally stalls for a few
consecutive positions (GC, page-cache eviction, CPU contention), which
shows up as a run of ADJACENT queries all >2x while clean re-runs
measure them at ~1x (r5: positions 120-123; r6: 66-67 and 187-190).
The three-way evidence protocol (driver ledger vs builder ledgers vs
isolated re-run) was manual; this makes it one command the driver can
also run.

Usage:
    python scripts/stall_triage.py <ledger.json> <out.json> [threshold]
        [--queries name1,name2,...] [--runs N]

<ledger.json> is either a driver BENCH_r{N}.json (its `parsed` stdout
object carries only the headline subset + drift roll-up; per-query
ratios are then taken from BENCH_LOCAL_latest.json, the full ledger
the same bench run wrote) or a full BENCH_LOCAL_*.json.

--queries forces the named queries into the triage set even when their
ledger ratio is under the threshold (watch-item re-measures).  --runs N
(default 1) re-measures each flagged query N times in N fresh
processes; the verdict classifies on the BEST (minimum) isolated ratio
— the question triage answers is "is the code fast on a clean machine",
and the cleanest observed run is the least-contaminated evidence.

Verdicts per flagged query (see classify()):
  noise                — best isolated re-measure <= 1.3x anchor (and
                         typically the ledger positions were adjacent:
                         the stall signature)
  inverted-environment — isolated re-measure HIGHER than the in-ledger
                         ratio: the machine got slower after the ledger
                         ran (end-of-session saturation, SCALING.md
                         §30), which says nothing about the code.
                         Re-measure on a settled machine before
                         believing any slowdown.
  borderline           — 1.3x < re-measure <= threshold, not inverted
  regression           — re-measure > threshold AND <= the ledger
                         reading (a real slowdown reproduced under
                         cleaner conditions; investigate)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

NOISE_CEILING = 1.3


def classify(
    ledger_ratio: float | None,
    isolated_ratio: float | None,
    threshold: float = 1.5,
) -> str:
    """Adjudicate one flagged query.  A `regression` verdict requires
    the isolated measure to be BOTH above the threshold AND at or
    below the ledger reading — an isolated measure that comes back
    HIGHER than the in-session one means the environment degraded
    after the ledger ran (the inversion signature), not that the code
    regressed (VERDICT r7 "what's wrong" #1)."""
    if isolated_ratio is None:
        return "error"
    if isolated_ratio <= NOISE_CEILING:
        return "noise"
    if ledger_ratio is not None and isolated_ratio > ledger_ratio:
        return "inverted-environment"
    if isolated_ratio <= threshold:
        return "borderline"
    return "regression"


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
    ledger: dict, threshold: float, force: list[str] | None = None
) -> list[dict]:
    """Flag every anchored query whose ledger ratio exceeds the
    threshold (plus any force-included names), annotated with its bench
    POSITION (run order = dict order in the ledger) and whether it sits
    in an adjacent run with another flagged query — the
    consecutive-stall signature."""
    ratios = ledger.get("baseline_ratios") or {}
    order = list(ledger.get("queries", {}))
    pos = {n: i for i, n in enumerate(order)}
    names = {n for n, r in ratios.items() if r > threshold}
    names.update(force or [])
    flagged = sorted(
        (
            {
                "query": n,
                "ledger_ratio": ratios.get(n),
                "position": pos.get(n, -1),
                "forced": n not in ratios or ratios[n] <= threshold,
            }
            for n in names
        ),
        key=lambda e: e["position"],
    )
    positions = {e["position"] for e in flagged if not e["forced"]}
    for e in flagged:
        p = e["position"]
        e["adjacent_to_flagged"] = (p - 1 in positions) or (p + 1 in positions)
    return flagged


def isolated_remeasure(
    names: list[str], runs: int = 1
) -> dict[str, dict]:
    """Re-run bench.py once per query per run in a FRESH process (its
    own JVM, page-cache state aside) and collect the clean timing +
    ratio.  BENCH_LOCAL_latest.json is snapshotted and restored —
    triage must not clobber the round's committed ledger."""
    local = os.path.join(REPO, "BENCH_LOCAL_latest.json")
    saved = None
    if os.path.exists(local):
        with open(local) as fh:
            saved = fh.read()
    out: dict[str, dict] = {}
    try:
        for name in names:
            secs: list[float] = []
            rats: list[float] = []
            err = None
            for i in range(runs):
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
                    if t is not None:
                        secs.append(t)
                    if r is not None:
                        rats.append(r)
                except (OSError, json.JSONDecodeError, KeyError) as exc:
                    err = {
                        "error": f"{type(exc).__name__}: {exc}"[:200],
                        "rc": proc.returncode,
                    }
            if rats:
                out[name] = {
                    "isolated_sec": min(secs) if secs else None,
                    "isolated_ratio": min(rats),
                    "isolated_runs_sec": secs,
                    "isolated_runs_ratio": rats,
                }
            else:
                out[name] = err or {"error": "no measurement", "rc": -1}
            print(f"# {name}: isolated {out[name]}", file=sys.stderr)
    finally:
        if saved is not None:
            with open(local, "w") as fh:
                fh.write(saved)
    return out


def main() -> None:
    args = [a for a in sys.argv[1:]]
    force: list[str] = []
    runs = 1
    pos_args: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--queries":
            force = [q for q in args[i + 1].split(",") if q]
            i += 2
        elif a == "--runs":
            runs = int(args[i + 1])
            i += 2
        else:
            pos_args.append(a)
            i += 1
    if len(pos_args) < 2:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    ledger_path, out_path = pos_args[0], pos_args[1]
    threshold = float(pos_args[2]) if len(pos_args) > 2 else 1.5
    ledger = load_ledger(ledger_path)
    flagged = flagged_with_positions(ledger, threshold, force)
    verdict_keys = (
        "noise", "inverted-environment", "borderline", "regression", "error"
    )
    if not flagged:
        result = {
            "ledger": ledger_path,
            "threshold": threshold,
            "flagged": [],
            "summary": {"n_flagged": 0, **{k: 0 for k in verdict_keys}},
        }
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=1)
            fh.write("\n")
        print(json.dumps(result["summary"]))
        return
    re_runs = isolated_remeasure([e["query"] for e in flagged], runs=runs)
    for e in flagged:
        e.update(re_runs.get(e["query"], {}))
        e["verdict"] = classify(
            e.get("ledger_ratio"), e.get("isolated_ratio"), threshold
        )
        if e["verdict"] == "inverted-environment":
            e["note"] = (
                "isolated > ledger: environment degraded after the ledger "
                "ran; re-measure on a settled machine before acting"
            )
    summary = {
        "n_flagged": len(flagged),
        **{k: sum(e["verdict"] == k for e in flagged) for k in verdict_keys},
        "adjacent_runs": sum(e["adjacent_to_flagged"] for e in flagged),
    }
    result = {
        "ledger": ledger_path,
        "threshold": threshold,
        "runs_per_query": runs,
        "flagged": flagged,
        "summary": summary,
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
        fh.write("\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
