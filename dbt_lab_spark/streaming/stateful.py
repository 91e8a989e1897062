"""Custom stateful streaming operator: applyInPandasWithState — the
"bring your own stateful operator" surface Structured Streaming offers
(the Spark analogue of the reference's custom-MapReduce-operator
extension hook, mapred/qexec/HadoopOperator.java:96-146, SURVEY.md §2.10
— only stateful and streaming, which the reference never had).

The example operator is a gap-based sessionizer with explicit state:
per user, an open session (start, last_ts, count, sum) lives in the
state store; an incoming event either extends it or closes it (gap >=
threshold) and emits the closed session.  This is the semantics
session_window() gives declaratively — implemented here imperatively to
exercise arbitrary-state plumbing (session_window can't express e.g.
"close after N events" or value-dependent gaps; this template can).

Scale posture: state is keyed by user_id — the shuffle key — and
bounded by one open session per user; Arrow batches carry each group's
events.  In production add an event-time timeout so idle users' last
sessions close when the watermark passes (timeout handling is a no-op
on the bounded test inputs, where the final session stays open by
design).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

SESSION_OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)
# open-session state: epoch-micros + running aggregates
_STATE_SCHEMA = "session_start long, last_ts long, n_events long, sum_value double"


def _to_micros(ts: pd.Timestamp) -> int:
    return int(ts.value // 1_000)  # pandas stores nanos


def _sessionizer(gap_ms: int):
    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        events = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None  # no open session
            n, total = 0, 0.0
        closed: list[tuple[int, int, int, float]] = []
        for ts, value in zip(events["ts"], events["value"]):
            t = _to_micros(ts)
            v = float(value) if pd.notna(value) else 0.0
            if start is None:
                start, last, n, total = t, t, 1, v
            elif t - last >= gap_ms * 1_000:
                closed.append((start, last, n, total))
                start, last, n, total = t, t, 1, v
            else:
                last, n, total = t, n + 1, total + v
        state.update((start, last, n, total))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "n_events": [c[2] for c in closed],
                    "sum_value": [c[3] for c in closed],
                }
            )

    return fn


def stateful_sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Sessionize an events frame (batch or stream) with explicit state.

    Emits CLOSED sessions only; each user's most recent session stays
    open in the state store awaiting further events (bounded inputs
    therefore emit all but the last session per user — the property the
    tests pin against the lag-cumsum batch sessionizer).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    unit_ms = {"minutes": 60_000, "minute": 60_000, "seconds": 1_000, "second": 1_000}
    qty, unit = gap.split()
    gap_ms = int(qty) * unit_ms[unit]
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionizer(gap_ms),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
