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
events.  `stateful_sessionize_event_time` adds the production-shape
event-time timeout: idle users' open sessions close when the watermark
passes last_ts + gap, keeping state bounded by ACTIVE users.
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


def _parse_gap_ms(gap: str) -> int:
    unit_ms = {
        "second": 1_000,
        "seconds": 1_000,
        "minute": 60_000,
        "minutes": 60_000,
        "hour": 3_600_000,
        "hours": 3_600_000,
        "day": 86_400_000,
        "days": 86_400_000,
    }
    qty, unit = gap.split()
    if unit not in unit_ms:
        raise ValueError(
            f"unsupported gap unit {unit!r} in {gap!r}; one of {sorted(set(unit_ms))}"
        )
    return int(qty) * unit_ms[unit]


def _sessionizer(gap_ms: int, event_time_timeout: bool = False):
    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if event_time_timeout and state.hasTimedOut:
            # watermark passed start+gap of the open session: close it
            if state.exists:
                start, last, n, total = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_start": [pd.Timestamp(start, unit="us")],
                        "session_end": [pd.Timestamp(last, unit="us")],
                        "n_events": [n],
                        "sum_value": [total],
                    }
                )
            return
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
        if event_time_timeout and last is not None:
            # close the open session once the watermark passes last+gap
            state.setTimeoutTimestamp((last // 1_000) + gap_ms)
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

    gap_ms = _parse_gap_ms(gap)
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionizer(gap_ms),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_sessionize_event_time(
    events: DataFrame, gap: str = "30 minutes", watermark_delay: str = "1 minute"
) -> DataFrame:
    """`stateful_sessionize` plus an EVENT-TIME TIMEOUT: when the
    watermark passes (last event + gap), the open session is closed and
    emitted from the timeout callback — so idle users' final sessions
    drain instead of sitting in state forever.  This is the
    production-shape variant: state size stays bounded by ACTIVE users,
    not all users ever seen (the difference between a capped and an
    ever-growing state store on an unbounded stream).

    Streaming-only (timeouts need a watermark; batch inputs should use
    the session_window/lag-cumsum paths).  On a bounded input every
    session whose (last_ts + gap) precedes the final watermark
    (max_ts - delay) is emitted; only sessions still inside that
    horizon stay open — the property the test pins.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_ms = _parse_gap_ms(gap)
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionizer(gap_ms, event_time_timeout=True),
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def ewma_by_key(
    df,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.5,
):
    """Per-key exponentially weighted moving average — the classic
    RECURSIVE per-key scan (e_t = (1-a)·e_{t-1} + a·x_t, adjust=False)
    that window functions cannot express directly.  One applyInPandas
    group per key: rows sort by `order_cols` inside the group and fold
    sequentially (pandas ewm, vectorized C loop), so state never
    crosses keys and the shuffle is exactly one partition-by-key.

    Returns (key, last_ewma, n_events).  The closed form
        e_T = (1-a)^(T-1)·x_1 + a·Σ_{i>1} (1-a)^(T-i)·x_i
    gives any SQL engine an independent recomputation path (used by
    the q_ewma oracle)."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            df.schema[key_col],
            T.StructField("last_ewma", T.DoubleType()),
            T.StructField("n_events", T.LongType()),
        ]
    )

    def _fold(key, pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_cols, kind="mergesort")
        e = pdf[value_col].astype("float64").ewm(alpha=alpha, adjust=False).mean()
        return pd.DataFrame(
            {key_col: [key[0]], "last_ewma": [float(e.iloc[-1])], "n_events": [len(pdf)]}
        )

    return df.select(key_col, *order_cols, value_col).groupBy(key_col).applyInPandas(
        _fold, out_schema
    )
