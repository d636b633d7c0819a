"""Sessionization — gap-based session assignment over event streams.

Batch form: pure window functions (lag → gap flag → cumulative sum), fully
SQL-expressible (oracle-checked as `events_sessionized`).

Streaming form: applyInPandasWithState — the custom-stateful-operator
escape hatch for semantics Structured Streaming's built-ins can't express
(a session closes only when the NEXT event or a timeout says so). State
per user_id: (last_ts, session_id, session_start). Timeout closes idle
sessions. Both forms share the same gap rule, so a backfill and the live
stream agree.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MIN = 30

SESSION_SCHEMA = (
    "user_id long, session_id long, session_start timestamp_ntz, "
    "n_events long, sum_value double"
)


def sessionize_batch(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN,
                     user_col: str = "user_id", ts_col: str = "ts",
                     tiebreak_col: str | None = "event_id") -> DataFrame:
    """(user_id, session_id, session_start, n_events, sum_value): gap-based
    sessions. session_id is the 0-based session index per user (ordered by
    time) — deterministic and engine-neutral.

    Ties: duplicate (user, ts) pairs make lag()'s order nondeterministic, so
    the window orders by (ts, tiebreak_col) when a tiebreak column exists —
    any oracle must order identically. The running sum is pinned to a ROWS
    frame (Spark's orderBy default is RANGE, which would lump tied rows)."""
    order = [ts_col]
    if tiebreak_col is not None and tiebreak_col in events.columns:
        order.append(tiebreak_col)
    w = Window.partitionBy(user_col).orderBy(*order)
    wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sec = F.unix_micros(F.col(ts_col).cast("timestamp")) / 1_000_000.0
    gap = sec - F.lag(sec).over(w)
    flagged = events.withColumn(
        "_new", F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    )
    numbered = flagged.withColumn(
        "session_id", F.sum("_new").over(wrows) - 1
    )
    return (
        numbered.groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def sessionize_stream(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN,
                      user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Streaming sessionization with applyInPandasWithState.

    Emits a row per CLOSED session (closed by a later event or by state
    timeout). Event-time ordering within a micro-batch is handled by
    sorting the batch; cross-batch ordering rides on the state.
    """
    gap = dt.timedelta(minutes=gap_minutes)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            last_ts, sid, start, n, sv = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, sid, start, n, sv)],
                columns=["user_id", "session_id", "session_start",
                         "n_events", "sum_value"],
            )
            return
        rows = pd.concat(list(pdfs))
        sort_cols = [ts_col] + (["event_id"] if "event_id" in rows else [])
        rows = rows.sort_values(sort_cols, kind="mergesort")
        if state.exists:
            last_ts, sid, start, n, sv = state.get
            last_ts = pd.Timestamp(last_ts)
            start = pd.Timestamp(start)
        else:
            last_ts, sid, start, n, sv = None, -1, None, 0, 0.0
        closed = []
        for ts, value in zip(rows[ts_col], rows["value"]):
            ts = pd.Timestamp(ts)
            if last_ts is None or (ts - last_ts) > gap:
                if sid >= 0:
                    closed.append((user_id, sid, start, n, round(sv, 2)))
                sid += 1
                start, n, sv = ts, 0, 0.0
            n += 1
            sv += float(value)
            last_ts = ts
        state.update((last_ts.to_pydatetime(), sid, start.to_pydatetime(),
                      n, sv))
        state.setTimeoutDuration(gap_minutes * 60 * 1000)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_id", "session_start",
                         "n_events", "sum_value"],
            )

    return (
        events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA.replace("timestamp_ntz", "timestamp"),
            stateStructType=(
                "last_ts timestamp, sid long, start timestamp, n long, sv double"
            ),
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
