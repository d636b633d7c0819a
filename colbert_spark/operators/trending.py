"""Burst / trending detection over an event stream (batch form).

Per (event_type, tumbling window): the count's z-score against the
type's trailing baseline — the standard "trending now" detector
(Kleinberg-style burst signal reduced to rolling mean/stddev, what a
search frontend runs over query logs and a crawler runs over URL
discovery rates). The reference has no temporal surface; the events
table (TESTDATA.md) is the stream stand-in.

Scoring contract (replayed by the DuckDB oracle):

    z = (n_w − mean_trailing) / stddev_trailing

over the `trail` preceding windows (exclusive), stddev the SAMPLE
stddev; windows with fewer than `min_trail` preceding windows or zero
variance emit NULL z (not a burst verdict). Counts and z round-6.

Plan shape: one map-side-combinable (type, window) count, then a
per-type window frame over the (tiny) per-window count table — the
frame runs over #windows rows per type, never event rows. At 10^12
events the count agg is the only corpus-sized exchange (uniform
(type, window) keys).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def window_burst_scores(
    events: DataFrame,
    window_seconds: int = 3600,
    trail: int = 6,
    min_trail: int = 3,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """events(ts, event_type, ...) → (event_type, win_start, n, z).

    win_start = floor(epoch(ts) / window_seconds) · window_seconds as a
    BIGINT epoch (engine-portable; no timezone surface).
    """
    win = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(window_seconds))
        * F.lit(window_seconds)
    ).cast("long")
    counts = (
        events.select(F.col(type_col).alias("event_type"),
                      win.alias("win_start"))
        .groupBy("event_type", "win_start")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    fw = (
        Window.partitionBy("event_type").orderBy("win_start")
        .rowsBetween(-trail, -1)
    )
    scored = counts.select(
        "event_type", "win_start", F.col("n").cast("long").alias("n"),
        F.avg("n").over(fw).alias("_mu"),
        F.stddev_samp("n").over(fw).alias("_sd"),
        F.count("n").over(fw).alias("_nt"),
    )
    return scored.select(
        "event_type", "win_start", "n",
        F.when(
            (F.col("_nt") >= min_trail) & (F.col("_sd") > 0),
            F.round((F.col("n") - F.col("_mu")) / F.col("_sd"), 6),
        ).alias("z"),
    )
