"""Stream-stream joins (SURVEY §2.4 J3/J4 in live form).

The reference resolves evidence references against an in-memory record
store as updates arrive (odin_sentinel/src/alarm.rs:276-338); with two
live streams that becomes a watermarked stream-stream join: each side
buffers only the rows its watermark still allows, and the time-range
condition bounds how long a row can wait for its match — so join state
is O(rate × window), never unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Inner stream-stream join on a key where the right event falls in
    [left_ts − window, left_ts]: the classic enrichment shape (alarm ←
    recent evidence records, observation ← latest calibration).

    Both sides carry the watermark and the time-range lives INSIDE the
    join condition — that is what lets Spark derive a state-retention
    bound for BOTH buffers (a post-join filter would leave the right
    buffer unbounded). `right_ts` must differ from `left_ts`; rename
    upstream. The key column is kept once (from the left side).
    """
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {window}")
        )
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
    )
    return lw.join(rw, cond, "inner").drop(F.col(f"r.{on}"))
