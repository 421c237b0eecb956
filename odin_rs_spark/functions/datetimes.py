"""Datetime column functions (SURVEY §2.9, odin_common/src/datetime.rs).

The reference standardizes on UTC epoch-millis wire format
(odin_common/src/datetime.rs:86-101) and hour/day truncation helpers
(:103-115). All are native Spark expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def epoch_millis(ts: Column | str) -> Column:
    """Timestamp → UTC epoch milliseconds (wire format, datetime.rs:86).
    FLOOR division, not truncation: chrono's timestamp_millis floors,
    so a pre-epoch timestamp with sub-ms precision (micros = -500) must
    map to -1, not 0 — cast('long') alone truncates toward zero."""
    return F.floor(F.unix_micros(_col(ts)) / F.lit(1000)).cast("long")


def from_epoch_millis(ms: Column | str) -> Column:
    return F.timestamp_millis(_col(ms).cast("long"))


def full_hour(ts: Column | str) -> Column:
    """Truncate to the containing hour (datetime.rs:103)."""
    return F.date_trunc("hour", _col(ts))


def day_start(ts: Column | str) -> Column:
    """Truncate to UTC midnight (datetime.rs:107)."""
    return F.date_trunc("day", _col(ts))


def minute_of_hour(ts: Column | str) -> Column:
    """Arrival minute within the hour — the key of the reference's learned
    availability schedules (odin_common/src/schedule.rs:35-95)."""
    return F.minute(_col(ts))


def with_hms(ts: Column | str, h: int, m: int, s: int) -> Column:
    """Same date, fixed time-of-day (datetime.rs:111)."""
    return F.date_trunc("day", _col(ts)) + F.make_dt_interval(
        hours=F.lit(h), mins=F.lit(m), secs=F.lit(float(s))
    )


def elapsed_seconds(start: Column | str, end: Column | str) -> Column:
    """Signed elapsed seconds with sub-second precision
    (datetime.rs:116-139)."""
    return (F.unix_micros(_col(end)) - F.unix_micros(_col(start))) / F.lit(1e6)


def parse_flexible(ts_str: Column | str) -> Column:
    """Best-effort datetime parse over the formats the reference accepts
    (RFC3339 with/without fraction, space-separated, date-only;
    datetime.rs:247-262). NULL when nothing matches (try_* semantics,
    never throws under ANSI mode)."""
    c = _col(ts_str)
    return F.coalesce(
        F.try_to_timestamp(c),  # ISO / Spark-default forms
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
        F.try_to_timestamp(c, F.lit("yyyy/MM/dd HH:mm:ss")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd")),
    )
