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
    """Timestamp → UTC epoch milliseconds (wire format, datetime.rs:86)."""
    return (F.unix_micros(_col(ts)) / F.lit(1000)).cast("long")


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
