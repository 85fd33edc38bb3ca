"""DateTools — the reference's sortable date-string codec
(``lucene/core/src/java/org/apache/lucene/document/DateTools.java``):
dates index as zero-padded UTC strings ("yyyyMMddHHmmssSSS" truncated
to a Resolution), so lexicographic term order == chronological order
and TermRangeQuery doubles as a date-range query.

Both a driver-side Python API (for query construction) and Spark
Column expressions (for indexing pipelines) share one format table, so
an indexed column and a query literal always agree."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Column, functions as F

# resolution -> (string length, strftime pattern, Spark format)
_RES = {
    "year": (4, "%Y", "yyyy"),
    "month": (6, "%Y%m", "yyyyMM"),
    "day": (8, "%Y%m%d", "yyyyMMdd"),
    "hour": (10, "%Y%m%d%H", "yyyyMMddHH"),
    "minute": (12, "%Y%m%d%H%M", "yyyyMMddHHmm"),
    "second": (14, "%Y%m%d%H%M%S", "yyyyMMddHHmmss"),
    "millisecond": (17, None, None),  # strftime lacks %3f; handled below
}


def date_to_string(dt: datetime, resolution: str = "second") -> str:
    """UTC sortable string truncated to ``resolution``
    (``DateTools.dateToString``).  Naive datetimes are taken as UTC."""
    if resolution not in _RES:
        raise ValueError(f"unknown resolution '{resolution}' "
                         f"(one of {sorted(_RES)})")
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc)
    if resolution == "millisecond":
        return dt.strftime("%Y%m%d%H%M%S") + f"{dt.microsecond // 1000:03d}"
    return dt.strftime(_RES[resolution][1])


def string_to_date(s: str) -> datetime:
    """Inverse of :func:`date_to_string` at any resolution
    (``DateTools.stringToDate``): missing components floor to their
    minimum, result is UTC."""
    n = len(s)
    if n not in {ln for ln, _, _ in _RES.values()}:
        raise ValueError(f"unparseable date string '{s}'")
    pad = s + "00010101000000000"[n:]  # floor: month/day -> 01, rest 0
    return datetime(int(pad[0:4]), int(pad[4:6]), int(pad[6:8]),
                    int(pad[8:10]), int(pad[10:12]), int(pad[12:14]),
                    int(pad[14:17]) * 1000, tzinfo=timezone.utc)


def date_col_to_string(col: Column, resolution: str = "second") -> Column:
    """Spark twin of :func:`date_to_string` for indexing pipelines —
    identical strings for identical instants (UTC)."""
    if resolution not in _RES:
        raise ValueError(f"unknown resolution '{resolution}'")
    utc = F.to_utc_timestamp(col, "UTC")
    if resolution == "millisecond":
        return F.concat(F.date_format(utc, "yyyyMMddHHmmss"),
                        F.lpad((F.floor(F.unix_millis(utc) % 1000))
                               .cast("string"), 3, "0"))
    return F.date_format(utc, _RES[resolution][2])


def round_down(dt: datetime, resolution: str = "second") -> datetime:
    """``DateTools.round``: truncate an instant to the resolution."""
    return string_to_date(date_to_string(dt, resolution))
