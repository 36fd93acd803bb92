"""Reference timestamp formats.

The reference parses ``'02.01.2006 15:04:05'`` (Go layout → dd.MM.yyyy
HH:mm:ss) for trades/candles and ``'02.01.2006'`` for sec-info dates,
and formats ``'2006-01-02 15:04:05'`` on write
(``/root/reference/db.go:13-15``, parsed at ``db.go:125,140-142`` and
``process.go:109-111``).

Divergence (deliberate, SURVEY §7.4): the reference silently maps parse
failures to the zero time (year 1); we yield NULL — stricter and
queryable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

REF_DATETIME_FMT = "dd.MM.yyyy HH:mm:ss"  # db.go:13
REF_DATE_FMT = "dd.MM.yyyy"  # db.go:14
REF_OUT_FMT = "yyyy-MM-dd HH:mm:ss"  # db.go:15


def parse_ref_datetime(col: Column | str) -> Column:
    """``'dd.MM.yyyy HH:mm:ss'`` → timestamp (NULL on failure)."""
    return F.try_to_timestamp(F.col(col) if isinstance(col, str) else col, F.lit(REF_DATETIME_FMT))


def parse_ref_date(col: Column | str) -> Column:
    """``'dd.MM.yyyy'`` → timestamp at midnight (NULL on failure)."""
    return F.try_to_timestamp(F.col(col) if isinstance(col, str) else col, F.lit(REF_DATE_FMT))


def format_ref_datetime(col: Column | str) -> Column:
    """Timestamp → ``'yyyy-MM-dd HH:mm:ss'`` string (db.go:15)."""
    return F.date_format(F.col(col) if isinstance(col, str) else col, REF_OUT_FMT)
