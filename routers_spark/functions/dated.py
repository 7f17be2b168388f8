"""T6 dated range filter — tile-source time filtering
(libs/routers_tiles/src/query/range.rs:92-104): a timestamp is WITHIN a
DatedRange when its UTC DATE falls in the [start, end] range (inclusive or
exclusive per RangeType, range.rs:38-45) AND its weekday is in the allowed
set (0=Mon … 6=Sun, the reference's numbering, range.rs:76-84)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dated_range_col(ts: Column, start_date: str, end_date: str,
                    weekdays: list[int], inclusive: bool = True) -> Column:
    """Boolean Column: ts (timestamp) within the dated range. ``start_date``
    / ``end_date`` are 'YYYY-MM-DD' UTC dates; ``weekdays`` uses 0=Monday."""
    d = F.to_date(ts)
    if inclusive:
        in_dates = (d >= F.lit(start_date).cast("date")) & \
                   (d <= F.lit(end_date).cast("date"))
    else:
        in_dates = (d > F.lit(start_date).cast("date")) & \
                   (d < F.lit(end_date).cast("date"))
    # Spark weekday(): 0=Monday — the reference numbering directly
    return in_dates & F.weekday(ts).isin(weekdays)


def dated_range_sql(ts: str, start_date: str, end_date: str,
                    weekdays: list[int], inclusive: bool, dialect: str) -> str:
    """The same predicate as dialect-portable SQL text (DuckDB: isodow is
    1=Mon..7 → isodow-1 matches the 0=Mon contract)."""
    ge, le = (">=", "<=") if inclusive else (">", "<")
    days = ", ".join(str(w) for w in weekdays)
    if dialect == "duckdb":
        day = f"(isodow(CAST({ts} AS TIMESTAMP)) - 1)"
    else:
        day = f"weekday(CAST({ts} AS TIMESTAMP))"
    return (f"(CAST({ts} AS DATE) {ge} DATE '{start_date}' "
            f"AND CAST({ts} AS DATE) {le} DATE '{end_date}' "
            f"AND {day} IN ({days}))")
