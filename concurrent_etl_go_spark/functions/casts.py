"""Cast helpers.

The reference discards ``strconv.ParseFloat`` errors, so a malformed numeric
string becomes **0.0**, not null (reference etl/main.go:214-218; SURVEY
§7.4.1). Spark's bare ``cast('double')`` yields null on failure, so parity
requires a coalesce. Both modes are exposed; queries choose explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cast_zero_default(col: Column | str, dtype: str = "double") -> Column:
    """Cast with the reference's zero-on-failure semantics (S7 parity).

    Uses ``try_cast`` so the behavior is identical whether or not ANSI mode
    is enabled (Spark 4 defaults to ANSI, where a bare cast would *throw* on
    malformed input instead of yielding null).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.try_cast(dtype), F.lit(0).cast(dtype))


def cast_null(col: Column | str, dtype: str = "double") -> Column:
    """Null-on-failure cast (the engine's SQL-surface default mode)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(dtype)
