"""Misc scalar helpers mirroring reference string/parse semantics."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def worker_id_from_filename(col: Column | str) -> Column:
    """Parse the worker id out of a DLQ spill filename (S22 parity).

    The reference splits on the literal ``"worker"`` and trims ``.json.gz``,
    falling back to worker 0 when the parse fails (reference
    etl/main.go:361-372). ``regexp_extract`` returns '' on no-match, which
    casts to null; coalesce reproduces the fallback-to-0.
    """
    c = F.col(col) if isinstance(col, str) else col
    extracted = F.nullif(
        F.regexp_extract(c, r"worker(\d+)\.json\.gz$", 1), F.lit("")
    )
    return F.coalesce(extracted.try_cast("int"), F.lit(0))
