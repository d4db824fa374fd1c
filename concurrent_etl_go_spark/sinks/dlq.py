"""DLQ replay — startup recovery for spilled batches.

Reference (etl/main.go:311-340): glob ``buffer_failed_worker*.json.gz``,
decode, re-enqueue, delete after enqueue. Engine deviations (SURVEY
§7.4.2/3, both strengthen durability):

- spill files have unique names (no overwrite loss),
- files are deleted only AFTER the run's sink acks (``clear_dlq`` is called
  by the orchestrator post-run, not at read time).

Replayed rows are just another source: ``read_dlq(...).unionByName(fresh)``.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def dlq_files(dlq_dir: str) -> list[str]:
    """S20's glob: every spilled batch file."""
    return sorted(glob.glob(os.path.join(dlq_dir, "buffer_failed_worker*.json.gz")))


def read_dlq(spark: SparkSession, dlq_dir: str, schema: T.StructType) -> DataFrame:
    """Read all spilled batches (S20/S21). ``spark.read.json`` decompresses
    ``.gz`` transparently; the explicit schema avoids inference. Returns an
    empty DataFrame of the right schema when the DLQ is empty."""
    files = dlq_files(dlq_dir)
    if not files:
        return spark.createDataFrame([], schema)
    # each file is a JSON *array* -> multiLine mode parses it as rows
    return spark.read.schema(schema).option("multiLine", "true").json(files)


def replay_union(fresh: DataFrame, dlq: DataFrame) -> DataFrame:
    """Replayed rows merge ahead of fresh data (implicit union, SURVEY
    §2.A.1 set-ops row)."""
    return dlq.unionByName(fresh)


def clear_dlq(paths: list[str]) -> None:
    """Delete spill files — call only after the sink acked the run that
    contained the replayed rows (stronger than the reference's
    delete-after-enqueue, etl/main.go:333-338)."""
    for path in paths:
        if os.path.exists(path):
            os.remove(path)
