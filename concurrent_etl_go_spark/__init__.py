"""concurrent_etl_go_spark — a PySpark-native analytics/ETL engine.

Brand-new engine with the query and data-processing capabilities of the
reference repo ``ravishankarsrrav/concurrent-etl-go`` (a concurrent Go ETL
pipeline: CSV scan -> fan-out fetch -> transform -> hash route -> micro-batch
-> HTTP sink with gzip-JSON DLQ spill/replay), re-expressed Spark-first:

- the reference's goroutine/channel dataflow becomes one lazy DataFrame chain
  (Catalyst plans it; stages pipeline; the single route shuffle replaces the
  channel fan-in),
- the generalized relational surface (joins/aggs/windows/set-ops/scalars) is
  plain ``pyspark.sql`` — no custom Catalyst rules,
- LLM-data-pipeline extensions (dedup, similarity search, text analysis,
  multimodal columns) are compositions of built-ins with Pandas UDFs only
  where built-ins genuinely cannot express the semantics.

See SURVEY.md for the full reference->Spark mapping with file:line citations.
"""

from concurrent_etl_go_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
