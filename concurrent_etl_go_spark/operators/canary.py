"""Float-representation canary query.

Round 4's only driver failure was not a math bug: DuckDB's
``ROUND(x, 4)`` keeps IEEE-754 ``-0.0`` when a tiny negative rounds to
zero, Spark's emits ``+0.0``, and the driver's bit-exact value hash saw
a mismatch that every ``==``-based comparison (including ``-0.0 ==
0.0``) is blind to.  This canary exists so any FUTURE engine/oracle
float-representation drift — signed zeros, NULL placement, NaN
canonicalization — trips one purpose-built row instead of a random
production query.

It deliberately manufactures the dangerous cases on both sides:

- differences that round to zero from BOTH signs (``l_discount - 0.05``
  spans negative and positive), canonicalized with the ``+ 0.0`` idiom
  (IEEE ``-0.0 + 0.0 = +0.0``) that every production oracle now uses;
- a NULL / NaN / finite three-way mix in one double column (NaN must
  hash as the canonical quiet NaN on both engines, and NULL must stay
  distinct from NaN).

``tests/test_registry_sanity.py`` additionally proves the canary is
LIVE: the un-canonicalized Spark/DuckDB forms genuinely disagree in
sign bit at sf0.001, so a silent regression of the idiom cannot pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table


@query(
    "scalar_float_canary",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND((l_discount - 0.05) * 0.001, 4) + 0.0 AS near_zero,
           CASE WHEN l_discount < 0.02 THEN NULL
                WHEN l_discount > 0.08 THEN 'NaN'::DOUBLE
                ELSE ROUND(l_tax - l_discount, 4) + 0.0
           END AS mixed
    FROM lineitem
    WHERE l_orderkey % 97 = 0
    """,
)
def scalar_float_canary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed-zero / NULL / NaN representation canary (see module doc).

    ``near_zero`` rounds tiny magnitudes of both signs to zero;
    ``mixed`` interleaves NULL, NaN, and small signed differences.
    Map-side only — zero shuffles; the ``% 97`` filter keeps the row
    count small and pushes down to the scan.
    """
    li = read_table(spark, sf_dir, "lineitem")
    disc = F.col("l_discount")
    return li.where(F.col("l_orderkey") % 97 == 0).select(
        "l_orderkey",
        "l_linenumber",
        (F.round((disc - 0.05) * 0.001, 4) + F.lit(0.0)).alias("near_zero"),
        F.when(disc < 0.02, F.lit(None).cast("double"))
        .when(disc > 0.08, F.lit(float("nan")))
        .otherwise(F.round(F.col("l_tax") - disc, 4) + F.lit(0.0))
        .alias("mixed"),
    )
