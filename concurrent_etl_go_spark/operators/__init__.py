"""Operator library + query registry.

Each module registers named queries via ``registry.query``; the driver
contract (``__spark_entry__.py``) aggregates them. Importing this package
loads every query module.
"""

from concurrent_etl_go_spark.operators import (  # noqa: F401
    attribution,
    canary,
    cdc,
    concentration,
    etl_queries,
    experiments,
    experiments2,
    experiments3,
    experiments4,
    finance,
    finance2,
    finance3,
    finance4,
    finance5,
    forecast,
    graph,
    graph2,
    graph3,
    graph4,
    graph5,
    graph6,
    layout,
    ml_primitives,
    privacy,
    profiling,
    quantiles,
    recommender,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    relational7,
    relational8,
    relational9,
    relational10,
    relational11,
    relational12,
    relational13,
    robust_stats,
    retail,
    retail2,
    retail3,
    retail4,
    retail5,
    scalars2,
    search,
    search2,
    sketches,
    sketches2,
    skew,
    slo,
    stats_tests,
    stats_tests2,
    stats_tests3,
    stats_tests4,
    survival,
    timeseries,
    timeseries2,
    timeseries3,
    vtable,
    warehouse,
    scalars_queries,
    time_windows,
)
from concurrent_etl_go_spark import llm  # noqa: F401  (registers llm queries)
from concurrent_etl_go_spark.operators.registry import (
    ORACLES,
    QUERIES,
    run_oracle_finalizers,
)

# late-bound oracle composition (needs operators.search fully loaded);
# drains the registered finalizers eagerly so even ``dict(ORACLES)``'s
# C-level fast path sees finalized SQL
run_oracle_finalizers()

__all__ = ["QUERIES", "ORACLES"]
