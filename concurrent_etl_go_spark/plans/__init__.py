from concurrent_etl_go_spark.plans.etl_pipeline import (
    device_pipeline,
    flagship,
    transform_cpu_stats,
)

__all__ = ["device_pipeline", "flagship", "transform_cpu_stats"]
