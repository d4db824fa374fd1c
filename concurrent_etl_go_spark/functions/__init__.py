from concurrent_etl_go_spark.functions.casts import cast_null, cast_zero_default
from concurrent_etl_go_spark.functions.indicators import (
    explode_indicators,
    pack_indicators,
)
from concurrent_etl_go_spark.functions.scalars import worker_id_from_filename

__all__ = [
    "cast_null",
    "cast_zero_default",
    "explode_indicators",
    "pack_indicators",
    "worker_id_from_filename",
]
