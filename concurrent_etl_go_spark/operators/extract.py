"""Per-row enrichment fetch — the reference's extract stage (S4/S5/S6).

Reference (etl/main.go:188-207): for each appliance, fetch CpuStats from
the device with a context deadline (delay + 2 s); fetch errors drop the row
with a log line (etl/main.go:134-138).

Engine restatement: a pluggable ``Extractor`` executed inside
``mapInPandas`` — executor-side, batch-at-a-time, never a driver loop. The
fetch returns ``(payload..., error)``; a quarantine split routes failed
rows to their own DataFrame instead of silently dropping (the drop remains
one ``where`` away for strict parity). The semaphore fan-out cap (S13,
1000 goroutines) maps to partition count x cores: ``repartition(k)``
upstream sets effective concurrency.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Output shape: CpuStats fields + error column (None == success).
EXTRACT_RESULT = T.StructType(
    [
        T.StructField("name", T.StringType(), True),
        T.StructField("timestamp", T.LongType(), True),
        T.StructField("cpu_number", T.StringType(), True),
        T.StructField("p_idle", T.StringType(), True),
        T.StructField("p_user", T.StringType(), True),
        T.StructField("p_sys", T.StringType(), True),
        T.StructField("p_irq", T.StringType(), True),
        T.StructField("p_nice", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)

FetchFn = Callable[[str, str], dict]


@dataclass(frozen=True)
class ExtractorConfig:
    """Reference constants: 6 s simulated delay, +2 s deadline margin,
    1000-way fan-out (etl/main.go:60,65,189-190).

    ``concurrency`` is the per-partition thread-pool width. The reference's
    semaphore allows 1000 in-flight fetches; Spark tasks are thread-bound,
    so sleeping 6 s per row serially would take partitions x cores x 6 s.
    The per-partition pool restores the fan-out: total in-flight =
    partitions x concurrency (e.g. 32 partitions x 32 threads ~ 1000) —
    which is also the right production design for high-latency I/O
    enrichment (connection pool per partition, not per row)."""

    timeout_s: float = 8.0
    simulate_delay_s: float = 0.0
    concurrency: int = 32


def synthetic_fetch(ip: str, hostname: str) -> dict:
    """Deterministic stand-in for the reference's canned CpuStats response
    (etl/main.go:195-203): stringly-typed numerics, cpu '0'."""
    seed = sum(ip.encode()) % 100
    return {
        "cpu_number": "0",
        "p_idle": str(seed),
        "p_user": "1.5",
        "p_sys": "2",
        "p_irq": "0.5",
        "p_nice": "3",
    }


def run_extract(
    appliances: DataFrame,
    fetch_fn: FetchFn = synthetic_fetch,
    config: ExtractorConfig = ExtractorConfig(),
    clock: Callable[[], int] | None = None,
) -> DataFrame:
    """Fetch per appliance inside ``mapInPandas`` (S4), stamping the extract
    timestamp (etl/main.go:202) and enforcing the per-call deadline (S5).
    Fetch failures become error rows instead of exceptions."""
    clock = clock or (lambda: int(time.time()))
    timeout_s = config.timeout_s
    delay_s = config.simulate_delay_s
    concurrency = max(1, config.concurrency)

    def fetch_one(ip: str, hostname: str) -> dict:
        start = time.monotonic()
        row = {
            "name": hostname,
            "timestamp": clock(),
            "cpu_number": None,
            "p_idle": None,
            "p_user": None,
            "p_sys": None,
            "p_irq": None,
            "p_nice": None,
            "error": None,
        }
        try:
            if delay_s:
                time.sleep(delay_s)
            payload = fetch_fn(ip, hostname)
            if time.monotonic() - start > timeout_s:
                raise TimeoutError(f"fetch exceeded {timeout_s}s deadline")
            row.update(payload)
        except Exception as exc:  # noqa: BLE001 — quarantine, don't fail task
            row["error"] = f"{type(exc).__name__}: {exc}"
        return row

    def fetch_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=concurrency) as pool:
            for pdf in it:
                out = list(pool.map(fetch_one, pdf["ip"], pdf["hostname"]))
                yield pd.DataFrame(
                    out, columns=[f.name for f in EXTRACT_RESULT]
                )

    return appliances.mapInPandas(fetch_batches, EXTRACT_RESULT)


def quarantine_split(extracted: DataFrame) -> tuple[DataFrame, DataFrame]:
    """S6: split fetch results into (ok, quarantined). The reference drops
    failures after logging (etl/main.go:134-138); the engine keeps them
    addressable."""
    ok = extracted.where(F.col("error").isNull()).drop("error")
    failed = extracted.where(F.col("error").isNotNull())
    return ok, failed
