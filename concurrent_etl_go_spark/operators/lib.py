"""Reusable relational operators the engine exposes beyond raw DataFrame ops.

Each helper is a thin, Catalyst-friendly composition of built-ins — no UDFs,
no driver-side materialization — so every one of them survives a 100 TB
scale-up: shuffles only on declared keys, window functions partition by the
group key, small sides are broadcast by hint or by AQE.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parallelize_narrow_scan(df: DataFrame, *key_cols: str) -> DataFrame:
    """Hash-repartition ``df`` by ``key_cols`` when its scan yields
    fewer partitions than the session's parallelism.  The shared
    testdata parquets are single-row-group files, so a scan (and every
    map-side partial aggregation fused onto it) runs as ONE task —
    the optimization guide's §2.5 'one huge unsplittable file:
    repartition immediately after the read'.  At production scale the
    scan already produces >= parallelism partitions and this returns
    ``df`` unchanged — no exchange is added, and map-side partial
    aggregation keeps its shuffle-byte reduction.

    Contract: pass SCAN+PROJECT frames only.  ``df.rdd`` finalizes the
    plan, so a ``df`` containing exchanges would eagerly execute its
    query stages inside this plan-building helper (current callers all
    pass bare reads).  The keyed ``repartition`` produces
    ``spark.sql.shuffle.partitions`` partitions (AQE-coalescible); the
    guard compares against ``defaultParallelism``, assuming the session
    keeps ``shuffle_partitions >= defaultParallelism`` (bench/driver
    sessions set both to the core count)."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(*[F.col(c) for c in key_cols])
    return df


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number over a deterministic order.

    ``order_cols`` must be a total order (include a tie-break key) so results
    are reproducible across engines and runs. One shuffle on ``group_cols``.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
        .drop(rank_col)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_tiebreak: str,
) -> DataFrame:
    """As-of join: latest right row with right_time <= left_time per left row.

    Spark has no native as-of join; this is the equi-join + window form:
    join on the key with a range predicate, then keep the most recent right
    row per left row (``right_tiebreak`` makes ties deterministic). The
    equi-key keeps the join a hash/sort-merge join — the range predicate is
    a post-join filter, so no cartesian blow-up beyond the key match.
    """
    # rank per LEFT ROW, not per (key, time): two left rows sharing both
    # would otherwise collapse into one window partition and lose a match
    tagged = left.withColumn("__rid", F.monotonically_increasing_id())
    joined = tagged.join(
        right,
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_time) <= F.col(left_time)),
        "inner",
    )
    w = Window.partitionBy("__rid").orderBy(
        F.col(right_time).desc(), F.col(right_tiebreak).desc()
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__rid")
    )


def asof_join_merge(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_tiebreak: str,
    how: str = "inner",
    direction: str = "backward",
) -> DataFrame:
    """Bounded as-of join: co-partition both sides on the key, then run a
    two-cursor sorted merge (``pd.merge_asof``) per key group.

    ``direction='backward'`` (default) matches the LATEST right row with
    ``right_time <= left_time`` (ties -> largest ``right_tiebreak``);
    ``direction='forward'`` matches the EARLIEST right row with
    ``right_time > left_time`` — strictly greater, so composing one
    backward and one forward pass partitions the candidates and never
    double-counts an exact-time match — with ties -> smallest
    ``right_tiebreak`` (the first qualifying row in (time, tiebreak)
    ascending order). ``join_asof_nearest`` builds nearest-match
    semantics from the two passes.

    The rank-based ``asof_join`` above materializes
    |left_rows(k)| x |right_rows(k)| intermediate rows per key k before its
    rank filter — correct, but a hot key explodes the shuffle at 100 TB.
    Here both sides are tagged, unioned, hash-partitioned ONCE on the key,
    and each shuffle partition runs a single vectorized
    ``pd.merge_asof(by=key)`` (one two-cursor pass over the whole
    partition), so the intermediate never exceeds the partition's left row
    count: a hot key costs O(L log L + R log R), not O(L*R). One Python
    call per PARTITION, not per key — per-key ``applyInPandas`` pays
    frame-construction overhead per group (measured 18x slower on a 15k-key
    table). Arrow-batched ``mapInPandas`` is the documented escape hatch
    for semantics Catalyst can't express without the blow-up (Spark has no
    native as-of join).

    Tie semantics match ``asof_join``: latest ``right_time <= left_time``
    wins, ties broken by the largest ``right_tiebreak`` (the right side is
    mergesort-ordered by (time, tiebreak) and ``merge_asof`` takes the
    last qualifying row per key). ``how='left'`` keeps unmatched left rows
    with nulls.

    Reference analog: the routed-stream join pattern (etl/main.go:143-145)
    — co-locate rows by key into a lane, then stream within the lane.
    """
    import pandas as pd

    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}"
        )
    left_cols = list(left.columns)
    right_names = list(right.columns)
    dup = set(left_cols) & set(right_names)
    if dup:
        raise ValueError(f"ambiguous columns across as-of sides: {sorted(dup)}")
    # every output field nullable: how='left' emits nulls on the right side
    # even when the source fields are non-nullable (e.g. built from range())
    out_schema = T.StructType(
        [
            T.StructField(f.name, f.dataType, True)
            for f in list(left.schema.fields) + list(right.schema.fields)
        ]
    )
    out_cols = left_cols + right_names

    # Tag and stack both sides so ONE hash shuffle co-locates each key's
    # rows; the other side's columns ride along as nulls.
    lnull = [F.lit(None).cast(f.dataType).alias(f.name) for f in right.schema.fields]
    rnull = [F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema.fields]
    stacked = left.select(
        F.lit(0).alias("__side"),
        F.col(left_key).alias("__key"),
        *left_cols,
        *lnull,
    ).unionByName(
        right.select(
            F.lit(1).alias("__side"),
            F.col(right_key).alias("__key"),
            *rnull,
            *right_names,
        )
    )
    parts = stacked.repartition(F.col("__key"))

    def _sortable(s: "pd.Series") -> "pd.Series":
        # merge_asof needs an ordered numeric/datetime key; date columns
        # arrive as object dtype (datetime.date), so coerce — midnight
        # timestamps match Spark's date->timestamp comparison cast (UTC).
        return s if pd.api.types.is_numeric_dtype(s) else pd.to_datetime(s)

    def _empty() -> "pd.DataFrame":
        # object dtype, not the float64 default — Arrow can cast empty
        # object arrays to any field type, but not double->timestamp
        return pd.DataFrame({c: pd.Series([], dtype="object") for c in out_cols})

    def merge_partition(batches) -> "pd.DataFrame":
        pdfs = list(batches)
        if not pdfs:
            yield _empty()
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        lpdf = pdf[pdf["__side"] == 0]
        rpdf = pdf[pdf["__side"] == 1]
        # Null time keys crash pd.merge_asof ("merge keys contain null
        # values"), so split them out first under the join's null
        # semantics: a null time never satisfies <=, so null-time right
        # rows can never match anything (dropped), and null-time left
        # rows match nothing (kept with null right columns when
        # how='left' — the stacked frame already carries right columns
        # as nulls on left-side rows).
        rpdf = rpdf[rpdf[right_time].notna()]
        null_left = lpdf[lpdf[left_time].isna()]
        lpdf = lpdf[lpdf[left_time].notna()]
        unmatched = null_left if how == "left" else null_left.iloc[0:0]
        if lpdf.empty or rpdf.empty:
            if how == "left":
                out = pd.concat([unmatched, lpdf], ignore_index=True)
                yield out[out_cols] if len(out) else _empty()
            else:
                yield _empty()
            return
        # merge_asof(by=) needs both frames globally sorted on the time
        # key; equal-time order is preserved (mergesort), so sorting the
        # right side by (time, tiebreak) makes backward's "last
        # qualifying row per key" the max-tiebreak row and forward's
        # "first qualifying row" the min-tiebreak row.
        lpdf = lpdf.assign(__lt=_sortable(lpdf[left_time])).sort_values(
            "__lt", kind="mergesort"
        )
        rpdf = rpdf.assign(__rt=_sortable(rpdf[right_time])).sort_values(
            ["__rt", right_tiebreak], kind="mergesort"
        )
        merged = pd.merge_asof(
            lpdf[["__key", "__lt", *left_cols]],
            rpdf[["__key", "__rt", *right_names]],
            left_on="__lt",
            right_on="__rt",
            by="__key",
            direction=direction,
            allow_exact_matches=(direction == "backward"),
        )
        if how == "inner":
            merged = merged[merged[right_key].notna()]
        out = merged[out_cols]
        if not unmatched.empty:
            out = pd.concat([out, unmatched[out_cols]], ignore_index=True)
        yield out

    return parts.mapInPandas(merge_partition, schema=out_schema)


def exact_money_sum(
    col: Column, scale: int = 2, round_to: int | None = None
) -> Column:
    """Order-independent sum of an exact-decimal-valued double column.

    ``ROUND(SUM(double), 4)`` on a >= 1e9-magnitude sum is a latent
    cross-engine flake: summation-order variance (~sqrt(n) * ulp(S))
    approaches the rounding granularity, so a total landing near a
    .00005 boundary can round differently between Spark's partial-agg
    order and DuckDB's — and testdata regenerates, so any refresh can
    land there. Money columns are EXACT k-decimal values, so scaling
    each row to INTEGER smallest-units (the value times 10^k is within
    a few ulp of an integer; round-to-nearest recovers it exactly on
    both engines) and summing as 64-bit integers is exact,
    order-independent, AND on the codegen fast path (a DECIMAL-typed
    aggregation was measured 2.6x slower on the Q1 shape). The final
    integer -> double conversion and division are deterministic: the
    same exact integer converts to the same nearest double everywhere.
    ``round_to`` is accepted for signature stability but unnecessary
    here (integer sums have no 2^53 cliff below long range).

    Sign-aware rounding: the engine side recovers the integer as
    ``trunc(x * 10^k + signum(x) * 0.5)`` — Spark's double ``round``
    routes through BigDecimal (measured 2x the whole Q1 aggregation),
    while the signed half-add truncation stays in codegen arithmetic
    and recovers the same integer for any value within ulps of it, as
    every exact k-decimal money product is.  The signum term makes
    negative amounts (refunds, discounts-as-negatives) round
    half-AWAY-FROM-ZERO — exactly what both Spark SQL's and DuckDB's
    ``ROUND`` do on doubles — where a bare ``+ 0.5`` then truncate
    would round them toward zero and hash-diverge from the oracle
    (verified by tests/test_scale_patterns.py's negative-amounts
    oracle test).  The SQL twin uses ``ROUND`` (DuckDB's
    double->BIGINT cast rounds rather than truncates, so the half-add
    trick is not portable there) — different row expressions, same
    exact integer, hash-identical.

    ``exact_money_sum_sql`` is valid in BOTH dialects, so oracle
    strings and Spark SQL queries can share it verbatim (DuckDB sums
    into HUGEINT — same exact integer, same double conversion).

    OVERFLOW HEADROOM — why the accumulator type depends on ``scale``.
    A long-SUM overflow kills the query under Spark 4's ANSI default
    (ARITHMETIC_OVERFLOW) and wraps SILENTLY with ANSI off, while the
    DuckDB twin sums into HUGEINT — a crashed or silently-wrong total
    either way, and an oracle divergence.  At scale=2 the headroom is
    real: ~6e11 lineitem rows (100 TB-class) x ~4e6 avg units ~ 2.4e18
    vs int64 max 9.2e18 — ~4x margin, and the margin grows as row
    counts shrink.  At scale>=4 it is NOT: sum_charge-style units are
    ~4e10/row, so a single long sum crosses int64 max near sf~40
    (~2.4e8 rows), far below the target scale.  A DECIMAL(38,0)
    accumulator fixes that but was measured to DOUBLE the Q1
    action-only time (0.42 -> 0.84 s — per-row BigDecimal adds in the
    partial agg).  Therefore scale>=4 SPLITS each row's units into
    hi = units >> 20 (arithmetic shift = floor-div, so lo stays in
    [0, 2^20) even for negative units) and lo = units - hi * 2^20,
    sums BOTH as plain longs (codegen fast path — two long adds per
    row instead of one BigDecimal add), and recombines ONCE per group
    in DECIMAL(38,0): total = sum(hi) * 2^20 + sum(lo).  Headroom of
    the split accumulators: sum(lo) < n_group * 2^20 overflows at
    n_group ~ 8.8e12 rows PER GROUP (~15x the entire 6e11-row 100 TB
    lineitem landing in one group); sum(hi) < n_group * (U / 2^20)
    overflows even later for any real money magnitude U (~4e10 units
    -> n_group ~ 2.3e14).  The recombined total may exceed int64
    (that is the point) but sits far inside decimal(38,0)'s 1e38.
    Same exact integer as the decimal path -> same nearest-double
    conversion -> hash-identical output at any sf where both fit,
    verified by the high-scale overflow test.
    """
    units = (
        col * F.lit(float(10**scale)) + F.signum(col) * F.lit(0.5)
    ).cast("long")
    if scale >= 4:
        hi = F.shiftright(units, 20)
        lo = units - hi * F.lit(1 << 20)
        total = (
            F.sum(hi).cast("decimal(38,0)") * F.lit(1 << 20) + F.sum(lo)
        ).cast("double")
    else:
        total = F.sum(units).cast("double")
    return total / F.lit(float(10**scale))


def exact_money_sum_sql(
    expr: str, scale: int = 2, round_to: int | None = None
) -> str:
    """SQL-text twin of ``exact_money_sum`` (same semantics, both
    dialects; DuckDB sums into HUGEINT — same exact integer, same
    double conversion).  At scale>=4 this twin sums a straight
    DECIMAL(38,0) cast rather than the engine side's hi/lo long split
    (see ``exact_money_sum``'s overflow-headroom note) — different
    accumulator, same exact integer, hash-identical; the fragment must
    stay valid as SPARK SQL too, where a bare SUM(BIGINT) wraps
    silently at the row counts high-scale units reach.  ``ROUND`` on
    doubles is half-away-from-zero in BOTH dialects, matching the
    engine side's signed half-add for negative amounts."""
    del round_to  # see exact_money_sum
    # CAST the integer sum to DOUBLE before dividing: Spark SQL parses a
    # bare `100.0` literal as DECIMAL, which would drag the division
    # result into DECIMAL typing (DuckDB divides HUGEINT/DOUBLE fine
    # either way)
    units = f"CAST(ROUND(({expr}) * {10**scale}) AS BIGINT)"
    if scale >= 4:
        units = f"CAST({units} AS DECIMAL(38,0))"
    return (
        f"(CAST(SUM({units})"
        f" AS DOUBLE) / {float(10**scale)!r})"
    )


def band_join(
    facts: DataFrame, bands: DataFrame, value_col: str, lo_col: str, hi_col: str
) -> DataFrame:
    """Non-equi (range/theta) join of facts to interval bands [lo, hi).

    The bands side is tiny by construction, so it is broadcast — Spark
    executes this as BroadcastNestedLoopJoin, which is the right physical
    plan for a non-equi join against a small dimension at any fact scale.
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(bands), cond, "inner")


def sessionize(
    df: DataFrame, key_col: str, ts_col: str, gap_seconds: int
) -> DataFrame:
    """Assign session ids per key with an inactivity-gap rule (gaps & islands).

    A new session starts when the gap from the previous event exceeds
    ``gap_seconds``. Expressed with lag + a running sum of session-start
    flags — two window passes over the same (key, ts) partitioning, a single
    shuffle. Equivalent to streaming ``session_window`` assignment.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col))
    prev_ts = F.lag(ts_col).over(w)
    # timestamp->double cast keeps sub-second precision (unix_timestamp would
    # floor to whole seconds and misjudge gaps that straddle the threshold)
    gap = F.col(ts_col).cast("double") - prev_ts.cast("double")
    is_new = (prev_ts.isNull() | (gap > gap_seconds)).cast("long")
    return df.withColumn("__new", is_new).withColumn(
        "session_seq",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("__new")


def micro_batch_ids(
    df: DataFrame, lane_col: str, order_cols: Sequence[Column], batch_size: int
) -> DataFrame:
    """Assign (lane, batch_id) per the reference's micro-batch rule (S14).

    Rows are numbered per lane in a deterministic order; every
    ``batch_size`` consecutive rows share a batch_id — the declarative
    equivalent of the reference's threshold-flush buffers
    (reference etl/main.go:240-262).
    """
    w = Window.partitionBy(lane_col).orderBy(*order_cols)
    rn = F.row_number().over(w)
    return df.withColumn("batch_id", F.floor((rn - F.lit(1)) / F.lit(batch_size)))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, replicate the small side.

    For a hot key whose rows overwhelm one reducer, the salt fans its rows
    across ``n_salts`` partitions; the small side is replicated once per
    salt so every (key, salt) bucket still joins completely. Result is
    row-identical to the plain join. AQE's skew-join handles moderate skew
    automatically; explicit salting is for the pathological keys AQE can't
    split (e.g. a single key larger than an executor).
    """
    salted_big = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)),
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")
    )
    salted_small = small.withColumn("__salt", salts)
    joined = salted_big.join(
        salted_small,
        (F.col(big_key) == F.col(small_key))
        & (salted_big["__salt"] == salted_small["__salt"]),
    )
    return joined.drop("__salt")
