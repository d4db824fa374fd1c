"""Sequence-packing efficiency — the bin-fill report a training job reads.

``datasets.text_sequence_pack`` assigns documents to token-budget packs
with streaming-concat semantics (documents may straddle pack
boundaries, so every pack except the last is exactly full).  Real
training jobs also run NON-SPLITTING packing — a document is never cut,
so a pack closes with waste when the next document does not fit
(next-fit bin packing) — and read an efficiency report before training:
how many packs, how full, how much budget burns as padding, and what
the straddling concat would have saved.  This module computes that
report with a portable integer fold.

Portability: the next-fit recurrence is inherently sequential per
stream, so it runs as ONE integer fold per language partition —
``(n_packs, current_fill)`` bit-packed into a single BIGINT
(``packs * 2^20 + fill``; fill <= budget < 2^20) because DuckDB's
``list_reduce`` mis-evaluates struct accumulators (the documented
timeseries2 probe).  The fold string is shared verbatim by both engines
and is all-integer CASE arithmetic — no float coefficient can diverge.

Scale: greedy bin packing is sequential per stream BY DEFINITION; the
scale story is the same as ``text_sequence_pack`` — partition by
``lang`` and pack each stream independently (one shuffle on the
partition key), so 100 TB packs as parallel per-stream folds.  The fold
itself is O(docs-per-lang) with a constant-size accumulator; for a
single 100 TB stream, fold per shard and stitch shard boundaries (the
chunked-prefix-fold pattern of ``finance.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

#: Non-splitting pack budget (tokens).  Deliberately smaller than
#: text_sequence_pack's 2048 concat budget so the report exercises many
#: packs per language at test scale; the semantics are budget-agnostic.
PACK_BUDGET = 512
#: Fill-state encoding stride: fill < 2^20 always (budget << 2^20), so
#: ``state = n_closed_packs * 2^20 + current_fill`` is collision-free.
_ENC = 1 << 20

#: Shared next-fit fold (both engines parse this text verbatim).  Cases:
#: oversize doc (t > budget): close the open pack if any, then give the
#: doc ceil(t/budget) dedicated packs; fits: accumulate; else: close
#: the pack and start a new one with this doc.  All-integer — the
#: ``CAST(... / ...)`` divisions are exact (operands < 2^53).
_PACK_FOLD = f"""(acc, t) -> CASE
  WHEN t > {PACK_BUDGET} THEN
    (CAST((acc - acc % {_ENC}) / {_ENC} AS BIGINT)
     + CASE WHEN acc % {_ENC} > 0 THEN 1 ELSE 0 END
     + CAST((t + {PACK_BUDGET - 1} - (t + {PACK_BUDGET - 1})
             % {PACK_BUDGET}) / {PACK_BUDGET} AS BIGINT)) * {_ENC}
  WHEN acc % {_ENC} + t <= {PACK_BUDGET} THEN acc + t
  ELSE (CAST((acc - acc % {_ENC}) / {_ENC} AS BIGINT) + 1)
       * {_ENC} + t
END"""


@query(
    "dataset_pack_efficiency",
    oracle=f"""
    WITH t AS (
      SELECT lang, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    folded AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                            list(n_tokens ORDER BY doc_id)),
               {_PACK_FOLD}) AS state
      FROM t GROUP BY lang
    ),
    packs AS (
      SELECT lang, n_docs, total_tokens,
             CAST((state - state % {_ENC}) / {_ENC} AS BIGINT)
             + CASE WHEN state % {_ENC} > 0 THEN 1 ELSE 0 END
               AS n_packs
      FROM folded
    )
    SELECT lang, n_docs, total_tokens, n_packs,
           CAST(n_packs * {PACK_BUDGET} - total_tokens AS BIGINT)
             AS waste_tokens,
           CAST(total_tokens * 10000 // (n_packs * {PACK_BUDGET})
                AS BIGINT) AS fill_bp,
           CAST(n_packs
                - CAST(ceil(CAST(total_tokens AS DOUBLE)
                            / {PACK_BUDGET}) AS BIGINT)
                AS BIGINT) AS straddle_saving_packs
    FROM packs
    """,
)
def dataset_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-fit (non-splitting) sequence-packing efficiency per
    language: pack count, absolute padding waste, floor-basis-point
    fill ratio, and how many packs boundary-straddling concat
    (``text_sequence_pack``) would save.  The report a training job
    reads to choose between padding waste and attention-mask
    complexity (Raffel et al. 2020 pack-and-mask, public literature).

    Both engines run the identical bit-packed integer fold per
    language in doc_id order — hash-exact.

    Scale: grain-first (lang, doc) token counts -> one sequential fold
    per language stream (the parallel-streams layout of
    ``text_sequence_pack``); per-lang arrays are bounded by the stream
    partition, and a 100 TB single stream folds per-shard and
    stitches (chunked-fold pattern)."""
    docs = read_table(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    folded = t.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.expr(
            "aggregate("
            "  transform(array_sort(collect_list(struct(doc_id, n_tokens))),"
            "            s -> s.n_tokens),"
            f"  CAST(0 AS BIGINT), {_PACK_FOLD})"
        ).alias("state"),
    )
    n_packs = F.expr(
        f"CAST((state - state % {_ENC}) / {_ENC} AS BIGINT)"
        f" + CASE WHEN state % {_ENC} > 0 THEN 1 ELSE 0 END"
    )
    packs = folded.select(
        "lang", "n_docs", "total_tokens", n_packs.alias("n_packs")
    )
    return packs.select(
        "lang",
        "n_docs",
        "total_tokens",
        "n_packs",
        (F.col("n_packs") * PACK_BUDGET - F.col("total_tokens"))
        .cast("long")
        .alias("waste_tokens"),
        F.expr(
            f"CAST(total_tokens * 10000 div (n_packs * {PACK_BUDGET})"
            " AS BIGINT)"
        ).alias("fill_bp"),
        (
            F.col("n_packs")
            - F.ceil(
                F.col("total_tokens").cast("double") / PACK_BUDGET
            ).cast("long")
        )
        .cast("long")
        .alias("straddle_saving_packs"),
    )
