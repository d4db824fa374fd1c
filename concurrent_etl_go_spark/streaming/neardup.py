"""Streaming near-duplicate gate — incremental MinHash against the
settled fingerprint set.

The batch near-dup pass (``llm/dedup.py::minhash_lsh_pairs``) answers
"which pairs are near-dups" after the corpus exists.  An INGEST
pipeline needs the question answered per arriving document: "is this
new doc a near-dup of anything we already accepted?" — the gate that
keeps a continuously-growing training corpus deduplicated without ever
re-pairing the settled corpus against itself.

Semantics — the order-incremental "match-any-predecessor" rule of
``llm/dedup3.py::dedup_gate_flags``: a document is rejected iff it
verifies (exact hashed-shingle Jaccard >= threshold) against ANY
earlier-arriving document (earlier epoch, or smaller doc_id within the
same micro-batch).  This rule is closed under batching — feeding the
same documents through in arrival order in ANY batch partitioning
yields identical flags — which is what makes the streaming and batch
forms provably equal (``tests/test_streaming_neardup.py``).

State & exactly-once: the settled fingerprint set (hashed shingle
arrays + LSH band index — never raw text) is appended per epoch under
``<state>/<table>/epoch-N/`` with ``mode("overwrite")``, and an epoch
ledger marker is written after the epoch's state+decisions land — so a
foreachBatch replay after a crash rewrites the same epoch directories
with the same content instead of duplicating state (the
``stream_to_http_idempotent`` ledger pattern).

Scale: per epoch the candidate join probes the settled BAND INDEX with
only the new batch's bands (narrow keys, equi-join — the
``minhash_lsh_incremental`` economics); verification fetches shingle
sets for candidate pairs only.  A real deployment bucket-partitions the
band index by (band_id, band_hash) so the probe is co-located; state
grows with corpus size, never with stream length squared.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from concurrent_etl_go_spark.llm.dedup import (
    LSH_BAND_SIZE,
    NUM_MINHASHES,
    _band_table,
)

_SH_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("sh", T.ArrayType(T.LongType())),
    ]
)
_BANDS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("band_id", T.IntegerType()),
        T.StructField("band_hash", T.LongType()),
    ]
)


def _read_state(
    spark: SparkSession,
    root: str,
    name: str,
    schema: T.StructType,
    before_epoch: int | None = None,
) -> DataFrame:
    """Read settled per-epoch state.  ``before_epoch`` (when given)
    excludes ``epoch-K`` directories with ``K >= before_epoch`` — the
    in-flight epoch's own state from a crashed earlier attempt must NOT
    count as "settled", else a replay would candidate-join the batch
    against its own fingerprints (self-pairs at Jaccard 1.0) and flag
    every document in the batch as a duplicate."""
    base = os.path.join(root, name)
    epochs = (
        sorted(d for d in os.listdir(base) if d.startswith("epoch-"))
        if os.path.isdir(base)
        else []
    )
    if before_epoch is not None:
        kept = []
        for d in epochs:
            try:
                k = int(d.split("epoch-", 1)[1])
            except ValueError:
                continue
            if k < before_epoch:
                kept.append(d)
        epochs = kept
    if not epochs:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(
        *[os.path.join(base, e) for e in epochs]
    )


def _jaccard(sh_a, sh_b):
    return F.size(F.array_intersect(sh_a, sh_b)) / F.greatest(
        F.size(F.array_union(sh_a, sh_b)), F.lit(1)
    )


def neardup_gate_stream(
    stream: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> StreamingQuery:
    """Start the gate over a document stream (``id_col``, ``text_col``
    columns required).  Per epoch, writes:

    - ``<state>/decisions/epoch-N/``: (doc_id, is_dup, epoch) for every
      document in the batch;
    - ``<state>/sh/epoch-N/`` and ``<state>/bands/epoch-N/``: the
      batch's fingerprints, appended to the settled set (ALL documents,
      accepted or rejected — the match-any-predecessor closure);
    - ``<state>/ledger/epoch-N.done``: the epoch commit marker.
    """
    ledger = os.path.join(state_root, "ledger")
    os.makedirs(ledger, exist_ok=True)
    spark = stream.sparkSession

    def commit(batch_df: DataFrame, epoch_id: int) -> None:
        marker = os.path.join(ledger, f"epoch-{epoch_id}.done")
        if os.path.exists(marker):
            return
        batch_ids = batch_df.select(
            F.col(id_col).cast("long").alias("doc_id")
        ).distinct()
        sh_new, bands_new = _band_table(
            batch_df, id_col, text_col, NUM_MINHASHES, LSH_BAND_SIZE
        )
        sh_old = _read_state(
            spark, state_root, "sh", _SH_SCHEMA, before_epoch=epoch_id
        )
        bands_old = _read_state(
            spark, state_root, "bands", _BANDS_SCHEMA, before_epoch=epoch_id
        )

        cross = (
            bands_old.alias("a")
            .join(
                bands_new.alias("b"),
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_hash") == F.col("b.band_hash")),
            )
            .select(
                F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
            )
        )
        intra = (
            bands_new.alias("a")
            .join(
                bands_new.alias("b"),
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(
                F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
            )
        )
        sh_all = sh_old.unionByName(sh_new)
        cand = cross.unionByName(intra).dropDuplicates(["id_a", "id_b"])
        dups = (
            cand.join(
                sh_all.select(
                    F.col("id").alias("id_a"), F.col("sh").alias("sh_a")
                ),
                "id_a",
            )
            .join(
                sh_new.select(
                    F.col("id").alias("id_b"), F.col("sh").alias("sh_b")
                ),
                "id_b",
            )
            .where(
                F.round(_jaccard("sh_a", "sh_b"), 4) >= threshold
            )
            .select(F.col("id_b").alias("doc_id"))
            .distinct()
            .withColumn("__dup", F.lit(1))
        )
        decisions = batch_ids.join(dups, "doc_id", "left").select(
            "doc_id",
            F.coalesce("__dup", F.lit(0)).cast("int").alias("is_dup"),
            F.lit(epoch_id).cast("long").alias("epoch"),
        )
        tag = f"epoch-{epoch_id}"
        decisions.write.mode("overwrite").parquet(
            os.path.join(state_root, "decisions", tag)
        )
        sh_new.write.mode("overwrite").parquet(
            os.path.join(state_root, "sh", tag)
        )
        bands_new.write.mode("overwrite").parquet(
            os.path.join(state_root, "bands", tag)
        )
        with open(marker, "w") as fh:
            fh.write("")

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(commit)
        .start()
    )


def gate_decisions(spark: SparkSession, state_root: str) -> DataFrame:
    """All gate decisions so far (doc_id, is_dup, epoch)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("is_dup", T.IntegerType()),
            T.StructField("epoch", T.LongType()),
        ]
    )
    return _read_state(spark, state_root, "decisions", schema)
