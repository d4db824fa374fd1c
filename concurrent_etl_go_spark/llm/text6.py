"""Text pack 6 — readability scoring.

Readability grades are a standard corpus-quality signal (too-simple
text is often boilerplate or spam; absurdly-complex text is often
garbled extraction), used as a curation filter alongside the
stopword/length heuristics of ``text_quality``.  Flesch-Kincaid grade
level (Kincaid et al. 1975, public literature) needs words, sentences
and syllables; syllables use the standard vowel-group heuristic
(maximal ``[aeiouy]+`` runs, minimum one per word) — crude for English,
deterministic everywhere, and identical across engines because both
count the same regex matches.

Scale: map-only — every statistic is computed per document inside one
projection (a regexp pass and an integer fold over the token array);
no shuffle at all, so this runs at scan speed on any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

#: Flesch-Kincaid grade coefficients (short shared literals).
_FK_WPS, _FK_SPW, _FK_C = "0.39", "11.8", "15.59"


@query(
    "text_readability_fk",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             string_split(text, ' ') AS w,
             GREATEST(len(regexp_extract_all(text, '[.!?]')), 1)
               AS n_sentences
      FROM documents
    ),
    counted AS (
      SELECT doc_id, lang, n_sentences,
             CAST(len(w) AS BIGINT) AS n_words,
             CAST(list_sum([GREATEST(
                    len(regexp_extract_all(x, '[aeiouy]+')), 1)
                  for x in w]) AS BIGINT) AS n_syllables
      FROM t
    )
    SELECT doc_id, lang, n_words,
           CAST(n_sentences AS BIGINT) AS n_sentences, n_syllables,
           ROUND({_FK_WPS} * (CAST(n_words AS DOUBLE) / n_sentences)
                 + {_FK_SPW} * (CAST(n_syllables AS DOUBLE) / n_words)
                 - {_FK_C}, 4) + 0.0 AS fk_grade
    FROM counted
    WHERE n_words > 0
    """,
)
def text_readability_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid grade level per document:
    ``0.39 * words/sentences + 11.8 * syllables/word - 15.59`` with
    vowel-group syllables (min 1/word) and ``[.!?]`` sentence marks
    (min 1/doc).  Non-Latin scripts bottom out at one syllable per
    word — the heuristic's documented bias, identical on both engines.

    Each grade is a function of three exact integers with shared
    literal coefficients — per-row IEEE arithmetic, no aggregation
    order anywhere; ROUND(4) + 0.0 is the uniform emission idiom.

    Scale: map-only projection (regexp + integer fold per row)."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    t = docs.select(
        "doc_id",
        "lang",
        F.split("text", " ").alias("w"),
        F.greatest(
            F.size(F.regexp_extract_all("text", F.lit("[.!?]"), 0)),
            F.lit(1),
        ).alias("n_sentences"),
    )
    counted = t.select(
        "doc_id",
        "lang",
        "n_sentences",
        F.size("w").cast("long").alias("n_words"),
        F.expr(
            "CAST(aggregate(w, CAST(0 AS BIGINT), (acc, x) -> acc"
            " + GREATEST(size(regexp_extract_all(x, '[aeiouy]+', 0)),"
            " 1)) AS BIGINT)"
        ).alias("n_syllables"),
    )
    return counted.where(F.col("n_words") > 0).select(
        "doc_id",
        "lang",
        "n_words",
        F.col("n_sentences").cast("long").alias("n_sentences"),
        "n_syllables",
        (
            F.round(
                F.expr(
                    f"{_FK_WPS} * (CAST(n_words AS DOUBLE) / n_sentences)"
                    f" + {_FK_SPW} * (CAST(n_syllables AS DOUBLE)"
                    " / n_words)"
                    f" - {_FK_C}"
                ),
                4,
            )
            + F.lit(0.0)
        ).alias("fk_grade"),
    )
