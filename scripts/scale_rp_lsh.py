#!/usr/bin/env python
"""Decade decomposition of ``similarity_rp_lsh`` (VERDICT r10 weak #1).

The round-10 decade measurement (BENCH_SF1.json) put the query's
action-time exponent at 1.224 over sf0.1 -> sf1 — the only production
query above ~1.0 — while noting the OUTPUT pair count itself grows at
exponent 1.96 (pair enumeration at threshold 0.3 over label-clustered
embeddings is inherently ~quadratic in the answer).  This script makes
that claim checkable: it runs the pipeline's stages separately at both
decade points and records, per stage, the row cardinalities and
wall-clock so the exponent can be attributed:

- signature build (scan + 8-band sign-bit signatures): ~n * log n work
  (the corpus-derived band width grows the bit count logarithmically);
- banding + multiprobe + occupied-bucket semi-join: ~n * log n rows;
- candidate generation (band equi-join + dedup): bounded below by the
  true pair count — THIS is where output-quadratic growth must appear;
- exact verify + emit: linear in candidates.

Verdict criterion: if cand/output stays ~constant across the decade and
the per-(n + output-row) action cost does not grow, the 1.224 exponent
is candidate-output-bound — the documented join_interval_bucketed
situation — and not a plan defect.  Writes SCALE_RP_LSH.json.

Usage: python scripts/scale_rp_lsh.py [sf0.1_dir sf1_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def measure(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from concurrent_etl_go_spark.llm.similarity import (
        RP_BAND_SIZE,
        RP_BITS,
        _signature_expr,
        _vectors,
        dot,
        rp_lsh_pairs,
    )
    from concurrent_etl_go_spark.operators.registry import release_caches

    out: dict = {"sf_dir": sf_dir}
    vectors = _vectors(spark, sf_dir)
    n_vecs = vectors.count()
    out["n_vecs"] = n_vecs
    band_size = (
        max(RP_BAND_SIZE, math.ceil(math.log2(max(n_vecs, 1) / 125)))
        if n_vecs > 125
        else RP_BAND_SIZE
    )
    n_bands = RP_BITS // RP_BAND_SIZE
    bits = band_size * n_bands
    out["band_size"] = band_size
    out["signature_bits"] = bits

    dim = len(vectors.select("v").first().v)

    # stage 1: signature build (materialize signatures once)
    t0 = time.perf_counter()
    sigs = vectors.withColumn("bits", _signature_expr(dim, bits)).persist()
    sigs.count()
    out["t_signature"] = round(time.perf_counter() - t0, 3)

    # stage 2: banding + multiprobe + occupied semi-join (mirrors
    # rp_lsh_pairs' probe construction)
    band_vals = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.aggregate(
            F.slice(F.col("bits"), (b * band_size + 1).cast("int"), band_size),
            F.lit(0),
            lambda acc, v: acc * 2 + v,
        ),
    )
    bands = sigs.select(
        "vec_id", F.posexplode(band_vals).alias("band_id", "band_val")
    )
    probes = bands.select(
        "vec_id",
        "band_id",
        F.explode(
            F.array(
                F.col("band_val"),
                *[
                    F.col("band_val").bitwiseXOR(F.lit(1 << j))
                    for j in range(band_size)
                ],
            )
        ).alias("band_val"),
    )
    occupied = bands.select("band_id", "band_val").distinct()
    t0 = time.perf_counter()
    probes_live = probes.join(occupied, ["band_id", "band_val"], "left_semi")
    out["n_band_rows"] = bands.count()
    out["n_probe_rows_live"] = probes_live.count()
    out["t_banding"] = round(time.perf_counter() - t0, 3)

    # stage 3: candidate generation (pre- and post-dedup cardinality)
    t0 = time.perf_counter()
    joined = bands.alias("a").join(
        probes_live.alias("b"),
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_val") == F.col("b.band_val"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")
    )
    out["n_collisions"] = joined.count()
    candidates = joined.dropDuplicates(["id_a", "id_b"]).persist()
    out["n_candidates"] = candidates.count()
    out["t_candidates"] = round(time.perf_counter() - t0, 3)

    # stage 4: exact verify + emit
    t0 = time.perf_counter()
    verified = (
        candidates.join(
            sigs.select(
                F.col("vec_id").alias("id_a"),
                F.col("v").alias("v_a"),
                F.col("norm").alias("n_a"),
            ),
            "id_a",
        )
        .join(
            sigs.select(
                F.col("vec_id").alias("id_b"),
                F.col("v").alias("v_b"),
                F.col("norm").alias("n_b"),
            ),
            "id_b",
        )
        .withColumn(
            "sim",
            dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")),
        )
        .where(F.col("sim") >= 0.3)
    )
    out["n_output_pairs"] = verified.count()
    out["t_verify"] = round(time.perf_counter() - t0, 3)

    sigs.unpersist()
    candidates.unpersist()

    # end-to-end (the registry query itself), warm, action-only
    df = rp_lsh_pairs(_vectors(spark, sf_dir), threshold=0.3)
    df.write.format("noop").mode("overwrite").save()
    release_caches()
    t0 = time.perf_counter()
    df = rp_lsh_pairs(_vectors(spark, sf_dir), threshold=0.3)
    mid = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    out["t_e2e"] = round(time.perf_counter() - t0, 3)
    out["t_act"] = round(time.perf_counter() - mid, 3)
    release_caches()
    return out


def main() -> None:
    from concurrent_etl_go_spark.session import get_spark

    dirs = sys.argv[1:] or [
        os.path.join(REPO_ROOT, "localdata", "sf0.1"),
        os.path.join(REPO_ROOT, "localdata", "sf1"),
    ]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="scale-rp-lsh",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    points = [measure(spark, d) for d in dirs]
    result: dict = {"metric": "rp_lsh_decade_decomposition", "points": points}
    if len(points) == 2 and points[0]["n_vecs"] and points[1]["n_vecs"]:
        lo, hi = points
        ratio_n = hi["n_vecs"] / lo["n_vecs"]

        def exp(key: str) -> float | None:
            if not lo.get(key) or not hi.get(key):
                return None
            return round(math.log(hi[key] / lo[key]) / math.log(ratio_n), 3)

        result["exponents_vs_n"] = {
            k: exp(k)
            for k in (
                "n_band_rows",
                "n_probe_rows_live",
                "n_collisions",
                "n_candidates",
                "n_output_pairs",
                "t_signature",
                "t_candidates",
                "t_verify",
                "t_act",
            )
        }
        result["cand_per_output"] = {
            "lo": round(lo["n_candidates"] / max(lo["n_output_pairs"], 1), 3),
            "hi": round(hi["n_candidates"] / max(hi["n_output_pairs"], 1), 3),
        }
        # the attribution test: action seconds per (n + output) row
        result["act_us_per_row"] = {
            "lo": round(
                1e6 * lo["t_act"] / (lo["n_vecs"] + lo["n_output_pairs"]), 3
            ),
            "hi": round(
                1e6 * hi["t_act"] / (hi["n_vecs"] + hi["n_output_pairs"]), 3
            ),
        }
    with open(os.path.join(REPO_ROOT, "SCALE_RP_LSH.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
