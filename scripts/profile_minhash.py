"""Profile dedup_minhash_lsh stage-by-stage at sf0.1 (VERDICT r2 item #2)."""
import os
import time

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from concurrent_etl_go_spark.session import get_spark as get_session
from concurrent_etl_go_spark.sources.readers import read_table
from concurrent_etl_go_spark.llm import dedup
from concurrent_etl_go_spark.operators import registry
from pyspark.sql import functions as F

spark = get_session()
sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]

docs = read_table(spark, sf_dir, "documents")
print("docs:", docs.count())

# warm the scan
docs.select(F.sum(F.length("text"))).collect()

t0 = time.time()
sh_df, bands = dedup._band_table(docs, "doc_id", "text", 32, 4)
n_bands_rows = bands.count()
t1 = time.time()
print(f"band table build+count: {t1-t0:.2f}s  band rows={n_bands_rows}")

cand = (
    bands.alias("a")
    .join(
        bands.alias("b"),
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a.id") < F.col("b.id")),
    )
    .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    .dropDuplicates(["id_a", "id_b"])
)
n_cand = cand.count()
t2 = time.time()
print(f"candidates: {t2-t1:.2f}s  n={n_cand}")

verified = (
    cand.join(sh_df.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
    .join(sh_df.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    .withColumn("jaccard", F.round(dedup.jaccard("sh_a", "sh_b"), 4))
    .where(F.col("jaccard") >= 0.5)
)
n_ver = verified.count()
t3 = time.time()
print(f"verify: {t3-t2:.2f}s  n={n_ver}")
registry.release_caches()

# full query end-to-end, warm (the bench shape)
for i in range(3):
    t4 = time.time()
    out = dedup.dedup_minhash_lsh(spark, sf_dir)
    n = out.count()
    registry.release_caches()
    print(f"full query run {i}: {time.time()-t4:.2f}s rows={n}")
