"""Build a synthetic ~sf1 tier from sf0.1: 10 replicas with disjoint id
ranges for the data-plane tables (embeddings, documents), other tables
copied as-is. Replicated embeddings get a tiny deterministic per-replica
perturbation so brute-force top-k has no exact ties (keeps the knn
entries' code paths honest rather than degenerate).

Output: /tmp/sf1data/<table>.parquet (same layout load_tables expects).
"""
import os
import shutil
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from syncmaven_spark import get_spark
from syncmaven_spark.session import load_tables

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1data"
N = 10
DOC_OFFSET = 1_000_000
VEC_OFFSET = 1_000_000

spark = get_spark(app_name="make_sf1")
t = load_tables(spark, SRC, register_views=False)

shutil.rmtree(DST, ignore_errors=True)
os.makedirs(DST)

# documents: 10x disjoint doc_id
docs = t["documents"]
doc_cols = [c for c in docs.columns if c != "doc_id"]
doc_reps = [
    docs.select((F.col("doc_id") + F.lit(i * DOC_OFFSET)).alias("doc_id"), *doc_cols)
    for i in range(N)
]
reduce(DataFrame.union, doc_reps).repartition(32).write.parquet(
    os.path.join(DST, "documents.parquet")
)

# embeddings: 10x disjoint vec_id, replica i>0 perturbed by i * 1e-6 on
# element 0 (deterministic, breaks exact ties between replicas)
emb = t["embeddings"]
emb_cols = [c for c in emb.columns if c not in ("vec_id", "embedding")]
emb_reps = [
    emb.select(
        (F.col("vec_id") + F.lit(i * VEC_OFFSET)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, j: x + F.when(j == 0, F.lit(i * 1e-6)).otherwise(F.lit(0.0)),
        ).alias("embedding"),
        *emb_cols,
    )
    for i in range(N)
]
reduce(DataFrame.union, emb_reps).repartition(32).write.parquet(
    os.path.join(DST, "embeddings.parquet")
)

# remaining tables: copy the parquet files as-is
for name in os.listdir(SRC):
    if name.endswith(".parquet") and name not in ("documents.parquet", "embeddings.parquet"):
        src_p, dst_p = os.path.join(SRC, name), os.path.join(DST, name)
        if os.path.isdir(src_p):
            shutil.copytree(src_p, dst_p)
        else:
            shutil.copy2(src_p, dst_p)

print("done:", {n: None for n in sorted(os.listdir(DST))})
