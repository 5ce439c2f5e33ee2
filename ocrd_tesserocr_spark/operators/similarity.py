"""Similarity search over the ``embeddings`` table (array<float>).

Brute-force cosine top-k is the correctness baseline; the sign-bucketed
(IVF/LSH-style) variant is the scale path: at 10^9+ vectors the cross join
is infeasible, but a coarse bucket key turns it into an equi-join whose
shuffle is O(vectors), with each bucket scanned independently.

Everything is JVM-side (``zip_with`` + ``aggregate`` fold for the dot
product — no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_QUERIES = 50  # query set: vec_id < 50
TOP_K = 5
BUCKET_DIMS = 4  # sign bits of the first 4 dims -> 16 buckets


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


# ---------------------------------------------------------------------------
# SIM1 — brute-force cosine top-k (baseline)
# ---------------------------------------------------------------------------
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # norms materialize in projections BELOW the join: O(n) norm folds,
    # not O(n*q) — the interpreted higher-order fold is the expensive part
    emb = (
        _emb(spark, sf_dir)
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))
    )
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    # broadcast the small query side; the big side streams through unshuffled
    joined = emb.crossJoin(F.broadcast(q)).where(F.col("vec_id") != F.col("query_id"))
    cos = _dot(F.col("qv"), F.col("embedding")) / (F.col("qnrm") * F.col("nrm"))
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cos, 4).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", "sim")
    )


_SQL_COS = """
ROUND(
  list_sum(list_transform(list_zip(q.embedding, e.embedding),
                          p -> p[1]::DOUBLE * p[2]::DOUBLE))
  / (sqrt(list_sum(list_transform(q.embedding, x -> x::DOUBLE * x::DOUBLE)))
     * sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))), 4)
"""

SQL_COSINE_TOPK = f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {_SQL_COS} AS sim
  FROM embeddings e, q WHERE e.vec_id != q.query_id),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rnk
  FROM scored)
SELECT query_id, neighbor_id, rnk, sim FROM ranked WHERE rnk <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# SIM2 — sign-bucketed ANN (the scale path): coarse bucket = sign bits of
# the leading dims; equi-join on bucket instead of cross join
# ---------------------------------------------------------------------------
def _bucket(col) -> F.Column:
    bits = [
        F.when(F.element_at(col, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(BUCKET_DIMS)
    ]
    return F.concat(*bits)


def q_ann_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = (
        _emb(spark, sf_dir)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "vec_id",
            "embedding",
            _bucket(F.col("embedding")).alias("bucket"),
            _norm(F.col("embedding")).alias("nrm"),
        )
    )
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("bucket"),
        F.col("nrm").alias("qnrm"),
    )
    joined = emb.join(F.broadcast(q), "bucket").where(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("qv"), F.col("embedding")) / (F.col("qnrm") * F.col("nrm"))
    scored = joined.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), F.round(cos, 4).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", "sim")
    )


_SQL_BUCKET = " || ".join(
    f"(CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END)"
    for i in range(BUCKET_DIMS)
)
_SQL_BUCKET_Q = _SQL_BUCKET

SQL_ANN_BUCKETED = f"""
WITH b AS (
  SELECT vec_id, embedding, {_SQL_BUCKET} AS bucket FROM embeddings),
q AS (
  SELECT vec_id AS query_id, embedding, bucket FROM b WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {_SQL_COS} AS sim
  FROM b e JOIN q ON e.bucket = q.bucket AND e.vec_id != q.query_id),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rnk
  FROM scored)
SELECT query_id, neighbor_id, rnk, sim FROM ranked WHERE rnk <= {TOP_K}
"""


QUERIES = {
    "cosine_topk": q_cosine_topk,
    "ann_bucketed": q_ann_bucketed,
}

ORACLE_SQL = {
    "cosine_topk": SQL_COSINE_TOPK,
    "ann_bucketed": SQL_ANN_BUCKETED,
}
