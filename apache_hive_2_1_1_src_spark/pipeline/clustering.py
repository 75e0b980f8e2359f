"""Relational k-means over the embeddings table.

Demonstrates the iterative-algorithm pattern on DataFrames: vectors in
long format (vec_id, dim, val) make assignment and centroid updates pure
joins + aggregations, so every iteration is shuffle-bounded (|vectors| ×
k × dims rows) and the whole thing stays oracle-expressible in SQL — no
UDF, no driver-side loop over data, only over iterations (k-means runs a
FIXED small iteration count; the loop variable is plan depth, not data).

At 100 TB: long format multiplies rows by dims — for wide embeddings
switch the distance join to the array form (one row per vector, distance
via zip_with) while keeping the same iteration structure; the relational
form here is chosen because it is exactly mirrorable in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def kmeans_relational(
    emb: DataFrame,
    k: int = 4,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """k-means with first-k initialization, fixed iteration count.

    Returns (cluster_id, n_members, avg_dist) — cluster sizes and mean
    squared distance, rounded for cross-engine comparison.
    """
    long = emb.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("dim", "val"),
    ).select("id", "dim", F.col("val").cast("double").alias("val"))

    centroids = (
        long.filter(F.col("id") < k)
        .select(F.col("id").alias("cid"), "dim", F.col("val").alias("cval"))
    )

    assign = None
    for _ in range(iterations):
        dists = (
            long.join(centroids, "dim")
            .groupBy("id", "cid")
            .agg(F.sum(F.pow(F.col("val") - F.col("cval"), 2)).alias("dist2"))
        )
        w = Window.partitionBy("id").orderBy(F.asc("dist2"), F.asc("cid"))
        assign = (
            dists.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("id", "cid", "dist2")
        )
        centroids = (
            long.join(assign.select("id", "cid"), "id")
            .groupBy("cid", "dim")
            .agg(F.avg("val").alias("cval"))
        )

    return (
        assign.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.avg("dist2"), 4).alias("avg_dist2"),
        )
        .select(F.col("cid").alias("cluster_id"), "n_members", "avg_dist2")
        .orderBy("cluster_id")
    )


def build_vocab(
    docs: DataFrame, text_col: str = "text", min_freq: int = 2
) -> DataFrame:
    """Deterministic vocabulary: id = rank by (freq desc, word asc) —
    the tokenizer-vocab step of a training-data pipeline.  One word-count
    shuffle + one window."""
    words = docs.select(
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
        ).alias("word")
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq")).filter(
        F.col("freq") >= min_freq
    )
    w = Window.orderBy(F.desc("freq"), F.asc("word"))
    return counts.select(
        "word", "freq", (F.row_number().over(w) - 1).alias("token_id")
    )
