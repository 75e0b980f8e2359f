"""Similarity search over the ``embeddings`` table (array<float> column).

Two tiers, as the brief requires:

* ``brute_force_topk`` — exact cosine top-k.  The *query* side is small
  and broadcast; the candidate side streams.  Per (query, candidate) the
  score is a codegen zip_with/aggregate dot product; top-k is a window
  row_number — one shuffle keyed by query id.  This is the correctness
  baseline and is fine whenever |queries| × |corpus| scores fit a scan.

* ``lsh_bucketed_ann`` — the 100 TB path: random-hyperplane LSH.  Each
  vector gets a ``num_planes``-bit signature (hyperplane weights derived
  deterministically from xxhash64(plane, dim) parity — no RNG state, no
  driver-side plane matrix, reproducible across runs).  Vectors collide
  into 2^num_planes buckets; scoring happens only within the query's
  bucket(s).  Shuffle volume: one row per (vector, table) instead of the
  full cross product.  Recall is tuned with num_tables (independent
  signatures), the standard multi-probe trade-off.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.pipeline.dedup import _dot, _norm


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, cos) — k rows per query, scored in
    double, deterministic tie-break on neighbor id.

    Round 13 (optimization guide §1.2 per-task work): each side's norm
    is projected ONCE per row BELOW the join, so the per-pair expression
    is just the dot product — cosine() inline recomputed both norms per
    (query, candidate) pair, tripling the higher-order-function work on
    the |Q|×|C| scored rows.  Same arithmetic in the same order
    (dot / (norm_q · norm_c)), so scores are bit-identical.
    """
    cand = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    scored = (
        cand.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qv"), F.col("cv")) / (F.col("q_norm") * F.col("c_norm"))).alias(
                "cos_exact"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_exact"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("cos_exact", 4).alias("cos"))
    )


def _hyperplane_bit(vec: Column, plane: Column | int, table: int) -> Column:
    """Sign bit of <w_plane, vec> where w_plane[d] = ±1 from
    xxhash64(table, plane, d) parity — deterministic pseudo-random
    hyperplanes materialized as expressions, never as driver state."""
    p = plane if isinstance(plane, Column) else F.lit(plane)
    signed = F.aggregate(
        F.zip_with(
            vec,
            F.sequence(F.lit(0), F.size(vec) - 1),
            lambda x, d: x.cast("double")
            * F.when(
                F.xxhash64(
                    F.concat_ws("_", F.lit(table), p.cast("string"), d.cast("string"))
                ).bitwiseAND(F.lit(1))
                == 1,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(signed >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_signature(vec: Column, num_planes: int = 12, table: int = 0) -> Column:
    """num_planes-bit bucket id for one LSH table."""
    sig = F.lit(0)
    for p in range(num_planes):
        sig = sig * 2 + _hyperplane_bit(vec, p, table)
    return sig


def lsh_bucketed_ann(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    num_tables: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score only candidates sharing an LSH bucket with
    the query in at least one of ``num_tables`` tables."""
    def with_buckets(df: DataFrame, id_alias: str, vec_alias: str, tbl_alias: str) -> DataFrame:
        buckets = F.array(
            *[lsh_signature(F.col(vec_col), num_planes, t) for t in range(num_tables)]
        )
        # per-row norm projected below the join/distinct — see
        # brute_force_topk's round-13 note (same arithmetic, bit-identical)
        return df.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(vec_alias),
            _norm(F.col(vec_col)).alias(f"{vec_alias}_norm"),
            F.posexplode(buckets).alias(tbl_alias, f"{id_alias}_bucket"),
        )

    cand = with_buckets(emb, "neighbor_id", "cv", "tbl_c")
    q = with_buckets(queries, "query_id", "qv", "tbl_q")
    paired = (
        cand.join(
            F.broadcast(q),
            (F.col("tbl_c") == F.col("tbl_q"))
            & (F.col("neighbor_id_bucket") == F.col("query_id_bucket"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select("query_id", "neighbor_id", "qv", "cv", "qv_norm", "cv_norm")
        .distinct()
    )
    scored = paired.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("qv"), F.col("cv")) / (F.col("qv_norm") * F.col("cv_norm"))).alias(
            "cos_exact"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_exact"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("cos_exact", 4).alias("cos"))
    )
