"""Frequency-sketch operators: distributed Misra–Gries heavy hitters.

The classic two-pass heavy-hitters plan for a 100 TB corpus where the
token domain doesn't fit anywhere:

1. **Sketch pass** — each partition summarizes its token stream with a
   Misra–Gries summary of capacity ``k`` (Misra & Gries 1982, "Finding
   repeated elements"; the streaming summary behind Spark's own
   ``count_min``-adjacent sketch work).  The union of per-partition
   candidate sets provably contains every token with global frequency
   > N/k: by pigeonhole, a token that frequent must exceed n_p/k in at
   least one partition, and an MG(k) summary never evicts an item whose
   local count exceeds n_p/k.
2. **Exact pass** — recount ONLY the candidate tokens (a bounded set,
   ≤ k × partitions) with an ordinary filtered groupBy, then take the
   top-n.  Results are therefore EXACT for every token above the N/k
   guarantee line — not approximations — which is what makes the
   operator fully oracle-checkable.

The returned report carries an in-plan ``guarantee_ok`` certificate:
the n-th count must exceed N/k, proving the sketch's containment bound
covers the whole reported top-n.

Scale design: pass 1 is mapInPandas (one bounded dict per partition,
O(k) memory, no shuffle); the candidate union is a distinct over
≤ k × partitions rows; pass 2 is a broadcast-semi-join filter on the
token stream followed by one map-side-combined groupBy.  Nothing
corpus-sized ever concentrates.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_update(summary: dict, item: str, capacity: int) -> None:
    """One Misra–Gries step: count if tracked, admit if room, else
    decrement-all (the classic ``k``-way cancellation)."""
    if item in summary:
        summary[item] += 1
    elif len(summary) < capacity:
        summary[item] = 1
    else:
        for key in list(summary):
            summary[key] -= 1
            if summary[key] == 0:
                del summary[key]


def mg_candidates(tokens: DataFrame, token_col: str, capacity: int) -> DataFrame:
    """Pass 1: per-partition Misra–Gries summaries → the unioned
    candidate token set (≤ capacity rows per partition)."""
    import pandas as pd

    def sketch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        summary: dict[str, int] = {}
        for pdf in batches:
            for tok in pdf[token_col]:
                if tok is not None:
                    _mg_update(summary, tok, capacity)
        yield pd.DataFrame({token_col: list(summary.keys())})

    return tokens.mapInPandas(sketch, f"{token_col} string").distinct()


def heavy_hitters(
    docs: DataFrame,
    text_col: str = "text",
    top_n: int = 20,
    capacity: int = 200,
) -> DataFrame:
    """Exact top-``top_n`` tokens by count via sketch-then-recount.

    Output: (token, cnt, guarantee_ok) ordered by cnt desc, token asc.
    ``guarantee_ok`` certifies cnt_n > N/capacity — the containment
    bound under which the sketch provably missed nothing."""
    tokens = docs.select(
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
        ).alias("token")
    )
    candidates = mg_candidates(tokens, "token", capacity)
    # pass 2: exact counts for candidates only (broadcast semi filter)
    exact = (
        tokens.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = exact.orderBy(F.desc("cnt"), F.asc("token")).limit(top_n)
    total = tokens.count()
    floor = total / capacity
    return top.withColumn(
        "guarantee_ok", (F.col("cnt") > F.lit(floor)).cast("boolean")
    )


# ------------------------------------------------------------ Count-Min
def _cm_hash(token: str, row: int, width: int) -> int:
    import hashlib

    h = hashlib.md5(f"{row}:{token}".encode()).digest()
    return int.from_bytes(h[:8], "big") % width


def cm_sketch(
    tokens: DataFrame, token_col: str, width: int = 1024, depth: int = 4
) -> list[list[int]]:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): ``depth`` hash
    rows × ``width`` counters.  Built distributed — each partition emits
    its non-zero cells via mapInPandas, cells merge with one bounded
    groupBy (≤ width × depth rows), and only the merged ≤ w×d summary
    reaches the driver.  Estimates are biased high; the additive error
    is ≤ (e/width)·N with probability 1 − (1/e)^depth."""
    import pandas as pd

    def sketch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cells: dict[tuple[int, int], int] = {}
        for pdf in batches:
            for tok in pdf[token_col]:
                if tok is None:
                    continue
                for r in range(depth):
                    key = (r, _cm_hash(tok, r, width))
                    cells[key] = cells.get(key, 0) + 1
        if cells:
            rows, cols, counts = zip(*[(r, c, n) for (r, c), n in cells.items()])
        else:
            rows, cols, counts = (), (), ()
        yield pd.DataFrame({"r": rows, "c": cols, "n": counts})

    merged = (
        tokens.mapInPandas(sketch, "r int, c int, n long")
        .groupBy("r", "c")
        .agg(F.sum("n").alias("n"))
        .collect()
    )
    table = [[0] * width for _ in range(depth)]
    for row in merged:
        table[row.r][row.c] = row.n
    return table


def cm_estimate(table: list[list[int]], token: str) -> int:
    width, depth = len(table[0]), len(table)
    return min(table[r][_cm_hash(token, r, width)] for r in range(depth))


def cm_point_report(
    docs: DataFrame,
    text_col: str = "text",
    width: int = 1024,
    depth: int = 4,
    n_top: int = 10,
    n_alpha: int = 10,
) -> DataFrame:
    """Certify Count-Min point estimates against exact counts for a
    deterministic probe set: the exact top-``n_top`` tokens plus the
    ``n_alpha`` alphabetically-first tokens.  Output columns
    (token, cnt, over_ok, bound_ok): estimates must never undercount
    (over_ok) and must sit within the e/width additive bound
    (bound_ok) — the sketch's published guarantee, checked in-plan."""
    import math

    spark = docs.sparkSession
    tokens = docs.select(
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
        ).alias("token")
    )
    table = cm_sketch(tokens, "token", width, depth)
    total = sum(table[0])  # row 0 holds every token once
    eps_bound = math.ceil(math.e / width * total)
    exact = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    probes = (
        exact.orderBy(F.desc("cnt"), F.asc("token")).limit(n_top)
        .unionByName(exact.orderBy(F.asc("token")).limit(n_alpha))
        .distinct()
    )
    rows = probes.collect()
    est = {r.token: cm_estimate(table, r.token) for r in rows}
    est_df = spark.createDataFrame(
        [(t, int(v)) for t, v in est.items()], "token string, est long"
    )
    return (
        probes.join(est_df, "token")
        .select(
            "token",
            "cnt",
            (F.col("est") >= F.col("cnt")).alias("over_ok"),
            (F.col("est") <= F.col("cnt") + F.lit(eps_bound)).alias("bound_ok"),
        )
        .orderBy(F.desc("cnt"), F.asc("token"))
    )
