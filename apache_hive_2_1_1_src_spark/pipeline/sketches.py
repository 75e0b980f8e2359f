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


def _mg_merge(summary: dict, counts: dict, capacity: int) -> dict:
    """Merge exact batch counts into an MG(``capacity``) summary via the
    mergeable-summaries rule (Agarwal et al. 2012, "Mergeable
    summaries" §3): pointwise add, then if more than ``capacity`` items
    remain, subtract the (capacity+1)-th largest count from every item
    and drop the non-positive ones.  The merged summary keeps the
    streaming MG error bound (≤ n/(capacity+1) undercount per item), so
    the containment guarantee heavy_hitters relies on is unchanged —
    while the per-token Python loop becomes a C-speed value_counts."""
    for item, cnt in counts.items():
        summary[item] = summary.get(item, 0) + int(cnt)
    if len(summary) > capacity:
        sub = sorted(summary.values(), reverse=True)[capacity]
        summary = {t: c - sub for t, c in summary.items() if c > sub}
    return summary


def _mg_sketch_rows(tokens: DataFrame, token_col: str, capacity: int) -> DataFrame:
    """Per-partition Misra–Gries summaries, materialized once.

    Emits the ≤ capacity candidate tokens per partition PLUS one
    sentinel row (token NULL, ``_n`` = rows seen in the partition) so a
    caller that also needs the stream length N (heavy_hitters'
    containment certificate) gets it from this same pass instead of a
    second full scan of the token stream (round 14, guide §1.2: don't
    re-read the corpus for a scalar the sketch pass already knows).
    localCheckpoint because two consumers (candidate set, N) would
    otherwise re-run the kernel; the output is ≤ (capacity+1) ×
    partitions rows."""
    import pandas as pd

    def sketch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        summary: dict[str, int] = {}
        seen = 0
        for pdf in batches:
            seen += len(pdf)
            counts = pdf[token_col].dropna().value_counts().to_dict()
            summary = _mg_merge(summary, counts, capacity)
        yield pd.DataFrame(
            {
                token_col: list(summary.keys()) + [None],
                "_n": [0] * len(summary) + [seen],
            }
        )

    return tokens.mapInPandas(
        sketch, f"{token_col} string, _n long"
    ).localCheckpoint(eager=False)


def mg_candidates(tokens: DataFrame, token_col: str, capacity: int) -> DataFrame:
    """Pass 1: per-partition Misra–Gries summaries → the unioned
    candidate token set (≤ capacity rows per partition).  Each Arrow
    batch is reduced with vectorized ``value_counts`` and merged into
    the running summary with the MG merge rule — O(capacity) state, no
    per-row Python."""
    out = _mg_sketch_rows(tokens, token_col, capacity)
    return out.filter(F.col(token_col).isNotNull()).select(token_col).distinct()


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
    # pass 1 also yields N via its sentinel rows (round 14): the old
    # shape ran a THIRD full pass (tokens.count()) for the certificate's
    # floor — the sketch pass already sees every row
    sketch_rows = _mg_sketch_rows(tokens, "token", capacity)
    candidates = sketch_rows.filter(F.col("token").isNotNull()).select(
        "token"
    ).distinct()
    # pass 2: exact counts for candidates only (broadcast semi filter)
    exact = (
        tokens.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = exact.orderBy(F.desc("cnt"), F.asc("token")).limit(top_n)
    total = sketch_rows.agg(F.sum("_n")).collect()[0][0] or 0
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
        pos: dict[str, tuple[int, ...]] = {}  # token → its depth cells
        for pdf in batches:
            # collapse duplicates first: one hash per UNIQUE token per
            # batch (+ a memo across batches), counts added in bulk —
            # the merged table is identical because cell updates are
            # pure addition
            for tok, cnt in pdf[token_col].dropna().value_counts().items():
                cols = pos.get(tok)
                if cols is None:
                    cols = tuple(_cm_hash(tok, r, width) for r in range(depth))
                    pos[tok] = cols
                n = int(cnt)
                for r in range(depth):
                    key = (r, cols[r])
                    cells[key] = cells.get(key, 0) + n
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
    # Round 14 (guide §5): the exact count table feeds BOTH probe
    # branches (top-n, alpha-first) and is then re-planned in the
    # returned join — four full explode+aggregate passes without
    # materialization (two under probes.collect(), two in the final
    # plan).  One localCheckpoint runs the aggregation once; everything
    # downstream is limit/join work over the vocabulary-sized table.
    exact = (
        tokens.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
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


# ---------------------------------------------------------- HyperLogLog
def hll_registers(
    keys: DataFrame, key_col: str, p: int = 12
) -> DataFrame:
    """HyperLogLog register table (Flajolet et al. 2007) built entirely
    JVM-side: ``xxhash64(key)`` → low ``p`` bits pick one of m = 2^p
    registers, the remaining 64−p bits' leading-zero run (+1) is the
    rank.  The most-significant-bit position is computed EXACTLY with
    ``length(bin(x))`` — no float log2, so no off-by-one at power-of-two
    boundaries.  Output: (bucket, M) with one row per non-empty
    register (≤ m rows total, map-side-combined groupBy — nothing
    corpus-sized concentrates).

    This is the sharding primitive that makes cardinality counting free
    at 100 TB: each shard/partition builds its ≤ m-row register table
    independently, and register-wise MAX merges them losslessly
    (certified by hll_report's merge_exact_ok)."""
    m = 1 << p
    rem_bits = 64 - p
    h = F.xxhash64(F.col(key_col))
    bucket = h.bitwiseAND(F.lit(m - 1)).alias("bucket")
    rem = F.shiftrightunsigned(h, p)
    # rank = leading zeros of the (64-p)-bit remainder + 1
    #      = rem_bits - msb(rem) + 1, with msb(0) treated as 0
    msb = F.when(rem == 0, F.lit(0)).otherwise(F.length(F.bin(rem)))
    rank = (F.lit(rem_bits) - msb + F.lit(1)).cast("int").alias("rank")
    return (
        keys.select(bucket, rank)
        .groupBy("bucket")
        .agg(F.max("rank").alias("M"))
    )


def hll_estimate(registers: DataFrame, p: int = 12) -> float:
    """Cardinality estimate from a register table: the raw HLL harmonic
    mean with the small-range linear-counting correction (the two
    branches of Flajolet et al. 2007 §4; large-range correction is
    unnecessary with 64-bit hashes).  The input is ≤ 2^p rows, so the
    driver-side finish is bounded regardless of corpus size."""
    import math

    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    rows = registers.collect()
    zeros = m - len(rows)
    denom = sum(2.0 ** -r.M for r in rows) + zeros  # empty register → 2^0
    raw = alpha * m * m / denom
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)  # linear counting
    return raw


def hll_report(
    docs: DataFrame, text_col: str = "text", p: int = 12
) -> DataFrame:
    """Distinct-token cardinality with two in-plan certificates:

    * ``merge_exact_ok`` — registers built independently on the
      even-doc_id and odd-doc_id halves and merged by register-wise MAX
      are IDENTICAL to the whole-corpus registers (HLL's losslessness
      under sharding — the property that lets 1000 executors each
      sketch their shard and union for free).
    * ``err_ok`` — the merged estimate is within 5% of the exact
      distinct count (3σ for m=4096 is ~4.9%; linear-counting regime is
      tighter).

    The reported count itself is the EXACT distinct (one
    map-side-combined distinct over tokens), so the operator is fully
    oracle-checkable; the sketch's claims ride along as booleans.

    Round 13 (guide §2.4/§5): the operator used to run THREE driver
    actions (merge mismatch count, register collect + Python estimate,
    exact distinct count), each re-scanning the corpus and re-running
    the tokenizing explode — six scans per call, and a .collect() in
    the query path.  It is now ONE plan / one action: the (parity,
    token) stream is materialized once (localCheckpoint), the three
    register tables aggregate independently from it (full is NOT
    derived from the parity registers, so merge_exact_ok certifies the
    same independence as before), and the Flajolet estimate — the same
    harmonic mean + linear-counting branch hll_estimate computes
    driver-side — is a ≤2^p-row SQL aggregate whose scalar rides the
    final single-row crossJoin."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    toks = docs.select(
        (F.col("doc_id") % 2).alias("par"),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
        ).alias("token"),
    ).localCheckpoint(eager=False)
    full = hll_registers(toks, "token", p)
    even = hll_registers(toks.filter(F.col("par") == 0), "token", p)
    odd = hll_registers(toks.filter(F.col("par") == 1), "token", p)
    merged = (
        even.withColumnRenamed("M", "Me")
        .join(odd.withColumnRenamed("M", "Mo"), "bucket", "full_outer")
        .select(
            "bucket",
            F.greatest(
                F.coalesce("Me", F.lit(0)), F.coalesce("Mo", F.lit(0))
            ).alias("M"),
        )
    )
    mismatch_cnt = (
        full.withColumnRenamed("M", "Mf")
        .join(merged, "bucket", "full_outer")
        .filter(F.coalesce("Mf", F.lit(-1)) != F.coalesce("M", F.lit(-1)))
        .agg(F.count(F.lit(1)).alias("n_mismatch"))
    )
    # hll_estimate's two branches as a register-table aggregate:
    # denom = Σ 2^-M over non-empty registers + #empty (2^0 each)
    est_agg = merged.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("M"))).alias("s"),
        F.count(F.lit(1)).alias("nonzero"),
    ).select(
        F.when(
            (
                F.lit(alpha * m * m)
                / (F.col("s") + (F.lit(m) - F.col("nonzero")))
                <= F.lit(2.5 * m)
            )
            & (F.col("nonzero") < m),
            F.lit(float(m)) * F.log(F.lit(float(m)) / (F.lit(m) - F.col("nonzero"))),
        )
        .otherwise(
            F.lit(alpha * m * m) / (F.col("s") + (F.lit(m) - F.col("nonzero")))
        )
        .alias("est")
    )
    exact = toks.agg(F.countDistinct("token").alias("n_distinct_exact"))
    return (
        exact.crossJoin(mismatch_cnt)
        .crossJoin(est_agg)
        .select(
            F.col("n_distinct_exact").cast("long").alias("n_distinct_exact"),
            (F.col("n_mismatch") == 0).alias("merge_exact_ok"),
            (
                F.abs(F.col("est") - F.col("n_distinct_exact"))
                <= 0.05 * F.col("n_distinct_exact")
            ).alias("err_ok"),
        )
    )
