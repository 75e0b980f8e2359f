"""Dataset-curation operators for a training-data pipeline: deterministic
splits, token-budget sequence packing, benchmark-contamination checks,
quality-filter funnels, stratified sampling.

All hot paths are JVM expressions or single-shuffle window/agg plans:

* ``train_split`` — hash-bucket assignment is a stateless projection
  (md5 of a stable key), so the split is reproducible across runs,
  cluster sizes, and partitionings; no shuffle at all until the
  per-split report aggregation.
* ``sequence_packing`` — one window (partition by stratum, order by
  doc_id) computes running token totals; pack ids come from integer
  division of the running total.  At 100 TB the stratum key bounds the
  window partition, and packing runs per-stratum in parallel.
* ``contamination_check`` — explodes word-5-gram shingles (regex
  lookahead, one pass, no HOF-per-row quadratic expansion) and joins
  corpus shingles against the *broadcast* benchmark shingle set: the
  benchmark side is small by construction, so no full shuffle of the
  corpus ever happens.
* ``quality_funnel`` — every stage is a conditional aggregate over one
  scan (no per-stage re-scan of the corpus).
* ``stratified_sample`` — ``DataFrame.sampleBy``: per-stratum Bernoulli
  sampling, seeded, executor-local (no shuffle).

Mirrors the reference's sampling/bucketing surface (TABLESAMPLE,
ql/src/java/org/apache/hadoop/hive/ql/parse/SplitSample.java:1) extended
with the curation steps an LLM corpus build needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.pipeline.dedup import _word_shingles
from apache_hive_2_1_1_src_spark.pipeline.text import _n_words, _words

_HEX = "0123456789abcdef"


def _split_bucket(doc_id: Column, source: Column) -> Column:
    """Stable 0-15 bucket from the last md5 nibble of ``doc_id:source``."""
    h = F.md5(F.concat_ws(":", doc_id.cast("string"), source))
    return F.instr(F.lit(_HEX), F.substring(h, 32, 1)) - F.lit(1)


def train_split(
    docs: DataFrame, train_buckets: int = 12, val_buckets: int = 2
) -> DataFrame:
    """Assign each document to train/val/test by hashed bucket (12/2/2
    sixteenths by default) and report per-(lang, split) counts."""
    bucket = _split_bucket(F.col("doc_id"), F.col("source"))
    split = (
        F.when(bucket < train_buckets, "train")
        .when(bucket < train_buckets + val_buckets, "val")
        .otherwise("test")
    )
    return (
        docs.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "split")
    )


def sequence_packing(
    docs: DataFrame, budget: int = 256, stratum: str = "lang", shards: int = 16
) -> DataFrame:
    """Pack documents into fixed token-budget sequences: within each
    (stratum, shard) — ordered by doc_id — a document joins the pack
    whose id is ``floor(running_total_before / budget)`` — the
    streaming-friendly chunked packing used for context-window
    construction.  Returns one row per pack with doc and token totals.

    The running total is inherently sequential, so the window partition
    IS the parallelism unit.  Partitioning by the raw stratum alone
    (``lang`` has ~4 values) would funnel ~25 TB per language through
    single sorted tasks at 100 TB; instead the stratum is composited
    with a deterministic md5 shard of doc_id (``shards`` substrata), and
    pack ids are shard-local.  Semantics change vs a single global
    sequence per stratum: packs never span shards, so each stratum gets
    up to ``shards`` partially-filled trailing packs instead of one —
    the standard trade data pipelines accept, since packing quality
    depends only on shard token mass being >> budget.  Raise ``shards``
    so each substratum fits one task comfortably (100 TB / 4 langs /
    budget-sized packs → thousands of shards)."""
    tokens = _n_words(F.col("text"))
    # 4 hex chars → 65536 distinct values, so ``shards`` scales to the
    # thousands the docstring calls for (a single hex char would silently
    # cap the substrata at 16, keeping the giant-window funnel)
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % shards
    )
    w = (
        Window.partitionBy(stratum, "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    packed = docs.select(
        F.col(stratum), "doc_id", tokens.alias("n_tokens")
    ).withColumn("shard", shard.cast("int")).withColumn(
        "pack_id", (cum_before / budget).cast("int")
    )
    return (
        packed.groupBy(stratum, "shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy(stratum, "shard", "pack_id")
    )


def contamination_check(
    docs: DataFrame, benchmark_mod: int = 97, n: int = 5
) -> DataFrame:
    """Flag corpus documents sharing word-``n``-gram shingles with a
    benchmark set (here: every ``benchmark_mod``-th doc, standing in for
    an eval suite).  The benchmark shingle set is broadcast — corpus
    rows never shuffle, which is what makes this viable at 100 TB."""
    shingled = docs.select(
        "doc_id",
        F.array_distinct(_word_shingles(F.col("text"), n)).alias("shingles"),
    )
    is_bench = F.col("doc_id") % benchmark_mod == 0
    bench = (
        shingled.filter(is_bench)
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
    )
    corpus = shingled.filter(~is_bench).select(
        "doc_id",
        F.size("shingles").alias("n_shingles"),
        F.explode("shingles").alias("shingle"),
    )
    return (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .withColumn(
            "contamination",
            F.round(F.col("n_hits") / F.greatest(F.col("n_shingles"), F.lit(1)), 6),
        )
        .orderBy("doc_id")
    )


def quality_funnel(docs: DataFrame) -> DataFrame:
    """Per-stage survivor counts of a cleaning pipeline (lang filter →
    length band → stopword floor → exact dedup), computed as conditional
    aggregates over ONE scan — no per-stage job, no re-read."""
    words = _words(F.col("text"))
    stop_hits = F.size(
        F.array_intersect(
            words,
            F.array(*[F.lit(w) for w in ("the", "a", "an", "and", "or", "of",
                                         "to", "in", "is", "it")]),
        )
    )
    staged = docs.select(
        "lang",
        "text",
        F.size(words).alias("n_words"),
        stop_hits.alias("n_stop"),
    ).select(
        "text",
        (F.col("lang") == "en").alias("s1"),
        ((F.col("lang") == "en") & F.col("n_words").between(10, 500)).alias("s2"),
        (
            (F.col("lang") == "en")
            & F.col("n_words").between(10, 500)
            & (F.col("n_stop") >= F.col("n_words") * 0.05)
        ).alias("s3"),
    )
    return staged.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("s1").cast("bigint")).alias("n_lang"),
        F.sum(F.col("s2").cast("bigint")).alias("n_len"),
        F.sum(F.col("s3").cast("bigint")).alias("n_stop_ok"),
        F.count_distinct(F.when(F.col("s3"), F.col("text"))).alias("n_unique"),
    )


def stratified_sample(
    docs: DataFrame, fractions: dict[str, float], seed: int = 42
) -> DataFrame:
    """Seeded per-stratum Bernoulli sample (``sampleBy``) — the standard
    way to rebalance language/source mix without a shuffle.  Sampling
    decisions are made executor-local per row; determinism is per
    (seed, partitioning of the source files)."""
    return docs.sampleBy("lang", fractions, seed=seed).select(
        "doc_id", "lang", "source"
    )


def domain_mix(
    docs: DataFrame, keep_sixteenths: dict[str, int], default_keep: int = 2
) -> DataFrame:
    """Rebalance the corpus to a target domain mixture by deterministic
    hash sampling: a document survives iff its stable md5 bucket (0-15,
    same key as ``train_split``) is below its source's keep quota.

    Hash-based, so the mixture is reproducible across runs, cluster
    sizes, and partitionings (unlike ``sample``'s partition-seeded
    Bernoulli draws), and composable with the split assignment — a doc's
    split never changes when the mix is retuned.  Per-row projection,
    no shuffle until the report aggregation."""
    bucket = _split_bucket(F.col("doc_id"), F.col("source"))
    quota_map = F.create_map(
        *[F.lit(x) for kv in sorted(keep_sixteenths.items()) for x in kv]
    )
    quota = F.coalesce(quota_map[F.col("source")], F.lit(default_keep))
    return (
        docs.select("source", (bucket < quota).alias("kept"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("kept").cast("bigint")).alias("n_kept"),
        )
        .withColumn("kept_frac", F.round(F.col("n_kept") / F.col("n_total"), 6))
        .orderBy("source")
    )


def corpus_pipeline(
    docs: DataFrame,
    min_score: float = 0.2,
    chunk_tokens: int = 50,
    overlap: int = 10,
) -> DataFrame:
    """End-to-end curation: quality filter → exact-dedup canonical → PII
    scrub → context-length chunking, composed as ONE DataFrame chain so
    Catalyst plans the whole funnel together (the scan serves every stage;
    nothing materializes between steps).

    Stage shapes at 100 TB: the quality filter and scrub are narrow; the
    dedup is a single window over md5(content) (hash-partitioned, skew
    bounded by the largest duplicate group); chunking is narrow explode.
    One shuffle total for the entire pipeline.
    """
    from apache_hive_2_1_1_src_spark.pipeline.text import (
        chunk_documents,
        pii_scrub,
        quality_score_col,
    )

    # round 13 (guide §2.4): filter on the score expression directly —
    # the previous shape ran a second quality_features pass and
    # broadcast-joined its surviving doc_ids back to the scan; the score
    # is a pure per-row expression, so one scan + one Filter computes
    # the identical kept set with no join
    kept = docs.filter(quality_score_col("text") >= min_score)
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    canon = (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    scrubbed = pii_scrub(canon).select(
        "doc_id", F.col("text_scrubbed").alias("text")
    )
    return chunk_documents(scrubbed, chunk_tokens=chunk_tokens, overlap=overlap)


def hash_stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    stratum_col: str = "lang",
) -> DataFrame:
    """Deterministic hash-stratified rebalance — the reproducible sibling
    of ``stratified_sample``: a doc survives iff the first 4 md5 nibbles
    of its key (a 0..65535 hash space) fall below its stratum's threshold
    ``floor(frac * 65536)`` (hex-string compare — lowercase hex of equal
    length orders numerically).  Same device as the q133 TABLESAMPLE and
    p26 domain-mix: layout- and partitioning-independent, stable when the
    mix is retuned, and exactly reproducible by any engine — unlike
    ``sampleBy``'s partition-seeded Bernoulli draws.  Strata absent from
    ``fractions`` are dropped.  Per-row projection, no shuffle.  Returns
    the surviving rows with ALL input columns (callers project)."""

    def thr_hex(frac: float) -> str:
        # frac >= 1.0 would format to 5 hex chars ('10000'), which
        # compares LESS than most 4-char hashes and silently drops ~94%
        # of the stratum — 'g' sorts after every hex char, so it means
        # keep-all in both engines
        return "g" if frac >= 1.0 else format(max(int(frac * 65536), 0), "04x")

    thr_map = F.create_map(
        *[
            F.lit(x)
            for stratum, frac in sorted(fractions.items())
            for x in (stratum, thr_hex(frac))
        ]
    )
    h4 = F.substring(F.md5(F.col(key_col).cast("string")), 1, 4)
    thr = thr_map[F.col(stratum_col)]
    return docs.filter(thr.isNotNull() & (h4 < thr))


def shuffle_shards(
    docs: DataFrame, n_shards: int = 16, key_col: str = "doc_id"
) -> DataFrame:
    """Deterministic corpus-shuffle MANIFEST for training order: every
    doc gets a pseudorandom-but-stable sort key (md5 of its id) and a
    shard (first md5 nibble, 0..15 for 16 shards); training reads shards
    in order, rows within a shard ordered by sort key — reproducible
    across runs and cluster layouts (the property epoch-seeded
    ``orderBy(rand())`` lacks) and needing no global sort.  This function
    computes the per-shard digest (shard, n_docs, n_chars_total,
    first_key, last_key) a training job checks before reading; the
    actual file write, when wanted, is the caller's
    ``df.repartition('shard').sortWithinPartitions('sort_key').write...``
    over the same two derived columns."""
    if n_shards != 16:
        raise ValueError("single-nibble sharding supports n_shards=16")
    h = F.md5(F.col(key_col).cast("string"))
    # derive the shard from the SAME h expression (conv of its first
    # nibble) rather than re-hashing — one hash definition, CSE-friendly
    shard = F.conv(F.substring(h, 1, 1), 16, 10).cast("int")
    return (
        docs.select(shard.alias("shard"), h.alias("sort_key"), F.col("n_chars"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars_total"),
            F.min("sort_key").alias("first_key"),
            F.max("sort_key").alias("last_key"),
        )
    )


def epoch_weighted_mix(
    docs: DataFrame,
    weights: dict,
    default_weight: float = 1.0,
    id_col: str = "doc_id",
    domain_col: str = "source",
) -> DataFrame:
    """Epoch-weighted domain mixing — the LLaMA/GPT-style data recipe
    where high-quality domains are UPSAMPLED (seen for >1 epoch) and
    bulk web text runs below one epoch: weight 2.5 means every doc
    appears twice plus a 50%-probability third copy.

    * integer part: ``explode(sequence(...))`` replication (per-row,
      narrow — no shuffle, no driver loop);
    * fractional part: one extra copy gated by a deterministic md5
      threshold on (id, 'epoch') — reproducible across runs and
      cluster layouts, exactly the p22/p26 hash-sampling idiom;
    * ``copy_id`` disambiguates replicas for downstream shuffling/
      packing (p38/p19 consume it like any row id).

    100 TB: output volume = Σ w_d·|d| by construction; everything is a
    flat map, so the mix composes with the shard shuffle (p38) without
    adding a shuffle of its own.
    """
    w_map = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    w = F.coalesce(w_map[F.col(domain_col)], F.lit(float(default_weight)))
    n_whole = F.floor(w).cast("int")
    frac = w - n_whole
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit("epoch"))), 1, 8),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    n_copies = (n_whole + F.when(u < frac, 1).otherwise(0)).alias("_n")
    rep = docs.withColumn("_n", n_copies).filter(F.col("_n") >= 1)
    return rep.select(
        "*", F.explode(F.sequence(F.lit(1), F.col("_n"))).alias("copy_id")
    ).drop("_n")


def dsir_resample(
    docs: DataFrame,
    target_source: str = "src0",
    k: int = 200,
    dim: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "source",
) -> DataFrame:
    """DSIR-style data selection via importance resampling (Xie et al.
    2023, "Data Selection for Language Models via Importance Resampling"):
    score every document by the log likelihood ratio of a hashed-unigram
    LM fit on a *target* domain vs the raw corpus, then draw the top-k
    under Gumbel perturbation (Gumbel-top-k ≡ sampling without
    replacement proportional to the importance weights).

    Relational plan, mirroring the reference's two-pass stats shape
    (ANALYZE-then-query, ql/.../stats/StatsUtils.java:1) rather than any
    driver-side model fit:

    1. explode tokens → md5-hash into ``dim`` feature buckets (the
       hashing trick — same idiom as classifier_score/p41);
    2. two feature-count tables (target slice, whole corpus) — one
       groupBy shuffle each over a ``dim``-row result, then broadcast;
    3. per-doc score = Σ_tok [ln(tc+1) − ln(rc+1) + ln(R+dim) − ln(T+dim)]
       (add-one smoothing; the normalizer folds into the per-token term);
    4. deterministic Gumbel key from md5(doc_id‖'dsir') — reproducible
       across runs/cluster layouts like every sampling op here;
    5. global top-k via orderBy().limit(k): Catalyst plans
       TakeOrderedAndProject — fully distributed, never a
       single-partition window (the p23-seed lesson).

    100 TB: the feature tables are ``dim`` rows regardless of corpus
    size, both joins stay broadcast, and the only corpus-sized shuffles
    are the two feature-count groupBys and the per-doc aggregation.

    Returns top-k rows of (doc_id, n_tokens, log_w, samp_key).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(domain_col).alias("src"),
        F.explode(_words(F.col(text_col))).alias("tok"),
    )
    feat = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 6), 16, 10).cast("long") % dim
    ).alias("f")
    feats = toks.select("doc_id", "src", feat)
    # Round 14 (guide §2.4/§5): the raw and target feature counts were
    # two separate groupBys joined on f — and the ``dim``-row table fed
    # both the totals aggregate and the weight projection, so the corpus
    # explode+hash was planned FIVE times (raw+tgt under lw, raw+tgt
    # again under totals, once more for scoring).  One conditional
    # aggregate computes rc and tc in a single pass (tc = tokens from
    # the target slice; buckets with no target tokens get 0, exactly the
    # old left-join + fill), and the ≤dim-row result is checkpointed so
    # totals/lw read it instead of re-running the pass.  Corpus passes:
    # 5 → 2 (this table + the per-doc scoring join).
    tab = (
        feats.groupBy("f")
        .agg(
            F.count(F.lit(1)).alias("rc"),
            F.count(F.when(F.col("src") == target_source, 1)).alias("tc"),
        )
        .localCheckpoint(eager=False)
    )
    totals = tab.agg(F.sum("rc").alias("R"), F.sum("tc").alias("T"))
    lw = tab.crossJoin(F.broadcast(totals)).select(
        "f",
        (
            F.log(F.col("tc") + 1)
            - F.log(F.col("rc") + 1)
            + F.log(F.col("R") + F.lit(dim))
            - F.log(F.col("T") + F.lit(dim))
        ).alias("lw"),
    )
    scored = (
        feats.join(F.broadcast(lw), "f")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("lw"), 6).alias("log_w"),
        )
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("dsir"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    keyed = scored.withColumn(
        "samp_key", F.round(F.col("log_w") - F.log(-F.log(u)), 6)
    )
    return keyed.orderBy(F.desc("samp_key"), "doc_id").limit(k)


def epoch_shuffle(
    docs: DataFrame, seed: int = 1, n_shards: int = 32, key_col: str = "doc_id"
) -> DataFrame:
    """Seeded per-epoch global permutation as (doc_id, shard, pos): the
    row-level training-order manifest that ``shuffle_shards`` digests.

    Epoch N passes ``seed=N`` and gets an independent pseudorandom order;
    the same seed is bit-identical across runs and cluster layouts.  No
    global sort: the md5 sort key spreads uniformly over ``n_shards``
    hash shards, and ``row_number`` runs per-shard (at 100 TB, n_shards
    scales with the corpus so each window partition stays executor-sized
    — the same composite-stratum discipline as sequence_packing).  The
    global order is (shard, pos) lexicographic, which a trainer consumes
    shard-by-shard.
    """
    h = F.md5(F.concat_ws("|", F.lit(f"epoch{seed}"), F.col(key_col).cast("string")))
    shard = (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % n_shards).cast("int")
    keyed = docs.select(F.col(key_col), shard.alias("shard"), h.alias("sort_key"))
    w = Window.partitionBy("shard").orderBy("sort_key", key_col)
    return keyed.withColumn("pos", F.row_number().over(w)).select(
        key_col, "shard", "pos"
    )


def length_bucketed_batching(
    docs: DataFrame,
    min_bucket: int = 16,
    max_bucket: int = 1024,
) -> DataFrame:
    """Length-bucketed batching report for inference/training serving:
    docs grouped into power-of-two token-length buckets (the
    bucketed-batching trick that replaces pad-to-global-max), with the
    padding waste each bucket actually pays vs what naive global
    padding would cost.

    Everything is closed-form JVM arithmetic (log2/ceil/pow over the
    whitespace token count), one groupBy — at 100 TB this is a single
    map-side-combined aggregation, and the bucket id doubles as the
    shuffle/write key for the downstream batch writer.

    Returns per-bucket (bucket_size, n_docs, total_tokens,
    padded_tokens, waste_pct) ordered by bucket.
    """
    n_tok = _n_words(F.col("text"))
    clamped = F.greatest(
        F.lit(min_bucket),
        F.least(
            F.lit(max_bucket),
            F.pow(F.lit(2.0), F.ceil(F.log2(n_tok.cast("double")))).cast("long"),
        ),
    )
    per = (
        docs.select(clamped.alias("bucket_size"), n_tok.alias("n_tok"))
        .groupBy("bucket_size")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
        )
        .withColumn(
            "padded_tokens", (F.col("bucket_size") * F.col("n_docs")).cast("long")
        )
        .withColumn(
            "waste_pct",
            F.round(
                (F.col("padded_tokens") - F.col("total_tokens"))
                / F.col("padded_tokens"),
                4,
            ),
        )
    )
    return per.orderBy("bucket_size")


def temperature_rebalance(
    docs: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    temperature: float = 2.0,
    target_frac: float = 0.5,
) -> DataFrame:
    """Temperature-based mixture rebalancing (the multilingual sampling
    rule from the mBERT/XLM-R line of work): languages are sampled with
    probability proportional to n_l^(1/T) instead of n_l, flattening the
    head and up-weighting the tail as T grows; T=1 keeps the natural
    distribution.

    Per-group keep probability: with weights w_l = n_l^(1/T) / Z and a
    corpus budget of ``target_frac * N`` documents, group l keeps
    p_l = min(1, w_l * target_frac * N / n_l), rounded to 6 dp so the
    SQL oracle reproduces the float exactly.  Each doc keeps
    deterministically iff md5(doc_id)'s first 32 bits, as a fraction,
    fall under p_l — no RNG state, reproducible across runs/engines.

    Scale shape: one map-side-combined count per group (tiny result),
    per-group plan broadcast back onto the corpus, then pure-codegen
    hash compare — a single wide pass over the data, no shuffle of the
    corpus itself.

    Returns per-group (group, n_before, keep_p, n_kept), ordered.
    """
    # tiny per-group table, but its subplan is a full corpus pass and it
    # feeds BOTH the normalizer aggregate and the plan projection —
    # checkpoint it so the count pass runs once (round 14, guide §5)
    stats = (
        docs.groupBy(F.col(group_col).alias("grp"))
        .agg(F.count(F.lit(1)).alias("n_l"))
        .localCheckpoint(eager=False)
    )
    tot = stats.agg(
        F.sum("n_l").alias("n_total"),
        F.sum(F.pow(F.col("n_l").cast("double"), 1.0 / temperature)).alias("z"),
    )
    plan = (
        stats.crossJoin(F.broadcast(tot))
        .withColumn(
            "keep_p",
            F.round(
                F.least(
                    F.lit(1.0),
                    (F.pow(F.col("n_l").cast("double"), 1.0 / temperature) / F.col("z"))
                    * (F.lit(float(target_frac)) * F.col("n_total"))
                    / F.col("n_l"),
                ),
                6,
            ),
        )
        .select("grp", "n_l", "keep_p")
    )
    frac = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    kept = (
        docs.select(F.col(group_col).alias("grp"), F.col(id_col))
        .join(F.broadcast(plan), "grp")
        .withColumn("keep", frac < F.col("keep_p"))
        .groupBy("grp", "n_l", "keep_p")
        .agg(F.sum(F.col("keep").cast("long")).alias("n_kept"))
    )
    return kept.select(
        F.col("grp").alias(group_col),
        F.col("n_l").alias("n_before"),
        "keep_p",
        "n_kept",
    ).orderBy(group_col)
