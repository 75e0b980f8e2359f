"""Registry entries for the LLM-pipeline operators (dedup / similarity /
text analysis / multimodal) — SURVEY.md's extension surface, first-class
deliverables per the brief.

Oracle coverage: everything SQL-expressible gets a full DuckDB oracle
(including the mapInPandas decode path, whose fake features are
deterministic functions of the bytes); only the LSH candidate generators
are rows-only (banded MinHash / hyperplane signatures have no reasonable
SQL equivalent), and each of those is pinned by pytest invariants instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.pipeline.dedup import (
    embedding_near_dups,
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_candidates,
    simhash_near_dups,
)
from apache_hive_2_1_1_src_spark.pipeline.multimodal import decode_blobs, with_blob_column
from apache_hive_2_1_1_src_spark.pipeline.similarity import brute_force_topk, lsh_bucketed_ann
from apache_hive_2_1_1_src_spark.pipeline.text import (
    fingerprint,
    language_id,
    quality_features,
    token_counts,
)
from apache_hive_2_1_1_src_spark.queries._util import t


def p01_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(t(spark, sf_dir, "documents")).orderBy("content_hash")


def p02_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH candidates + exact Jaccard verify (threshold .4)
    — FULL oracle (round 5, previously rows-only): the DuckDB side
    computes the exact all-pairs thresholded set, and the LSH pipeline's
    verified output must equal it.  Sound here because the corpus's true
    near-dups sit far above the threshold, where 32/8 banding detects
    with probability ≈1 (measured recall exactly 1.0 at sf0.001 AND
    sf0.01); the generic low-jaccard recall trade-off stays pinned in
    tests/test_pipeline_invariants.py, and the verify step guarantees
    no false positive can ever make the list longer than exact."""
    from apache_hive_2_1_1_src_spark.pipeline.dedup import minhash_dedup

    docs = t(spark, sf_dir, "documents")
    return minhash_dedup(docs, num_hashes=32, bands=8, threshold=0.4).orderBy(
        "id_a", "id_b"
    )


def p03_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard over same-source candidate pairs — the
    SQL-expressible fuzzy-dedup variant (full oracle).  Blocking key =
    source; at 100 TB the blocking key comes from LSH instead.

    Round 13: computed through the inverted shingle index
    (blocked_jaccard_pairs) instead of enumerating every same-source pair
    and scanning both shingle arrays per pair — identical result rows
    (see that function's equivalence argument), 9× at sf0.1."""
    from apache_hive_2_1_1_src_spark.pipeline.dedup import blocked_jaccard_pairs

    docs = t(spark, sf_dir, "documents")
    return blocked_jaccard_pairs(docs, "source", threshold=0.4).orderBy(
        "id_a", "id_b"
    )


def p04_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dups, Hamming ≤ 3, chunk-blocked — FULL oracle
    (round 5, previously the registry's last rows-only entry): the
    md5-based 60-bit signature variant is bit-for-bit recomputable in
    DuckDB (same tokenizer, same per-bit ±1 sums, same 15-bit chunk
    blocking), so the oracle verifies signatures, blocking, and the
    Hamming filter end-to-end.  The xxhash64 production variant stays
    pinned by pytest (determinism + planted-pair recovery)."""
    docs = t(spark, sf_dir, "documents")
    return simhash_near_dups(docs, max_hamming=3, use_md5=True).orderBy("id_a", "id_b")


def p05_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold tuned to the synthetic
    corpus: random 64-dim vectors top out ≈0.51)."""
    emb = t(spark, sf_dir, "embeddings")
    return embedding_near_dups(emb, threshold=0.40).orderBy("id_a", "id_b")


def p06_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for query vectors vec_id < 10 (full oracle via
    DuckDB list_cosine_similarity + QUALIFY)."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(emb, queries, k=5).orderBy("query_id", "neighbor_id")


def _recall_certificate(
    approx: DataFrame, exact: DataFrame, threshold: float, col_name: str, k: int
) -> DataFrame:
    """Shared in-plan recall certificate (p07/p23): join approximate
    and exact top-k pair sets, emit (n_queries, recall >= threshold,
    per-query boundedness) as oracle-checkable booleans.

    Round 13: the certificate reads ``approx`` twice (hit join + per-query
    max) and ``exact`` twice (hit join + totals), so without
    materialization each ANN pipeline EXECUTES twice per run.  Both
    inputs are ≤ k rows per query — localCheckpoint them once (the same
    CTE-materialization rule as dedup.shingle_table); results unchanged."""
    approx = approx.localCheckpoint(eager=False)
    exact = exact.localCheckpoint(eager=False)
    n_hit = approx.join(exact, ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    n_ex = exact.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.countDistinct("query_id").alias("n_queries"),
    )
    mx = approx.groupBy("query_id").agg(F.count(F.lit(1)).alias("c")).agg(
        F.max("c").alias("mx")
    )
    return (
        n_ex.crossJoin(n_hit)
        .crossJoin(mx)
        .select(
            F.col("n_queries").cast("long").alias("n_queries"),
            (F.col("n_hit") / F.col("n_exact") >= threshold).alias(col_name),
            (F.col("mx") <= k).alias("bounded_topk"),
        )
    )


def p07_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed ANN, full-oracle via an in-plan recall
    CERTIFICATE (the q25/q27 pattern — round 5, previously rows-only):
    one plan computes LSH top-k AND brute-force top-k, joins them, and
    emits booleans — aggregate recall@5 over the query batch >= 0.3
    (measured 0.72/0.64 at sf0.001/sf0.01 with 4 planes x 8 tables;
    theory ~0.75 for this corpus's cos≈0.4 neighbors) and per-query
    result-boundedness.  DuckDB verifies the constants; the raw pair
    surface stays pinned in tests/test_pipeline_invariants.py."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    from apache_hive_2_1_1_src_spark.pipeline.similarity import brute_force_topk

    ex = brute_force_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    ap = lsh_bucketed_ann(emb, queries, k=5, num_planes=4, num_tables=8).select(
        "query_id", "neighbor_id"
    )
    return _recall_certificate(ap, ex, 0.3, "recall_ge_030", k=5)


def p08_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_features(t(spark, sf_dir, "documents")).orderBy("doc_id")


def p09_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_counts(t(spark, sf_dir, "documents")).orderBy("doc_id")


def p10_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(t(spark, sf_dir, "documents")).orderBy("doc_id")


def p11_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(t(spark, sf_dir, "documents")).orderBy("doc_id")


def p12_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary column + typed metadata struct (flattened to scalars for the
    oracle: byte length and magic bytes are checkable from text)."""
    blobs = with_blob_column(t(spark, sf_dir, "documents"))
    return blobs.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.lower(F.col("meta.magic_hex")).alias("magic_hex"),
    ).orderBy("doc_id")


def p13_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode stub via mapInPandas — fake features are
    deterministic byte functions, so even the Python path gets a full
    DuckDB oracle."""
    blobs = with_blob_column(t(spark, sf_dir, "documents"))
    return decode_blobs(blobs).orderBy("doc_id")


def p28_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-frame sampling shape: mapInPandas fan-out (1 blob → N frame
    rows), 64-byte windows, every 4th, max 8 — deterministic byte slicing
    so the whole Arrow/UDF path gets a full oracle."""
    from apache_hive_2_1_1_src_spark.pipeline.multimodal import sample_frames

    blobs = with_blob_column(
        t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 600)
    )
    return sample_frames(blobs, frame_bytes=64, every_n=4, max_frames=8).orderBy(
        "doc_id", "frame_idx"
    )


def p29_resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize shape: mapInPandas kernel tiling bytes to a 16x8
    target (PIL path gated behind import-try) — full oracle over the
    deterministic stub."""
    from apache_hive_2_1_1_src_spark.pipeline.multimodal import resize_images

    blobs = with_blob_column(
        t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 600)
    )
    return resize_images(blobs, out_w=16, out_h=8).orderBy("doc_id")


def p30_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (new-batch-vs-corpus) dedup: docs with doc_id % 5 == 0
    are the arriving batch, the rest the corpus — exact via md5 semi-join,
    near via md5-minhash BAND-BLOCKED candidates + exact 3-gram Jaccard
    verify (round 5: the batch's band keys hash-join the corpus signature
    table, replacing the low-cardinality `source` block key); full oracle
    — md5-minhash band buckets reproduce verbatim in DuckDB."""
    from apache_hive_2_1_1_src_spark.pipeline.dedup import incremental_dedup

    docs = t(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    return incremental_dedup(new, corpus, threshold=0.6).orderBy("doc_id")


def p31_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full curation funnel in one plan: quality filter → exact-dedup
    canonical → PII scrub → 50-token chunking.  Every stage is the same
    deterministic logic as its standalone query (p08/p01/p24/p27), so the
    composition gets a full oracle too."""
    from apache_hive_2_1_1_src_spark.pipeline.curation import corpus_pipeline

    docs = t(spark, sf_dir, "documents")
    return corpus_pipeline(docs, min_score=0.2).orderBy("doc_id", "chunk_id")


def p32_extract_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction shape: blob → array<double> embedding via a
    mapInPandas kernel (model path import-gated; md5-derived stub) —
    produces the exact column shape the ANN operators consume, with a
    full oracle through the Python path."""
    from apache_hive_2_1_1_src_spark.pipeline.multimodal import (
        extract_embeddings,
    )

    blobs = with_blob_column(
        t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 600)
    )
    return extract_embeddings(blobs).orderBy("doc_id")


def p14_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (docs ≤ 50) — relational text
    pipeline, full oracle.  Round 14: tf and df share ONE (id, term)
    aggregate (the corpus is exploded once; ``subset`` filters the shared
    rows for the tf/window side while df/N stay corpus-global), so the
    rows are identical to filtering afterwards (the residual filter is
    kept and is a no-op)."""
    from apache_hive_2_1_1_src_spark.pipeline.text import tfidf_top_terms

    docs = t(spark, sf_dir, "documents")
    return (
        tfidf_top_terms(docs, k=3, subset=F.col("doc_id") <= 50)
        .filter(F.col("doc_id") <= 50)
        .orderBy("doc_id", "rn")
    )


def p15_dedup_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-id assignment by BOUNDED label propagation (3 hops) over
    the BUCKETED embedding near-dup pair graph — the fixed-budget
    counterpart of p35's convergent components.  Round 5: the pair
    source is sign-grid bucket-local (equi hash join on the cell id, no
    BroadcastNestedLoopJoin — plan-tested), so the shipped plan IS the
    100 TB plan; full oracle via 3 unrolled propagation rounds in SQL
    over the identical bucketed pair set."""
    from apache_hive_2_1_1_src_spark.pipeline.dedup import (
        canonicalize_pairs,
        embedding_near_dups,
    )

    emb = t(spark, sf_dir, "embeddings")
    pairs = embedding_near_dups(emb, threshold=0.40, sign_bits=4)
    return canonicalize_pairs(pairs, iterations=3).orderBy("id")


def p16_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational k-means (k=4, 2 iterations, first-k init) over
    embeddings — iterative algorithm as pure joins/aggs, full oracle."""
    from apache_hive_2_1_1_src_spark.pipeline.clustering import kmeans_relational

    return kmeans_relational(t(spark, sf_dir, "embeddings"), k=4, iterations=2)


def p17_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic vocabulary build (freq-ranked token ids)."""
    from apache_hive_2_1_1_src_spark.pipeline.clustering import build_vocab

    return build_vocab(t(spark, sf_dir, "documents"), min_freq=2)


def p18_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-bucket train/val/test split (12/2/2 sixteenths
    of md5(doc_id:source)) with per-(lang, split) counts — reproducible
    across cluster sizes because assignment is a stateless projection."""
    from apache_hive_2_1_1_src_spark.pipeline.curation import train_split

    return train_split(t(spark, sf_dir, "documents"))


def p19_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (256-token packs, chunked by running
    total within composite (lang, md5-shard) strata so no window
    partition ever exceeds 1/16 of a language — round 5 scale fix) —
    one window + one agg; per-pack doc/token totals."""
    from apache_hive_2_1_1_src_spark.pipeline.curation import sequence_packing

    return sequence_packing(t(spark, sf_dir, "documents"), budget=256, shards=16)


def p20_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: corpus docs sharing word-5-gram
    shingles with the benchmark subset (doc_id % 97 == 0), benchmark side
    broadcast so the corpus never shuffles."""
    from apache_hive_2_1_1_src_spark.pipeline.curation import contamination_check

    return contamination_check(t(spark, sf_dir, "documents"))


def p21_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaning-pipeline funnel (en → length band → stopword floor →
    exact-dedup) as conditional aggregates over ONE corpus scan."""
    from apache_hive_2_1_1_src_spark.pipeline.curation import quality_funnel

    return quality_funnel(t(spark, sf_dir, "documents"))


def p22_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-stratified rebalance (md5-threshold per stratum
    — the reproducible, oracle-checkable form; the seeded ``sampleBy``
    Bernoulli surface stays pinned in pytest)."""
    from apache_hive_2_1_1_src_spark.pipeline.curation import (
        hash_stratified_sample,
    )

    docs = t(spark, sf_dir, "documents")
    return (
        hash_stratified_sample(docs, {"en": 0.5, "de": 0.25, "es": 0.25, "fr": 0.1})
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


def p23_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN (8 lists, nprobe=4): coarse-quantizer scale path —
    full oracle via the p07 in-plan recall CERTIFICATE (round 5,
    previously rows-only): one plan computes IVF top-k AND brute-force
    top-k, joins them, and emits aggregate recall@5 >= 0.5 over the
    query batch (measured ≈0.9+ at nprobe=4/8 lists; a FULL probe is
    exactly brute force, pinned in pytest) plus per-query
    result-boundedness.  Lloyd-trained centroids themselves aren't
    SQL-reproducible — the raw pair surface stays pinned in
    tests/test_pipeline_invariants.py."""
    from apache_hive_2_1_1_src_spark.pipeline.ivf import ivf_topk
    from apache_hive_2_1_1_src_spark.pipeline.similarity import brute_force_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    ex = brute_force_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    ap = ivf_topk(emb, queries, k=5, num_centroids=8, nprobe=4).select(
        "query_id", "neighbor_id"
    )
    return _recall_certificate(ap, ex, 0.5, "recall_ge_050", k=5)


def p24_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (email/phone/IPv4 → typed placeholders) with per-doc
    audit counts.  The synthetic corpus has no PII, so a deterministic
    contact line is planted per doc — the operator itself is the real
    chained-regex pass (pipeline/text.pii_scrub), full oracle."""
    from apache_hive_2_1_1_src_spark.pipeline.text import pii_scrub

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 500)
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.lit("contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555-123-4567 from 10.0.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(" re: "),
            F.col("text"),
        ).alias("text"),
    )
    return pii_scrub(seeded).orderBy("doc_id")


def p25_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter features (dup-word fraction,
    top-word fraction) via explode + two-level aggregation — full
    oracle."""
    from apache_hive_2_1_1_src_spark.pipeline.text import repetition_stats

    return repetition_stats(t(spark, sf_dir, "documents")).orderBy("doc_id")


def p26_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-bucket down-sampling to a target domain mixture
    (src0 keeps 16/16, src1 8/16, src2 4/16, rest 2/16) — full oracle."""
    from apache_hive_2_1_1_src_spark.pipeline.curation import domain_mix

    docs = t(spark, sf_dir, "documents")
    return domain_mix(docs, {"src0": 16, "src1": 8, "src2": 4}, default_keep=2)


def p27_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length chunking: overlapping 50-token windows (stride 40)
    per document via explode(sequence) + slice — narrow, shuffle-free,
    full oracle."""
    from apache_hive_2_1_1_src_spark.pipeline.text import chunk_documents

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 800)
    return chunk_documents(docs, chunk_tokens=50, overlap=10).orderBy(
        "doc_id", "chunk_id"
    )


def p38_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle + 16-way sharding for training order
    (md5 sort keys, nibble shards) — per-shard manifest digest; full
    oracle."""
    from apache_hive_2_1_1_src_spark.pipeline.curation import shuffle_shards

    docs = t(spark, sf_dir, "documents")
    return shuffle_shards(docs, n_shards=16).orderBy("shard")


def p33_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup over embeddings: deterministic
    sign-grid coarse buckets (16 cells), drop vectors with a
    higher-cosine lower-id neighbor in-bucket — full oracle (the 100 TB
    path swaps the grid for the p23 IVF coarse quantizer)."""
    from apache_hive_2_1_1_src_spark.pipeline.dedup import semantic_dedup

    emb = t(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, threshold=0.4, sign_bits=4).orderBy("vec_id")


def p34_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup with document reassembly (Dolma/
    RefinedWeb line-dedup shape): global first-occurrence wins over
    10-word chunks; two linear shuffles — full oracle."""
    from apache_hive_2_1_1_src_spark.pipeline.dedup import chunk_dedup

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 500)
    return chunk_dedup(docs, words_per_chunk=10).orderBy("doc_id")


def p35_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True transitive connected components over the BUCKETED embedding
    near-dup pair graph (min-label propagation to convergence — the
    convergent big brother of p15's bounded pass).  Round 5: pair source
    is sign-grid bucket-local (hash join on the cell id, no BNLJ —
    plan-tested).  Full oracle via DuckDB recursive-CTE reachability
    over the identical bucketed pair set."""
    from apache_hive_2_1_1_src_spark.pipeline.dedup import (
        connected_components,
        embedding_near_dups,
    )

    emb = t(spark, sf_dir, "embeddings")
    pairs = embedding_near_dups(emb, threshold=0.40, sign_bits=4)
    return connected_components(pairs).orderBy("id")


def p36_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio frame RMS/peak features over a binary waveform column
    (mapInPandas Arrow kernel, deterministic fake PCM — real decoder
    import-gated); completes the multimodal quartet.  Full oracle via
    byte-arithmetic SQL."""
    from apache_hive_2_1_1_src_spark.pipeline.multimodal import (
        audio_frame_energy,
        with_blob_column,
    )

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 400)
    frames = audio_frame_energy(with_blob_column(docs))
    return frames.select(
        "doc_id",
        "frame_idx",
        "n_samples",
        F.round("rms", 4).alias("rms"),
        "peak",
    ).orderBy("doc_id", "frame_idx")


def p37_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality score (corpus-unigram LM, mean -log2 p per
    doc) — full oracle."""
    from apache_hive_2_1_1_src_spark.pipeline.text import unigram_logprob

    docs = t(spark, sf_dir, "documents")
    return unigram_logprob(docs).filter(F.col("doc_id") <= 600).orderBy("doc_id")


def p39_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + host-level dedup stats (pipeline/web.py):
    messy synthetic URLs (upper-cased scheme/host, www., default port,
    tracking params, unsorted query, trailing slash, fragment) are
    normalized to their canonical dedup key entirely in codegen
    expressions; digest = per-host URL count, distinct-canonical count
    (the URL-dedup collapse), and min canonical.  The oracle derives
    the expected canonical form analytically from the same id
    arithmetic — any canonicalizer defect breaks the hash."""
    from apache_hive_2_1_1_src_spark.pipeline.web import canonicalize_url, url_host

    docs = t(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("HTTPS://WWW.Example"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".COM:443/Path/"),
        (F.col("doc_id") % 100).cast("string"),
        F.lit("/?utm_source=feed&id="),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("&b=2&a=1#frag"),
        (F.col("doc_id") % 3).cast("string"),
    )
    urls = docs.select(
        "doc_id",
        canonicalize_url(raw).alias("canonical"),
        url_host(raw).alias("host"),
    )
    return (
        urls.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("canonical").alias("n_unique"),
            F.min("canonical").alias("min_canonical"),
        )
        .orderBy("host")
    )


def p40_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate strip (pipeline/web.py html_extract_text,
    trafilatura-style expression heuristic): each document is wrapped in
    a full HTML page (head/title/script/style, nav, ad-classed div,
    footer, entity-escaped body) and the extractor must recover exactly
    the body text.  Digest = per-lang count + extracted char sum +
    an all-rows-clean certificate (extracted == expected body)."""
    from apache_hive_2_1_1_src_spark.pipeline.web import html_extract_text

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 1500)
    html = F.concat(
        F.lit('<html><head><title>Doc '),
        F.col("doc_id").cast("string"),
        F.lit(
            '</title><script type="text/javascript">var x = 1 < 2;</script>'
            "<style>p { color: red; }</style></head><body><nav>Home | About</nav>"
            '<div class="main"><p>'
        ),
        F.col("text"),
        F.lit(
            ' &amp; more</p></div><div class="ads banner">BUY NOW!!!</div>'
            "<footer>(c) 2020 Example</footer></body></html>"
        ),
    )
    expected = F.trim(
        F.regexp_replace(F.concat(F.col("text"), F.lit(" & more")), r"\s+", " ")
    )
    rows = docs.select(
        "lang",
        html_extract_text(html).alias("extracted"),
        expected.alias("expected"),
    ).withColumn("clean", (F.col("extracted") == F.col("expected")).cast("int"))
    return (
        rows.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("extracted")).alias("chars_sum"),
            (F.sum("clean") == F.count(F.lit(1))).alias("all_extracted_clean"),
        )
        .orderBy("lang")
    )


def p41_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed linear quality classifier (pipeline/text.py
    classifier_score): token-hash features, broadcast-shaped weight
    vector, integer scoring (order-independent) — full oracle replaying
    the identical hash/weight arithmetic in SQL."""
    from apache_hive_2_1_1_src_spark.pipeline.text import classifier_score

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 1200)
    return classifier_score(docs).orderBy("doc_id")


def p42_repeated_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-passage detection (overlapping 20-token
    windows at stride 5, Lee-et-al exact-substring shape —
    pipeline/dedup.duplicated_span_fraction): per-doc duplicated-window
    fraction, full oracle replaying the identical windows in SQL."""
    from apache_hive_2_1_1_src_spark.pipeline.dedup import duplicated_span_fraction

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 800)
    return duplicated_span_fraction(docs).orderBy("doc_id")


def p43_epoch_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLaMA-style epoch-weighted domain mixing (curation.py
    epoch_weighted_mix): src0 upsampled 3 epochs, src1 2.5, src2 half
    an epoch, src3 dropped, everything else 1.0 — integer replication +
    md5-deterministic fractional copies; full oracle replays the
    identical weight/threshold arithmetic."""
    from apache_hive_2_1_1_src_spark.pipeline.curation import epoch_weighted_mix

    docs = t(spark, sf_dir, "documents")
    mixed = epoch_weighted_mix(
        docs, {"src0": 3.0, "src1": 2.5, "src2": 0.5, "src3": 0.0}
    )
    return (
        mixed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.max("copy_id").alias("max_copies"),
        )
        .orderBy("source")
    )


QUERIES = {
    "p43_epoch_mixing": p43_epoch_mixing,
    "p42_repeated_passages": p42_repeated_passages,
    "p41_quality_classifier": p41_quality_classifier,
    "p39_url_canonicalize": p39_url_canonicalize,
    "p40_html_extract": p40_html_extract,
    "p01_dedup_exact": p01_dedup_exact,
    "p27_chunk_documents": p27_chunk_documents,
    "p25_repetition": p25_repetition,
    "p26_domain_mix": p26_domain_mix,
    "p23_ann_ivf": p23_ann_ivf,
    "p24_pii_scrub": p24_pii_scrub,
    "p18_train_split": p18_train_split,
    "p19_sequence_packing": p19_sequence_packing,
    "p20_contamination": p20_contamination,
    "p21_quality_funnel": p21_quality_funnel,
    "p22_stratified_sample": p22_stratified_sample,
    "p14_tfidf": p14_tfidf,
    "p15_dedup_canonicalize": p15_dedup_canonicalize,
    "p16_kmeans": p16_kmeans,
    "p17_vocab": p17_vocab,
    "p02_dedup_minhash_lsh": p02_dedup_minhash_lsh,
    "p03_dedup_ngram_jaccard": p03_dedup_ngram_jaccard,
    "p04_dedup_simhash": p04_dedup_simhash,
    "p05_dedup_embedding": p05_dedup_embedding,
    "p06_ann_bruteforce": p06_ann_bruteforce,
    "p07_ann_lsh": p07_ann_lsh,
    "p08_text_quality": p08_text_quality,
    "p09_token_counts": p09_token_counts,
    "p10_langid": p10_langid,
    "p11_fingerprint": p11_fingerprint,
    "p12_multimodal_meta": p12_multimodal_meta,
    "p13_multimodal_decode": p13_multimodal_decode,
    "p28_frame_sample": p28_frame_sample,
    "p29_resize_images": p29_resize_images,
    "p30_incremental_dedup": p30_incremental_dedup,
    "p31_corpus_pipeline": p31_corpus_pipeline,
    "p32_extract_embeddings": p32_extract_embeddings,
    "p33_semantic_dedup": p33_semantic_dedup,
    "p34_paragraph_dedup": p34_paragraph_dedup,
    "p35_connected_components": p35_connected_components,
    "p36_audio_energy": p36_audio_energy,
    "p37_unigram_logprob": p37_unigram_logprob,
    "p38_shuffle_shards": p38_shuffle_shards,
}

_SHINGLES_CTE = """
    WITH sh AS (
      SELECT doc_id, source,
             list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(range(1, len(w) - 1),
                                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
               ELSE [array_to_string(w, ' ')] END) AS s
      FROM (SELECT doc_id, source, string_split_regex(lower(text), '\\s+') AS w
            FROM documents)
    )
"""

def p44_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (curation.dsir_resample): hashed-unigram
    importance weights against the src0 target domain, Gumbel-top-200
    selection via distributed TakeOrderedAndProject — full oracle
    replaying the identical hash/count/log arithmetic and Gumbel keys."""
    from apache_hive_2_1_1_src_spark.pipeline.curation import dsir_resample

    docs = t(spark, sf_dir, "documents")
    return dsir_resample(docs, target_source="src0", k=200, dim=256).orderBy("doc_id")


QUERIES["p44_dsir_resample"] = p44_dsir_resample


def p45_adaptive_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum adaptive quality filter (text.adaptive_quality_filter):
    survival cutoff = half the stratum's own median word count — the
    CCNet/RefinedWeb per-language-quantile pattern; tiny broadcast
    median table, stateless filter.  Full oracle via quantile_cont."""
    from apache_hive_2_1_1_src_spark.pipeline.text import adaptive_quality_filter

    docs = t(spark, sf_dir, "documents")
    return adaptive_quality_filter(docs).orderBy("source")


QUERIES["p45_adaptive_quality_filter"] = p45_adaptive_quality_filter


def _simhash_oracle() -> str:
    """Generated DuckDB recomputation of the md5-variant 60-bit SimHash
    (pipeline/dedup.py simhash64 use_md5=True): identical tokenizer
    (lower + \\s+ split, empties dropped, distinct words), identical word
    hash (first 15 md5 hex chars as a 60-bit int), identical per-bit ±1
    majority vote, identical 15-bit chunk blocking and Hamming filter."""
    bit_sums = ",\n                 ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(60)
    )
    recompose = "\n                 + ".join(
        f"CASE WHEN b{b} > 0 THEN (1::BIGINT << {b}) ELSE 0::BIGINT END"
        for b in range(60)
    )
    return f"""
        WITH w AS (
          SELECT DISTINCT doc_id, word FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '\\s+')) AS word
            FROM documents
          ) WHERE word != ''
        ), h AS (
          SELECT doc_id, ('0x' || substr(md5(word), 1, 15))::BIGINT AS h
          FROM w
        ), bits AS (
          SELECT doc_id,
                 {bit_sums}
          FROM h GROUP BY doc_id
        ), sim AS (
          SELECT doc_id,
                 {recompose} AS simhash
          FROM bits
        ), ch AS (
          SELECT doc_id, simhash, c.c AS chunk_idx,
                 CAST((simhash >> (15 * c.c)) & 32767 AS INT) AS chunk_val
          FROM sim, (SELECT unnest(range(4)) AS c) c
        ), cand AS (
          SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
                 l.simhash AS sh_a, r.simhash AS sh_b
          FROM ch l JOIN ch r
            ON l.chunk_idx = r.chunk_idx AND l.chunk_val = r.chunk_val
           AND l.doc_id < r.doc_id
        )
        SELECT id_a, id_b,
               CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
        FROM cand
        WHERE bit_count(xor(sh_a, sh_b)) <= 3
        ORDER BY id_a, id_b
    """


def p46_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership probe (pipeline/bloom.py — the ORC
    bloom-filter index idea, orc.bloom.filter.columns, re-expressed as a
    broadcast bit-position table): batch = doc_id % 5 == 0, corpus the
    rest, key = first 30 chars of text so true members exist.  Full
    oracle — the k=5 md5-slice hashes reproduce verbatim in DuckDB, so
    both the maybe-verdict (false positives included) and the exact
    ground truth are recomputed bit-for-bit."""
    from apache_hive_2_1_1_src_spark.pipeline.bloom import bloom_membership_probe

    docs = t(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    return bloom_membership_probe(new, corpus).orderBy("doc_id")


QUERIES["p46_bloom_probe"] = p46_bloom_probe


def p47_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded epoch-2 training-order permutation (curation.epoch_shuffle):
    md5 sort key over 32 hash shards, per-shard row_number positions —
    reproducible global order with no global sort.  Full oracle: the
    hash, shard and window arithmetic replay verbatim in DuckDB."""
    from apache_hive_2_1_1_src_spark.pipeline.curation import epoch_shuffle

    docs = t(spark, sf_dir, "documents")
    return epoch_shuffle(docs, seed=2, n_shards=32).orderBy("shard", "pos")


QUERIES["p47_epoch_shuffle"] = p47_epoch_shuffle


def p48_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (pipeline/pq.py — Jegou et al. IVFADC's
    compression half): per-subspace Lloyd codebooks (m=8 x 16 codes),
    4-8 byte codes per vector, ADC table-lookup scoring, exact re-rank
    of the top-50 candidates.  Full oracle via the p07/p23 in-plan
    recall certificate: measured recall@5 ~0.8 at both gate scales,
    certified >= 0.5; rerank >= |corpus| equals brute force exactly
    (pytest-pinned)."""
    from apache_hive_2_1_1_src_spark.pipeline.pq import pq_topk
    from apache_hive_2_1_1_src_spark.pipeline.similarity import brute_force_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    ex = brute_force_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    ap = pq_topk(
        emb, queries, k=5, m=8, codes_per_sub=16, rerank=50
    ).select("query_id", "neighbor_id")
    return _recall_certificate(ap, ex, 0.5, "recall_ge_050", k=5)


QUERIES["p48_ann_pq"] = p48_ann_pq


def p49_ann_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ composed ANN (pipeline/pq.ivfadc_topk — the FAISS IVFADC
    shape and the exact 100 TB plan SCALE_DESIGN.md documents for
    similarity search): coarse lists restrict the scan to nprobe/8 of
    the corpus, PQ codes make each scanned candidate 8 bytes, ADC
    lookup-sums approximate cosine, exact re-rank on top-50.  Full
    oracle via the shared in-plan recall certificate (measured ~0.8 at
    both gate scales, certified >= 0.5); full-probe + full-rerank ==
    brute force is pytest-pinned."""
    from apache_hive_2_1_1_src_spark.pipeline.pq import ivfadc_topk
    from apache_hive_2_1_1_src_spark.pipeline.similarity import brute_force_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    ex = brute_force_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    ap = ivfadc_topk(
        emb, queries, k=5, num_centroids=8, nprobe=4, m=8, codes_per_sub=16,
        rerank=50,
    ).select("query_id", "neighbor_id")
    return _recall_certificate(ap, ex, 0.5, "recall_ge_050", k=5)


QUERIES["p49_ann_ivfadc"] = p49_ann_ivfadc


def p50_canonical_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection (dedup.canonical_by_quality):
    per near-dup component, keep the max-label member (ties -> lowest
    id) instead of the min id — the curation-grade composition of the
    bucketed pair generator, convergent connected components, and one
    cluster-partitioned argmax window.  Full oracle: recursive-CTE
    reachability + the same argmax, integer quality so the comparison
    is exact."""
    from apache_hive_2_1_1_src_spark.pipeline.dedup import (
        canonical_by_quality,
        embedding_near_dups,
    )

    emb = t(spark, sf_dir, "embeddings")
    pairs = embedding_near_dups(emb, threshold=0.40, sign_bits=4)
    return canonical_by_quality(emb, pairs).orderBy("id")


QUERIES["p50_canonical_by_quality"] = p50_canonical_by_quality


def p51_length_bucketed_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching report (curation.length_bucketed_batching):
    power-of-two token buckets with per-bucket padding-waste accounting
    — the serving-side batching trick; one map-side-combined aggregate,
    closed-form arithmetic, full oracle."""
    from apache_hive_2_1_1_src_spark.pipeline.curation import (
        length_bucketed_batching,
    )

    docs = t(spark, sf_dir, "documents")
    return length_bucketed_batching(docs)


QUERIES["p51_length_bucketed_batching"] = p51_length_bucketed_batching


def p52_multimodal_decode_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow zero-copy decode (multimodal.decode_blobs_arrow): the
    Arrow-RecordBatch transport for binary-column kernels — same
    deterministic features as the mapInPandas path p13, so the two
    transports share one full oracle and are pinned equal."""
    from apache_hive_2_1_1_src_spark.pipeline.multimodal import (
        decode_blobs_arrow,
        with_blob_column,
    )

    blobs = with_blob_column(t(spark, sf_dir, "documents"))
    return decode_blobs_arrow(blobs).orderBy("doc_id")


QUERIES["p52_multimodal_decode_arrow"] = p52_multimodal_decode_arrow


ORACLES = {
    "p45_adaptive_quality_filter": """
        WITH w AS (
          SELECT source,
                 len(list_filter(string_split_regex(lower(text), '\\s+'),
                                 x -> x != '')) AS n_words
          FROM documents
        ), med AS (
          SELECT source, quantile_cont(n_words, 0.5) AS med
          FROM w GROUP BY source
        )
        SELECT w.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN n_words >= med / 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_kept,
               ROUND(ANY_VALUE(med), 4) AS median_words
        FROM w JOIN med ON w.source = med.source
        GROUP BY w.source
        ORDER BY w.source
    """,
    "p44_dsir_resample": """
        WITH tok AS (
          SELECT doc_id, source,
                 unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                    x -> x != '')) AS tok
          FROM documents
        ), feats AS (
          SELECT doc_id, source,
                 ('0x' || substr(md5(tok), 1, 6))::BIGINT % 256 AS f
          FROM tok
        ), raw AS (
          SELECT f, COUNT(*) AS rc FROM feats GROUP BY f
        ), tgt AS (
          SELECT f, COUNT(*) AS tc FROM feats WHERE source = 'src0' GROUP BY f
        ), tab AS (
          SELECT raw.f, rc, COALESCE(tc, 0) AS tc
          FROM raw LEFT JOIN tgt ON raw.f = tgt.f
        ), tot AS (
          SELECT SUM(rc) AS r_total, SUM(tc) AS t_total FROM tab
        ), lw AS (
          SELECT f, ln(tc + 1) - ln(rc + 1)
                    + ln(r_total + 256) - ln(t_total + 256) AS lw
          FROM tab, tot
        ), scored AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                 ROUND(SUM(lw), 6) AS log_w
          FROM feats JOIN lw USING (f) GROUP BY doc_id
        ), keyed AS (
          SELECT doc_id, n_tokens, log_w,
                 ROUND(log_w - ln(-ln(
                   ('0x' || substr(md5(doc_id || 'dsir'), 1, 8))::BIGINT
                     / 4294967296.0)), 6) AS samp_key
          FROM scored
        )
        SELECT doc_id, n_tokens, log_w, samp_key
        FROM keyed
        ORDER BY samp_key DESC, doc_id
        LIMIT 200
    """,
    "p04_dedup_simhash": _simhash_oracle(),
    "p02_dedup_minhash_lsh": """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x != '') AS w
          FROM documents
        ), s AS (
          SELECT doc_id,
                 CASE WHEN len(w) >= 3 THEN
                   list_distinct(list_transform(range(1, len(w) - 1),
                     i -> array_to_string(list_slice(w, i, i + 2), ' ')))
                 ELSE [array_to_string(w, ' ')] END AS sh
          FROM t
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                     / len(list_distinct(a.sh || b.sh)), 6) AS jaccard
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                    / len(list_distinct(a.sh || b.sh)), 6) >= 0.4
        ORDER BY id_a, id_b
    """,
    "p43_epoch_mixing": """
        WITH w AS (
          SELECT doc_id, source,
                 CASE source WHEN 'src0' THEN 3.0 WHEN 'src1' THEN 2.5
                             WHEN 'src2' THEN 0.5 WHEN 'src3' THEN 0.0
                             ELSE 1.0 END AS wt,
                 CAST('0x' || substr(md5(doc_id || 'epoch'), 1, 8) AS BIGINT)
                   / 4294967296.0 AS u
          FROM documents
        ), c AS (
          SELECT doc_id, source,
                 CAST(FLOOR(wt) AS INT)
                   + CASE WHEN u < wt - FLOOR(wt) THEN 1 ELSE 0 END AS n
          FROM w
        )
        SELECT source, CAST(SUM(n) AS BIGINT) AS n_rows,
               COUNT(*) AS n_docs,
               CAST(MAX(n) AS BIGINT) AS max_copies
        FROM c WHERE n >= 1 GROUP BY source ORDER BY source
    """,
    "p42_repeated_passages": """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x != '') AS t
          FROM documents WHERE doc_id <= 800
        ), d2 AS (
          SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 20
        ), wins AS (
          SELECT doc_id,
                 md5(array_to_string(list_slice(t, s, s + 19), ' ')) AS h
          FROM d2, unnest(generate_series(1, n - 19, 5)) AS u(s)
        ), dup AS (
          SELECT h FROM wins GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
        )
        SELECT w.doc_id,
               COUNT(*) AS n_windows,
               CAST(SUM(CASE WHEN w.h IN (SELECT h FROM dup)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
               ROUND(CAST(SUM(CASE WHEN w.h IN (SELECT h FROM dup)
                               THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
                 AS dup_frac
        FROM wins w GROUP BY w.doc_id ORDER BY w.doc_id
    """,
    "p41_quality_classifier": """
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                    x -> x != '')) AS tok
          FROM documents WHERE doc_id <= 1200
        ), feat AS (
          SELECT doc_id,
                 ((CAST('0x' || substr(md5(tok), 1, 6) AS BIGINT) % 1024)
                   * 2654435761) % 997 - 498 AS w
          FROM toks
        )
        SELECT doc_id, CAST(SUM(w) AS BIGINT) AS score_sum,
               COUNT(*) AS n_tokens, SUM(w) > 0 AS keep
        FROM feat GROUP BY doc_id ORDER BY doc_id
    """,
    "p39_url_canonicalize": """
        WITH u AS (
          SELECT 'example' || (doc_id % 7) || '.com' AS host,
                 'https://example' || (doc_id % 7) || '.com/Path/'
                   || (doc_id % 100) || '?a=1&b=2&id=' || (doc_id % 50)
                   AS canonical
          FROM documents
        )
        SELECT host, COUNT(*) AS n_urls,
               CAST(COUNT(DISTINCT canonical) AS BIGINT) AS n_unique,
               MIN(canonical) AS min_canonical
        FROM u GROUP BY host ORDER BY host
    """,
    "p40_html_extract": """
        SELECT lang, COUNT(*) AS n,
               CAST(SUM(LENGTH(TRIM(regexp_replace(text || ' & more',
                        '\\s+', ' ', 'g')))) AS BIGINT) AS chars_sum,
               TRUE AS all_extracted_clean
        FROM documents WHERE doc_id <= 1500
        GROUP BY lang ORDER BY lang
    """,
    "p27_chunk_documents": """
        WITH d AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x != '') AS w
          FROM documents WHERE doc_id <= 800
        ), n AS (
          SELECT doc_id, w,
                 CASE WHEN len(w) <= 50 THEN 1
                      ELSE CAST(CEIL((len(w) - 50) / 40.0) AS INT) + 1
                 END AS nc
          FROM d
        ), e AS (
          SELECT doc_id, w,
                 UNNEST(generate_series(0, nc - 1)) AS i
          FROM n
        )
        SELECT doc_id, CAST(i AS INT) AS chunk_id,
               CAST(len(list_slice(w, i * 40 + 1, i * 40 + 50)) AS INT)
                 AS n_tokens,
               array_to_string(list_slice(w, i * 40 + 1, i * 40 + 50), ' ')
                 AS chunk_text
        FROM e ORDER BY doc_id, chunk_id
    """,
    "p30_incremental_dedup": _SHINGLES_CTE
    + """
        , hx AS (SELECT doc_id, md5(text) AS h FROM documents),
        ex AS (
          SELECT n.doc_id,
                 CAST(MAX(CASE WHEN c.h IS NOT NULL THEN 1 ELSE 0 END)
                      AS BOOLEAN) AS is_exact_dup
          FROM (SELECT doc_id, h FROM hx WHERE doc_id % 5 = 0) n
          LEFT JOIN (SELECT DISTINCT h FROM hx WHERE doc_id % 5 != 0) c
            ON n.h = c.h
          GROUP BY n.doc_id
        ),
        sigs AS (
          SELECT doc_id, CAST(i AS INT) AS i,
                 MIN(md5(i::VARCHAR || '|' || shingle)) AS h
          FROM sh, UNNEST(sh.s) AS u(shingle), UNNEST(range(16)) AS t(i)
          GROUP BY doc_id, i
        ),
        bandt AS (
          SELECT doc_id, CAST(i // 2 AS INT) AS band_idx,
                 md5(string_agg(h, ',' ORDER BY i)) AS band_hash
          FROM sigs GROUP BY doc_id, i // 2
        ),
        cand AS (
          SELECT DISTINCT n.doc_id AS nid, c.doc_id AS cid
          FROM (SELECT * FROM bandt WHERE doc_id % 5 = 0) n
          JOIN (SELECT * FROM bandt WHERE doc_id % 5 != 0) c
            ON n.band_idx = c.band_idx AND n.band_hash = c.band_hash
        ),
        nearj AS (
          SELECT cand.nid AS doc_id,
                 MAX(ROUND(len(list_intersect(n.s, c.s)) * 1.0
                           / len(list_distinct(n.s || c.s)), 6)) AS best_jaccard
          FROM cand
          JOIN sh n ON n.doc_id = cand.nid
          JOIN sh c ON c.doc_id = cand.cid
          GROUP BY cand.nid
        )
        SELECT e.doc_id, e.is_exact_dup,
               COALESCE(nj.best_jaccard, 0.0) AS best_jaccard,
               COALESCE(nj.best_jaccard, 0.0) >= 0.6 AS is_near_dup
        FROM ex e LEFT JOIN nearj nj ON e.doc_id = nj.doc_id
        ORDER BY e.doc_id
    """,
    "p31_corpus_pipeline": """
        WITH q AS (
          SELECT doc_id, text,
                 list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x != '') AS w
          FROM documents
        ), keep AS (
          SELECT doc_id, text FROM q
          WHERE ROUND(CASE WHEN len(w) < 5 THEN 0.0 ELSE
            (1.0 - ROUND((length(text)
                          - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                   / GREATEST(length(text), 1), 6))
            * LEAST(ROUND(len(list_filter(w, x -> list_contains(
                  ['the','a','an','and','or','of','to','in','is','it'], x)))
                / GREATEST(len(w), 1), 6) * 4, 1.0)
            * LEAST(len(w) / 50.0, 1.0) END, 6) >= 0.2
        ), canon AS (
          SELECT doc_id, text FROM (
            SELECT doc_id, text,
                   row_number() OVER (PARTITION BY md5(text)
                                      ORDER BY doc_id) AS rn
            FROM keep) WHERE rn = 1
        ), scrub AS (
          SELECT doc_id,
                 regexp_replace(regexp_replace(regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
                   '\\b(?:\\+?\\d{1,2}[ -]?)?(?:\\(\\d{3}\\)|\\d{3})[ -]?\\d{3}[ -]?\\d{4}\\b',
                   '<PHONE>', 'g'),
                   '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g') AS text
          FROM canon
        ), d AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x != '') AS w2
          FROM scrub
        ), nn AS (
          SELECT doc_id, w2,
                 CASE WHEN len(w2) <= 50 THEN 1
                      ELSE CAST(CEIL((len(w2) - 50) / 40.0) AS INT) + 1
                 END AS nc
          FROM d
        ), e AS (
          SELECT doc_id, w2, UNNEST(generate_series(0, nc - 1)) AS i FROM nn
        )
        SELECT doc_id, CAST(i AS INT) AS chunk_id,
               CAST(len(list_slice(w2, i * 40 + 1, i * 40 + 50)) AS INT)
                 AS n_tokens,
               array_to_string(list_slice(w2, i * 40 + 1, i * 40 + 50), ' ')
                 AS chunk_text
        FROM e ORDER BY doc_id, chunk_id
    """,
    "p25_repetition": """
        WITH w AS (
          SELECT doc_id,
                 UNNEST(list_filter(string_split_regex(lower(text), '\\s+'),
                                    x -> x != '')) AS w
          FROM documents
        ), wc AS (
          SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY doc_id, w
        ), agg AS (
          SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
                 COUNT(*) AS n_distinct,
                 ROUND(1 - COUNT(*) * 1.0 / SUM(c), 6) AS dup_word_frac,
                 ROUND(MAX(c) * 1.0 / SUM(c), 6) AS top_word_frac
          FROM wc GROUP BY doc_id
        )
        SELECT *, dup_word_frac > 0.3 OR top_word_frac > 0.1 AS is_repetitive
        FROM agg ORDER BY doc_id
    """,
    "p26_domain_mix": """
        SELECT source, COUNT(*) AS n_total,
               CAST(SUM(CASE WHEN b < q THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               ROUND(SUM(CASE WHEN b < q THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
                 AS kept_frac
        FROM (SELECT source,
                     instr('0123456789abcdef',
                           substr(md5(CAST(doc_id AS VARCHAR) || ':' || source),
                                  32, 1)) - 1 AS b,
                     CASE source WHEN 'src0' THEN 16 WHEN 'src1' THEN 8
                                 WHEN 'src2' THEN 4 ELSE 2 END AS q
              FROM documents)
        GROUP BY source ORDER BY source
    """,
    "p24_pii_scrub": """
        WITH seeded AS (
          SELECT doc_id,
                 'contact user' || CAST(doc_id AS VARCHAR) ||
                 '@example.com or call 555-123-4567 from 10.0.0.' ||
                 CAST(doc_id % 256 AS VARCHAR) || ' re: ' || text AS text
          FROM documents WHERE doc_id <= 500
        )
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\\b(?:\\+?\\d{1,2}[ -]?)?(?:\\(\\d{3}\\)|\\d{3})[ -]?\\d{3}[ -]?\\d{4}\\b', '<PHONE>', 'g'),
                 '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g') AS text_scrubbed,
               CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) AS n_email,
               CAST(len(regexp_extract_all(text,
                 '\\b(?:\\+?\\d{1,2}[ -]?)?(?:\\(\\d{3}\\)|\\d{3})[ -]?\\d{3}[ -]?\\d{4}\\b')) AS INT) AS n_phone,
               CAST(len(regexp_extract_all(text,
                 '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b')) AS INT) AS n_ip
        FROM seeded ORDER BY doc_id
    """,
    "p18_train_split": """
        SELECT lang, split, COUNT(*) AS n_docs FROM (
          SELECT lang,
                 CASE WHEN b < 12 THEN 'train'
                      WHEN b < 14 THEN 'val'
                      ELSE 'test' END AS split
          FROM (SELECT lang,
                       instr('0123456789abcdef',
                             substr(md5(CAST(doc_id AS VARCHAR) || ':' || source),
                                    32, 1)) - 1 AS b
                FROM documents)
        ) GROUP BY lang, split ORDER BY lang, split
    """,
    "p19_sequence_packing": """
        WITH tok AS (
          SELECT lang, doc_id,
                 CAST((CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 4)
                            AS INTEGER)) % 16 AS BIGINT) AS shard,
                 len(list_filter(string_split_regex(lower(text), '\\s+'),
                                 x -> x != '')) AS n_tokens
          FROM documents
        ), packed AS (
          SELECT lang, shard, doc_id, n_tokens,
                 CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
                        PARTITION BY lang, shard ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      / 256) AS INT) AS pack_id
          FROM tok
        )
        SELECT lang, shard, pack_id, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM packed GROUP BY lang, shard, pack_id
        ORDER BY lang, shard, pack_id
    """,
    "p20_contamination": """
        WITH sh AS (
          SELECT doc_id,
                 list_distinct(CASE WHEN len(w) >= 5
                   THEN list_transform(range(1, len(w) - 3),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                               || ' ' || w[i+3] || ' ' || w[i+4])
                   ELSE [array_to_string(w, ' ')] END) AS s
          FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
                FROM documents)
        ), bench AS (
          SELECT DISTINCT UNNEST(s) AS shingle FROM sh WHERE doc_id % 97 = 0
        ), corpus AS (
          SELECT doc_id, len(s) AS n_shingles, UNNEST(s) AS shingle
          FROM sh WHERE doc_id % 97 != 0
        )
        SELECT corpus.doc_id, CAST(corpus.n_shingles AS INT) AS n_shingles,
               COUNT(*) AS n_hits,
               ROUND(COUNT(*) * 1.0 / GREATEST(corpus.n_shingles, 1), 6)
                 AS contamination
        FROM corpus JOIN bench USING (shingle)
        GROUP BY corpus.doc_id, corpus.n_shingles
        ORDER BY doc_id
    """,
    "p21_quality_funnel": """
        SELECT COUNT(*) AS n_total,
               CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
               CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n_len,
               CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n_stop_ok,
               COUNT(DISTINCT CASE WHEN s3 THEN text END) AS n_unique
        FROM (
          SELECT text, lang = 'en' AS s1,
                 lang = 'en' AND n_words BETWEEN 10 AND 500 AS s2,
                 lang = 'en' AND n_words BETWEEN 10 AND 500
                   AND n_stop >= n_words * 0.05 AS s3
          FROM (SELECT lang, text, len(w) AS n_words,
                       len(list_intersect(list_distinct(w),
                           ['the','a','an','and','or','of','to','in','is','it']))
                         AS n_stop
                FROM (SELECT lang, text,
                             list_filter(string_split_regex(lower(text), '\\s+'),
                                         x -> x != '') AS w
                      FROM documents))
        )
    """,
    "p16_kmeans": """
        WITH long AS (
          SELECT vec_id AS id, pos AS dim, CAST(v AS DOUBLE) AS val
          FROM (SELECT vec_id, UNNEST(embedding) AS v,
                       UNNEST(range(0, len(embedding))) AS pos
                FROM embeddings)
        ), c0 AS (
          SELECT id AS cid, dim, val AS cval FROM long WHERE id < 4
        ), d1 AS (
          SELECT long.id, c0.cid, SUM(POW(long.val - c0.cval, 2)) AS dist2
          FROM long JOIN c0 USING (dim) GROUP BY long.id, c0.cid
        ), a1 AS (
          SELECT id, cid, dist2 FROM d1
          QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist2, cid) = 1
        ), c1 AS (
          SELECT a1.cid, long.dim, AVG(long.val) AS cval
          FROM long JOIN a1 USING (id) GROUP BY a1.cid, long.dim
        ), d2 AS (
          SELECT long.id, c1.cid, SUM(POW(long.val - c1.cval, 2)) AS dist2
          FROM long JOIN c1 USING (dim) GROUP BY long.id, c1.cid
        ), a2 AS (
          SELECT id, cid, dist2 FROM d2
          QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist2, cid) = 1
        )
        SELECT CAST(cid AS BIGINT) AS cluster_id, COUNT(*) AS n_members,
               ROUND(AVG(dist2), 4) AS avg_dist2
        FROM a2 GROUP BY cid ORDER BY cluster_id
    """,
    "p17_vocab": """
        SELECT word, freq,
               CAST(row_number() OVER (ORDER BY freq DESC, word) - 1 AS INT)
                 AS token_id
        FROM (
          SELECT word, COUNT(*) AS freq FROM (
            SELECT UNNEST(list_filter(string_split_regex(lower(text), '\\s+'),
                                      x -> x != '')) AS word
            FROM documents
          ) GROUP BY word HAVING COUNT(*) >= 2
        )
    """,
    "p14_tfidf": """
        WITH words AS (
          SELECT doc_id AS id, UNNEST(list_filter(
                   string_split_regex(lower(text), '\\s+'), x -> x != '')) AS term
          FROM documents
        ), tf AS (
          SELECT id, term, COUNT(*) AS tf FROM words GROUP BY id, term
        ), dfc AS (
          SELECT term, COUNT(DISTINCT id) AS df FROM tf GROUP BY term
        ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT id AS doc_id, term,
               ROUND(tf * LN(n_docs * 1.0 / df), 6) AS tfidf,
               CAST(rn AS INT) AS rn
        FROM (
          SELECT tf.id, tf.term, tf.tf, dfc.df, n.n_docs,
                 row_number() OVER (PARTITION BY tf.id
                   ORDER BY tf * LN(n_docs * 1.0 / df) DESC, tf.term) AS rn
          FROM tf JOIN dfc USING (term) CROSS JOIN n
        ) WHERE rn <= 3 AND id <= 50
        ORDER BY doc_id, rn
    """,
    "p01_dedup_exact": """
        SELECT md5(text) AS content_hash, MIN(doc_id) AS canonical_id,
               COUNT(*) AS n_copies
        FROM documents GROUP BY md5(text) ORDER BY content_hash
    """,
    "p03_dedup_ngram_jaccard": _SHINGLES_CTE
    + """
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROUND(len(list_intersect(a.s, b.s)) * 1.0
                     / len(list_distinct(a.s || b.s)), 6) AS jaccard
        FROM sh a JOIN sh b
          ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE ROUND(len(list_intersect(a.s, b.s)) * 1.0
                    / len(list_distinct(a.s || b.s)), 6) >= 0.4
        ORDER BY id_a, id_b
    """,
    "p05_dedup_embedding": """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) >= 0.40
        ORDER BY id_a, id_b
    """,
    "p07_ann_lsh": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
               TRUE AS recall_ge_030,
               TRUE AS bounded_topk
        FROM embeddings WHERE vec_id < 10
    """,
    "p23_ann_ivf": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
               TRUE AS recall_ge_050,
               TRUE AS bounded_topk
        FROM embeddings WHERE vec_id < 10
    """,
    "p06_ann_bruteforce": """
        SELECT query_id, neighbor_id, ROUND(c, 4) AS cos FROM (
          SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                 list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS c
          FROM embeddings q JOIN embeddings e ON q.vec_id != e.vec_id
          WHERE q.vec_id < 10
          QUALIFY row_number() OVER (PARTITION BY q.vec_id
                                     ORDER BY c DESC, e.vec_id) <= 5
        ) ORDER BY query_id, neighbor_id
    """,
    "p08_text_quality": """
        SELECT doc_id,
               CAST(len(w) AS INT) AS n_words,
               ROUND(list_aggregate(list_transform(w, x -> len(x)), 'sum')
                     / GREATEST(len(w), 1), 6) AS mean_word_len,
               ROUND(len(list_filter(w, x -> list_contains(
                       ['the','a','an','and','or','of','to','in','is','it'], x)))
                     / GREATEST(len(w), 1), 6) AS stop_ratio,
               ROUND((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                     / GREATEST(length(text), 1), 6) AS punct_ratio,
               ROUND(CASE WHEN len(w) < 5 THEN 0.0 ELSE
                 (1.0 - ROUND((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                        / GREATEST(length(text), 1), 6))
                 * LEAST(ROUND(len(list_filter(w, x -> list_contains(
                       ['the','a','an','and','or','of','to','in','is','it'], x)))
                     / GREATEST(len(w), 1), 6) * 4, 1.0)
                 * LEAST(len(w) / 50.0, 1.0) END, 6) AS quality_score
        FROM (SELECT doc_id, text,
                     list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '') AS w
              FROM documents)
        ORDER BY doc_id
    """,
    "p09_token_counts": """
        SELECT doc_id,
               CAST(len(ws) AS INT) AS ws_tokens,
               CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INT)
                 AS bpe_ish_tokens,
               ROUND(length(text) / GREATEST(len(ws), 1), 6) AS chars_per_ws_token
        FROM (SELECT doc_id, text,
                     list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '') AS ws
              FROM documents)
        ORDER BY doc_id
    """,
    "p10_langid": """
        SELECT doc_id,
               CAST(s_en AS INT) AS score_en, CAST(s_de AS INT) AS score_de,
               CAST(s_es AS INT) AS score_es, CAST(s_fr AS INT) AS score_fr,
               CASE WHEN GREATEST(s_en, s_de, s_es, s_fr) = 0 THEN 'unknown'
                    WHEN s_fr > GREATEST(s_en, s_de, s_es) THEN 'fr'
                    WHEN s_es > GREATEST(s_en, s_de) THEN 'es'
                    WHEN s_de > s_en THEN 'de'
                    ELSE 'en' END AS lang_guess
        FROM (
          SELECT doc_id,
                 len(list_intersect(w, ['the','and','of','to','is'])) AS s_en,
                 len(list_intersect(w, ['der','die','das','und','ist'])) AS s_de,
                 len(list_intersect(w, ['el','la','los','y','es'])) AS s_es,
                 len(list_intersect(w, ['le','la','les','et','est'])) AS s_fr
          FROM (SELECT doc_id,
                       list_distinct(list_filter(
                         string_split_regex(lower(text), '\\s+'), x -> x != '')) AS w
                FROM documents)
        ) ORDER BY doc_id
    """,
    "p11_fingerprint": """
        SELECT doc_id,
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(substr(text, 1, 64), ''),
                                  c -> CAST(COALESCE(ascii(c), 0) AS BIGINT))),
                 (acc, ch) -> (acc * 31 + ch) % 1000000007) AS fp64,
               md5(text) AS fp_md5
        FROM documents ORDER BY doc_id
    """,
    "p12_multimodal_meta": """
        SELECT doc_id,
               'application/octet-stream' AS mime,
               CAST(length(text) AS BIGINT) AS n_bytes,
               lower(hex(CAST(substr(text, 1, 4) AS BLOB))) AS magic_hex
        FROM documents ORDER BY doc_id
    """,
    "p13_multimodal_decode": """
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_bytes,
               CAST(cs % 640 + 1 AS INT) AS fake_width,
               CAST(cs % 480 + 1 AS INT) AS fake_height,
               cs AS byte_checksum
        FROM (
          SELECT doc_id, text,
                 list_aggregate(list_transform(string_split(text, ''),
                                c -> CAST(ascii(c) AS BIGINT)), 'sum')
                   % 2147483648 AS cs
          FROM documents
        ) ORDER BY doc_id
    """,
    # the stub embedding is 8 doubles from md5(payload): 4 hex chars each,
    # scaled by 1/65535 — identical IEEE doubles in both engines
    "p32_extract_embeddings": """
        SELECT doc_id,
               list_transform(generate_series(0, 7),
                 i -> CAST('0x' || substring(md5(text),
                                             CAST(i * 4 + 1 AS INT), 4)
                      AS INT) / 65535.0) AS embedding
        FROM documents WHERE doc_id <= 600 ORDER BY doc_id
    """,
    # frames are 64-byte windows of the UTF-8 payload; both engines hash
    # the lowercase hex encoding (DuckDB md5 only takes VARCHAR)
    "p28_frame_sample": """
        WITH h AS (
          SELECT doc_id, lower(hex(encode(text))) AS hx
          FROM documents WHERE doc_id <= 600
        ), f AS (
          SELECT doc_id, hx,
                 UNNEST(generate_series(0,
                     CAST(CEIL((length(hx) // 128) / 4.0) AS INT) - 1)) AS k
          FROM h WHERE length(hx) >= 128
        )
        SELECT doc_id,
               CAST(k * 4 AS INT) AS frame_idx,
               CAST(k * 160 AS BIGINT) AS ts_ms,
               CAST(64 AS INT) AS n_frame_bytes,
               md5(substring(hx, k * 4 * 128 + 1, 128)) AS frame_md5
        FROM f WHERE k < 8
        ORDER BY doc_id, frame_idx
    """,
    "p29_resize_images": """
        SELECT doc_id, CAST(16 AS INT) AS out_w, CAST(8 AS INT) AS out_h,
               CAST(128 AS INT) AS n_bytes_out,
               md5(substring(repeat(lower(hex(encode(text))),
                                    CAST(CEIL(128.0 / octet_length(encode(text)))
                                         AS INT)),
                             1, 256)) AS resized_md5
        FROM documents WHERE doc_id <= 600
        ORDER BY doc_id
    """,
    "p33_semantic_dedup": """
        WITH v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                 (CASE WHEN embedding[1] >= 0 THEN 8 ELSE 0 END
                  + CASE WHEN embedding[2] >= 0 THEN 4 ELSE 0 END
                  + CASE WHEN embedding[3] >= 0 THEN 2 ELSE 0 END
                  + CASE WHEN embedding[4] >= 0 THEN 1 ELSE 0 END) AS bucket
          FROM embeddings
        ),
        dropped AS (
          SELECT DISTINCT b.vec_id
          FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
          WHERE ROUND(list_cosine_similarity(a.e, b.e), 4) >= 0.4
        )
        SELECT v.vec_id, CAST(v.bucket AS INT) AS bucket,
               (d.vec_id IS NULL) AS kept
        FROM v LEFT JOIN dropped d ON v.vec_id = d.vec_id
        ORDER BY v.vec_id
    """,
    "p34_paragraph_dedup": """
        WITH w AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
          FROM documents WHERE doc_id <= 500
        ),
        c AS (
          SELECT doc_id, CAST(i AS INT) AS idx,
                 array_to_string(ws[(i * 10 + 1):(i * 10 + 10)], ' ') AS chunk
          FROM w, UNNEST(range(CAST(CEIL(len(ws) / 10.0) AS BIGINT))) AS t(i)
        ),
        r AS (
          SELECT doc_id, idx, chunk,
                 ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, idx) = 1
                   AS kept
          FROM c
        )
        SELECT doc_id, COUNT(*) AS n_chunks,
               CAST(COUNT(*) FILTER (WHERE kept) AS BIGINT) AS n_kept,
               COALESCE(string_agg(chunk, ' ' ORDER BY idx) FILTER (WHERE kept),
                        '') AS text_kept
        FROM r GROUP BY doc_id ORDER BY doc_id
    """,
    "p22_stratified_sample": """
        SELECT doc_id, lang, source FROM documents
        WHERE substr(md5(doc_id::VARCHAR), 1, 4) <
              CASE lang WHEN 'en' THEN '8000' WHEN 'de' THEN '4000'
                        WHEN 'es' THEN '4000' WHEN 'fr' THEN '1999' END
        ORDER BY doc_id
    """,
    "p38_shuffle_shards": """
        WITH k AS (
          SELECT CAST(strpos('0123456789abcdef',
                             substr(md5(doc_id::VARCHAR), 1, 1)) - 1 AS INT)
                   AS shard,
                 md5(doc_id::VARCHAR) AS sort_key, n_chars
          FROM documents
        )
        SELECT shard, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
               MIN(sort_key) AS first_key, MAX(sort_key) AS last_key
        FROM k GROUP BY shard ORDER BY shard
    """,
    "p36_audio_energy": """
        WITH b AS (
          SELECT doc_id, text,
                 CAST(FLOOR(length(text) / 64.0) AS BIGINT) AS nf
          FROM documents WHERE doc_id <= 400
        ),
        f AS (
          SELECT doc_id, CAST(j AS INT) AS frame_idx,
                 substr(text, CAST(j * 64 + 1 AS INT), 64) AS seg
          FROM b, UNNEST(range(nf)) AS t(j) WHERE j < 6
        )
        SELECT doc_id, frame_idx, CAST(64 AS INT) AS n_samples,
               ROUND(sqrt(list_aggregate(
                   list_transform(range(1, 65),
                                  i -> ord(substr(seg, CAST(i AS INT), 1)) ^ 2),
                   'sum') / 64.0), 4) AS rms,
               CAST(list_aggregate(
                   list_transform(range(1, 65),
                                  i -> ord(substr(seg, CAST(i AS INT), 1))),
                   'max') AS INT) AS peak
        FROM f ORDER BY doc_id, frame_idx
    """,
    "p37_unigram_logprob": """
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                    x -> x <> '')) AS tok
          FROM documents
        ),
        freq AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM freq)
        SELECT t.doc_id, COUNT(*) AS n_tokens,
               ROUND(AVG(-log2(t2.c / tot.total)), 4) AS avg_neg_log2p
        FROM toks t JOIN freq t2 USING (tok), tot
        WHERE t.doc_id <= 600
        GROUP BY t.doc_id ORDER BY t.doc_id
    """,
    "p15_dedup_canonicalize": """
        WITH v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                 (CASE WHEN embedding[1] >= 0 THEN 8 ELSE 0 END
                  + CASE WHEN embedding[2] >= 0 THEN 4 ELSE 0 END
                  + CASE WHEN embedding[3] >= 0 THEN 2 ELSE 0 END
                  + CASE WHEN embedding[4] >= 0 THEN 1 ELSE 0 END) AS bucket
          FROM embeddings
        ),
        pairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM v a JOIN v b
            ON a.bucket = b.bucket AND a.vec_id < b.vec_id
          WHERE ROUND(list_cosine_similarity(a.e, b.e), 4) >= 0.40
        ),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b, id_a FROM pairs
        ),
        nodes AS (SELECT DISTINCT src AS id FROM edges),
        l0 AS (SELECT id, id AS lab FROM nodes),
        l1 AS (
          SELECT n.id, LEAST(l.lab, COALESCE(MIN(ln.lab), l.lab)) AS lab
          FROM nodes n JOIN l0 l ON l.id = n.id
          LEFT JOIN edges e ON e.src = n.id
          LEFT JOIN l0 ln ON ln.id = e.dst
          GROUP BY n.id, l.lab
        ),
        l2 AS (
          SELECT n.id, LEAST(l.lab, COALESCE(MIN(ln.lab), l.lab)) AS lab
          FROM nodes n JOIN l1 l ON l.id = n.id
          LEFT JOIN edges e ON e.src = n.id
          LEFT JOIN l1 ln ON ln.id = e.dst
          GROUP BY n.id, l.lab
        ),
        l3 AS (
          SELECT n.id, LEAST(l.lab, COALESCE(MIN(ln.lab), l.lab)) AS lab
          FROM nodes n JOIN l2 l ON l.id = n.id
          LEFT JOIN edges e ON e.src = n.id
          LEFT JOIN l2 ln ON ln.id = e.dst
          GROUP BY n.id, l.lab
        )
        SELECT id, lab AS canonical FROM l3 ORDER BY id
    """,
    "p35_connected_components": """
        WITH RECURSIVE v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                 (CASE WHEN embedding[1] >= 0 THEN 8 ELSE 0 END
                  + CASE WHEN embedding[2] >= 0 THEN 4 ELSE 0 END
                  + CASE WHEN embedding[3] >= 0 THEN 2 ELSE 0 END
                  + CASE WHEN embedding[4] >= 0 THEN 1 ELSE 0 END) AS bucket
          FROM embeddings
        ),
        pairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM v a JOIN v b
            ON a.bucket = b.bucket AND a.vec_id < b.vec_id
          WHERE ROUND(list_cosine_similarity(a.e, b.e), 4) >= 0.40
        ),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b, id_a FROM pairs
        ),
        reach(id, r) AS (
          SELECT DISTINCT src, src FROM edges
          UNION
          SELECT e.dst, r.r FROM reach r JOIN edges e ON e.src = r.id
        )
        SELECT id, MIN(r) AS component FROM reach GROUP BY id ORDER BY id
    """,
}

ORACLES["p46_bloom_probe"] = """
    WITH d AS (
      SELECT doc_id, substr(text, 1, 30) AS k FROM documents
    ), batch AS (
      SELECT * FROM d WHERE doc_id % 5 = 0
    ), corpus AS (
      SELECT * FROM d WHERE doc_id % 5 != 0
    ), corpus_pos AS (
      SELECT DISTINCT
             ('0x' || substr(md5(k), 1 + 4 * i.i, 4))::BIGINT % 65536 AS pos
      FROM corpus, (SELECT unnest(range(5)) AS i) i
    ), probe AS (
      SELECT doc_id, k,
             ('0x' || substr(md5(k), 1 + 4 * i.i, 4))::BIGINT % 65536 AS pos
      FROM batch, (SELECT unnest(range(5)) AS i) i
    ), verdict AS (
      SELECT p.doc_id, p.k,
             MIN(CASE WHEN c.pos IS NOT NULL THEN 1 ELSE 0 END) = 1 AS bloom_maybe
      FROM probe p LEFT JOIN corpus_pos c ON p.pos = c.pos
      GROUP BY p.doc_id, p.k
    )
    SELECT v.doc_id, v.bloom_maybe,
           EXISTS (SELECT 1 FROM corpus c WHERE c.k = v.k) AS exact_dup
    FROM verdict v
    ORDER BY v.doc_id
"""

ORACLES["p47_epoch_shuffle"] = """
    WITH keyed AS (
      SELECT doc_id,
             md5(concat_ws('|', 'epoch2', CAST(doc_id AS VARCHAR))) AS sort_key
      FROM documents
    ), sharded AS (
      SELECT doc_id, sort_key,
             CAST(('0x' || substr(sort_key, 1, 4))::BIGINT % 32 AS INT) AS shard
      FROM keyed
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard
                                   ORDER BY sort_key, doc_id) AS INT) AS pos
    FROM sharded
    ORDER BY shard, pos
"""

ORACLES["p48_ann_pq"] = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           TRUE AS recall_ge_050,
           TRUE AS bounded_topk
    FROM embeddings WHERE vec_id < 10
"""

ORACLES["p49_ann_ivfadc"] = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           TRUE AS recall_ge_050,
           TRUE AS bounded_topk
    FROM embeddings WHERE vec_id < 10
"""

ORACLES["p50_canonical_by_quality"] = """
    WITH RECURSIVE v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
             (CASE WHEN embedding[1] >= 0 THEN 8 ELSE 0 END
              + CASE WHEN embedding[2] >= 0 THEN 4 ELSE 0 END
              + CASE WHEN embedding[3] >= 0 THEN 2 ELSE 0 END
              + CASE WHEN embedding[4] >= 0 THEN 1 ELSE 0 END) AS bucket
      FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM v a JOIN v b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE ROUND(list_cosine_similarity(a.e, b.e), 4) >= 0.40
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, r.r FROM reach r JOIN edges e ON e.src = r.id
    ),
    comp AS (
      SELECT v.vec_id AS id,
             COALESCE(c.component, v.vec_id) AS component,
             v.label AS quality
      FROM v LEFT JOIN (SELECT id, MIN(r) AS component
                        FROM reach GROUP BY id) c
        ON v.vec_id = c.id
    )
    SELECT id, component, quality,
           ROW_NUMBER() OVER (PARTITION BY component
                              ORDER BY quality DESC, id) = 1 AS is_canonical
    FROM comp
    ORDER BY id
"""

ORACLES["p51_length_bucketed_batching"] = """
    WITH tok AS (
      SELECT len(list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x != '')) AS n_tok
      FROM documents
    ), b AS (
      SELECT n_tok,
             GREATEST(16, LEAST(1024,
               CAST(POW(2.0, CEIL(LOG2(CAST(n_tok AS DOUBLE)))) AS BIGINT)))
               AS bucket_size
      FROM tok
    )
    SELECT bucket_size,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(bucket_size * COUNT(*) AS BIGINT) AS padded_tokens,
           ROUND((bucket_size * COUNT(*) - SUM(n_tok))
                 / (bucket_size * COUNT(*)), 4) AS waste_pct
    FROM b
    GROUP BY bucket_size
    ORDER BY bucket_size
"""

ORACLES["p52_multimodal_decode_arrow"] = """
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_bytes,
               CAST(cs % 640 + 1 AS INT) AS fake_width,
               CAST(cs % 480 + 1 AS INT) AS fake_height,
               cs AS byte_checksum
        FROM (
          SELECT doc_id, text,
                 list_aggregate(list_transform(string_split(text, ''),
                                c -> CAST(ascii(c) AS BIGINT)), 'sum')
                   % 2147483648 AS cs
          FROM documents
        ) ORDER BY doc_id
    """


def p53_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra–Gries heavy hitters, sketch-then-recount
    (pipeline/sketches.py): per-partition MG(200) summaries → bounded
    candidate union → exact recount of candidates only → top-20 tokens.
    EXACT above the N/capacity guarantee line (certified in-plan by
    guarantee_ok), so the DuckDB oracle recomputes the identical top-20
    from full exact counts — the sketch only bounds what gets
    recounted, never what is reported."""
    from apache_hive_2_1_1_src_spark.pipeline.sketches import heavy_hitters

    docs = t(spark, sf_dir, "documents")
    return heavy_hitters(docs, "text", top_n=20, capacity=200)


QUERIES["p53_heavy_hitters"] = p53_heavy_hitters

ORACLES["p53_heavy_hitters"] = """
    WITH tok AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x != '')) AS token
      FROM documents
    )
    SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt, TRUE AS guarantee_ok
    FROM tok GROUP BY token
    ORDER BY cnt DESC, token ASC LIMIT 20
"""


def p54_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch point estimates (pipeline/sketches.py,
    Cormode & Muthukrishnan 2005): distributed cell build → bounded
    merge → driver-side w×d summary; certified in-plan against exact
    counts on a deterministic probe set (top-10 ∪ alphabetical-10) —
    over_ok (estimates never undercount) and bound_ok (within the
    e/width additive guarantee)."""
    from apache_hive_2_1_1_src_spark.pipeline.sketches import cm_point_report

    docs = t(spark, sf_dir, "documents")
    return cm_point_report(docs, "text", width=1024, depth=4)


QUERIES["p54_count_min"] = p54_count_min

ORACLES["p54_count_min"] = """
    WITH tok AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x != '')) AS token
      FROM documents
    ), exact AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY token
    ), probes AS (
      SELECT token, cnt FROM
        (SELECT token, cnt FROM exact ORDER BY cnt DESC, token LIMIT 10)
      UNION
      SELECT token, cnt FROM
        (SELECT token, cnt FROM exact ORDER BY token LIMIT 10)
    )
    SELECT token, cnt, TRUE AS over_ok, TRUE AS bound_ok
    FROM probes ORDER BY cnt DESC, token
"""


def p55_hyperloglog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HyperLogLog cardinality (pipeline/sketches.py,
    Flajolet et al. 2007): register build is pure JVM codegen
    (xxhash64 → bucket bits + exact msb via bin(); no Python in the
    per-row path), registers merge losslessly by register-wise MAX.
    Certified in-plan: merge_exact_ok (even/odd-shard registers merged
    == whole-corpus registers — the shardability that makes distinct
    counting free at 100 TB) and err_ok (estimate within 5% of exact;
    3-sigma for m=4096 is ~4.9%).  The reported count is the exact
    distinct, so the entry is fully oracle-checkable."""
    from apache_hive_2_1_1_src_spark.pipeline.sketches import hll_report

    docs = t(spark, sf_dir, "documents")
    return hll_report(docs, "text", p=12)


QUERIES["p55_hyperloglog"] = p55_hyperloglog

ORACLES["p55_hyperloglog"] = """
    WITH tok AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x != '')) AS token
      FROM documents
    )
    SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS n_distinct_exact,
           TRUE AS merge_exact_ok, TRUE AS err_ok
    FROM tok
"""


def p56_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout clustering for multi-dimensional
    data skipping (operators/layout.py) — the lakehouse OPTIMIZE
    ZORDER idea; the 100 TB lever is that a 2-D range predicate over a
    Z-clustered table touches only the files whose hyper-rectangle
    intersects the query box, while a round-robin layout touches all of
    them.  In-result certificates: files_zorder < files_roundrobin for
    the same (user_id, ts-hour) box, and the query answer itself is
    layout-invariant (oracle-checked aggregate)."""
    import os as _os
    import tempfile as _tf

    from apache_hive_2_1_1_src_spark.operators.layout import (
        files_touched,
        write_zordered,
    )

    ev = t(spark, sf_dir, "events").withColumn(
        "ts_hour", F.hour("ts") + F.dayofyear("ts") * 24
    )
    base = _os.path.join(
        _tf.gettempdir(), f"zorder_{_os.getpid()}_{_os.path.basename(sf_dir)}"
    )
    zpath, rpath = base + "_z", base + "_r"
    write_zordered(ev, zpath, ["user_id", "ts_hour"], num_files=16)
    ev.repartition(16).write.mode("overwrite").parquet(rpath)
    pred = "user_id <= 3 AND ts_hour BETWEEN 120 AND 264"
    fz = files_touched(spark, zpath, pred)
    fr = files_touched(spark, rpath, pred)
    return (
        spark.read.parquet(zpath)
        .filter(pred)
        .agg(
            F.count("*").alias("n"),
            F.count(F.col("user_id")).alias("n_users_col"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .withColumn("skipping_wins", F.lit(bool(fz < fr)))
    )


QUERIES["p56_zorder_layout"] = p56_zorder_layout

ORACLES["p56_zorder_layout"] = """
    WITH ev AS (
      SELECT *, EXTRACT(hour FROM ts) + EXTRACT(doy FROM ts) * 24 AS ts_hour
      FROM events
    ), hit AS (
      SELECT * FROM ev
      WHERE user_id <= 3 AND ts_hour BETWEEN 120 AND 264
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(user_id) AS BIGINT) AS n_users_col,
           ROUND(CAST(SUM(value) AS DOUBLE), 2) AS total_value,
           TRUE AS skipping_wins
    FROM hit
"""


def p57_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/val split (dedup.leakage_safe_split): near-dup
    cluster members never straddle the split — the contamination guard a
    training pipeline runs between dedup and sharding.  Cluster-
    deterministic md5 side assignment; the cluster_pure certificate is
    in-result and the full oracle recomputes components via recursive-CTE
    reachability plus the identical md5 rule."""
    from apache_hive_2_1_1_src_spark.pipeline.dedup import (
        embedding_near_dups,
        leakage_safe_split,
    )

    emb = t(spark, sf_dir, "embeddings")
    pairs = embedding_near_dups(emb, threshold=0.40, sign_bits=4)
    return leakage_safe_split(emb, pairs).orderBy("id")


QUERIES["p57_leakage_safe_split"] = p57_leakage_safe_split

ORACLES["p57_leakage_safe_split"] = """
    WITH RECURSIVE v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             (CASE WHEN embedding[1] >= 0 THEN 8 ELSE 0 END
              + CASE WHEN embedding[2] >= 0 THEN 4 ELSE 0 END
              + CASE WHEN embedding[3] >= 0 THEN 2 ELSE 0 END
              + CASE WHEN embedding[4] >= 0 THEN 1 ELSE 0 END) AS bucket
      FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM v a JOIN v b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE ROUND(list_cosine_similarity(a.e, b.e), 4) >= 0.40
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, r.r FROM reach r JOIN edges e ON e.src = r.id
    ),
    comp AS (
      SELECT v.vec_id AS id,
             COALESCE(c.component, v.vec_id) AS component
      FROM v LEFT JOIN (SELECT id, MIN(r) AS component
                        FROM reach GROUP BY id) c
        ON v.vec_id = c.id
    )
    SELECT id, component,
           CASE WHEN substr(md5(CAST(component AS VARCHAR)), 1, 1)
                     IN ('0', '1', '2')
                THEN 'val' ELSE 'train' END AS side,
           TRUE AS cluster_pure
    FROM comp
    ORDER BY id
"""


def p58_temperature_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixture rebalancing (curation.temperature_rebalance,
    T=2, budget 50%): per-language keep probabilities ~ n^(1/T),
    deterministic md5-Bernoulli membership; full oracle recomputes the
    probabilities and the exact kept counts."""
    from apache_hive_2_1_1_src_spark.pipeline.curation import (
        temperature_rebalance,
    )

    docs = t(spark, sf_dir, "documents")
    return temperature_rebalance(
        docs, group_col="lang", id_col="doc_id", temperature=2.0,
        target_frac=0.5,
    )


QUERIES["p58_temperature_rebalance"] = p58_temperature_rebalance

ORACLES["p58_temperature_rebalance"] = """
    WITH stats AS (
      SELECT lang AS grp, CAST(COUNT(*) AS BIGINT) AS n_l
      FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT CAST(SUM(n_l) AS DOUBLE) AS n_total,
             SUM(POWER(CAST(n_l AS DOUBLE), 0.5)) AS z
      FROM stats
    ),
    plan AS (
      SELECT grp, n_l,
             ROUND(LEAST(1.0,
               (POWER(CAST(n_l AS DOUBLE), 0.5) / z)
               * (0.5 * n_total) / n_l), 6) AS keep_p
      FROM stats, tot
    )
    SELECT d.lang, p.n_l AS n_before, p.keep_p,
           CAST(SUM(CASE WHEN
             CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                  AS UBIGINT) / 4294967296.0 < p.keep_p
             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents d JOIN plan p ON d.lang = p.grp
    GROUP BY d.lang, p.n_l, p.keep_p
    ORDER BY d.lang
"""
