"""Invariants for the remaining rows-only registry entries (sketches and
functions DuckDB can't mirror): every query without an oracle gets pinned
behavior here or in test_functions/test_pipeline_invariants."""

from __future__ import annotations

import re

from apache_hive_2_1_1_src_spark.queries.aggregates import (
    q25_approx_count_distinct,
    q27_percentile_approx,
    q33_histogram_numeric,
)
from apache_hive_2_1_1_src_spark.queries.functions_sql import q68_hash_extra


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    # the 5%-envelope certificate is now the oracle-checked contract;
    # re-assert it here at the pytest scale factor too
    row = q25_approx_count_distinct(spark, sf_dir).collect()[0]
    assert row.approx_within_5pct and row.exact_orders > 0


def test_percentile_approx_brackets_exact(spark, sf_dir):
    for r in q27_percentile_approx(spark, sf_dir).collect():
        assert r.approx_within_2pct, (r.l_returnflag, r.exact_median_price)


def test_histogram_numeric_mass_and_bins(spark, sf_dir):
    """Raw-bin pin for q33 (the registry query exposes the invariant
    certificate; the bins themselves stay pinned here): 5 ordered bins,
    total mass == row count, centroids inside the l_quantity domain."""
    from pyspark.sql import functions as F

    from apache_hive_2_1_1_src_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    bins = (
        li.agg(F.expr("histogram_numeric(l_quantity, 5)").alias("bins"))
        .select(F.explode("bins").alias("bin"))
        .select(F.col("bin.x").alias("x"), F.col("bin.y").cast("double").alias("y"))
        .collect()
    )
    assert len(bins) == 5
    total = sum(b.y for b in bins)
    assert total == li.count()
    xs = [b.x for b in bins]
    assert xs == sorted(xs)
    assert all(1.0 <= b.x <= 50.0 for b in bins)  # l_quantity range

    cert = q33_histogram_numeric(spark, sf_dir).collect()[0]
    assert cert.nbins == 5 and cert.centroids_in_range


def test_hash_extra_formats_and_determinism(spark, sf_dir):
    from apache_hive_2_1_1_src_spark.queries.functions_sql import hash_extra_full

    rows1 = {r.doc_id: r for r in hash_extra_full(spark, sf_dir).collect()}
    rows2 = {r.doc_id: r for r in hash_extra_full(spark, sf_dir).collect()}
    for did, r in rows1.items():
        assert re.fullmatch(r"[0-9a-f]{40}", r.sha1_hex)
        assert 0 <= r.crc <= 0xFFFFFFFF
        assert r.sha1_ok and r.crc32_ok  # JVM builtins == hashlib/zlib refs
        r2 = rows2[did]
        assert (r.sha1_hex, r.crc, r.murmur32, r.xx64) == (
            r2.sha1_hex,
            r2.crc,
            r2.murmur32,
            r2.xx64,
        )


def test_stratified_sample_pinned(spark, sf_dir):
    """p22 (now hash-stratified, oracle-checked) stays deterministic, a
    subset of the source, respects the stratum whitelist, and lands near
    the requested fractions; the seeded ``sampleBy`` Bernoulli surface
    keeps its determinism pin here."""
    from apache_hive_2_1_1_src_spark.io import load_table
    from apache_hive_2_1_1_src_spark.pipeline.curation import stratified_sample
    from apache_hive_2_1_1_src_spark.queries.pipeline_queries import (
        p22_stratified_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    s1 = stratified_sample(docs, {"en": 0.5, "de": 0.25}).count()
    s2 = stratified_sample(docs, {"en": 0.5, "de": 0.25}).count()
    assert s1 == s2, "seeded sampleBy must be deterministic"

    a = p22_stratified_sample(spark, sf_dir).collect()
    b = p22_stratified_sample(spark, sf_dir).collect()
    assert a == b, "hash-stratified sample must be deterministic"

    docs = load_table(spark, sf_dir, "documents")
    all_ids = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    fractions = {"en": 0.5, "de": 0.25, "es": 0.25, "fr": 0.1}
    for r in a:
        assert r.doc_id in all_ids and all_ids[r.doc_id] == r.lang
        assert r.lang in fractions

    from collections import Counter

    totals = Counter(lang for lang in all_ids.values())
    got = Counter(r.lang for r in a)
    for lang, frac in fractions.items():
        n = totals[lang]
        if n < 30:
            continue
        # Bernoulli envelope: 5 sigma
        import math

        sigma = math.sqrt(n * frac * (1 - frac))
        assert abs(got[lang] - n * frac) <= 5 * sigma + 1, (lang, got[lang], n)


def test_percent_sample_pinned(spark, sf_dir):
    """q133: the hash-space 10% sample is deterministic and within a
    5-sigma envelope of the requested fraction; the seeded-Bernoulli
    sampling surface (.sample(fraction, seed)) keeps its determinism pin
    here too."""
    import math

    from apache_hive_2_1_1_src_spark.io import load_table
    from apache_hive_2_1_1_src_spark.queries.language_surface import (
        q133_percent_sample,
    )

    a = q133_percent_sample(spark, sf_dir).collect()[0]
    b = q133_percent_sample(spark, sf_dir).collect()[0]
    assert a == b, "hash sample must be deterministic"
    n = load_table(spark, sf_dir, "lineitem").count()
    sigma = math.sqrt(n * 0.1 * 0.9)
    assert abs(a.n_rows - n * 0.1) <= 5 * sigma + 1

    li = load_table(spark, sf_dir, "lineitem")
    s1 = li.sample(fraction=0.1, seed=7).count()
    s2 = li.sample(fraction=0.1, seed=7).count()
    assert s1 == s2, "seeded Bernoulli sample must be deterministic"
    assert abs(s1 - n * 0.1) <= 5 * sigma + 1
