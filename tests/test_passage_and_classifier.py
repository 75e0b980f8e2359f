"""Property pins for p41 (hashed linear classifier) and p42
(repeated-passage detection) beyond their SQL oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.pipeline.dedup import duplicated_span_fraction
from apache_hive_2_1_1_src_spark.pipeline.text import classifier_score


def _tokens(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_planted_passage_copy_is_detected(spark):
    shared = _tokens("sh", 30)  # a 30-token passage copied across docs
    docs = spark.createDataFrame(
        [
            (1, shared + " " + _tokens("a", 20)),
            (2, _tokens("b", 15) + " " + shared),  # copy at a DIFFERENT offset
            (3, _tokens("c", 50)),  # fully unique
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in duplicated_span_fraction(docs).collect()}
    assert got[3]["n_dup"] == 0 and got[3]["dup_frac"] == 0.0
    # stride-5 windows inside a 30-token shared passage must collide for
    # both carriers even though the copy sits at offset 15 (not stride-
    # aligned offsets still produce >=1 aligned window pair only when
    # offsets are congruent mod stride; 0 and 15 are, mod 5)
    assert got[1]["n_dup"] > 0 and got[2]["n_dup"] > 0
    assert 0 < got[1]["dup_frac"] <= 1.0


def test_unaligned_copy_offset_documented_miss(spark):
    # offsets 0 vs 17 are NOT congruent mod 5: the stride trade-off can
    # miss the collision — this pins the DOCUMENTED behavior so the
    # stride granularity claim in the docstring stays honest
    shared = _tokens("sh", 22)
    docs = spark.createDataFrame(
        [
            (1, shared + " " + _tokens("a", 20)),
            (2, _tokens("b", 17) + " " + shared),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in duplicated_span_fraction(docs).collect()}
    assert got[1]["n_dup"] == 0 and got[2]["n_dup"] == 0


def test_classifier_deterministic_and_token_count_exact(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha alpha"), (3, "")],
        "doc_id long, text string",
    )
    out1 = {r["doc_id"]: r for r in classifier_score(docs).collect()}
    out2 = {r["doc_id"]: r for r in classifier_score(docs).collect()}
    assert out1.keys() == {1, 2}  # empty doc has no tokens, no row
    assert out1[1]["n_tokens"] == 3 and out1[2]["n_tokens"] == 2
    # identical tokens contribute identical weights: doc 2 is 2*w(alpha)
    assert out1[2]["score_sum"] % 2 == 0
    for k in out1:
        assert out1[k]["score_sum"] == out2[k]["score_sum"]
    assert out1[1]["keep"] == (out1[1]["score_sum"] > 0)


def test_epoch_mix_copy_semantics(spark):
    from apache_hive_2_1_1_src_spark.pipeline.curation import epoch_weighted_mix

    docs = spark.createDataFrame(
        [(i, f"src{i % 4}", "text") for i in range(40)],
        "doc_id long, source string, text string",
    )
    mixed = epoch_weighted_mix(
        docs, {"src0": 3.0, "src1": 2.5, "src2": 0.5, "src3": 0.0}
    )
    rows = mixed.groupBy("source").count().collect()
    got = {r["source"]: r["count"] for r in rows}
    assert "src3" not in got  # weight 0: domain dropped entirely
    assert got["src0"] == 30  # exactly 3 copies of 10 docs
    assert 20 <= got["src1"] <= 30  # 2 copies + ~half get a third
    assert 0 <= got.get("src2", 0) <= 10  # below one epoch
    # deterministic: identical on re-run
    again = {
        r["source"]: r["count"]
        for r in epoch_weighted_mix(
            docs, {"src0": 3.0, "src1": 2.5, "src2": 0.5, "src3": 0.0}
        ).groupBy("source").count().collect()
    }
    assert got == again
    # copy ids are 1..n per doc
    per_doc = mixed.filter(F.col("source") == "src0").groupBy("doc_id").agg(
        F.max("copy_id").alias("mx"), F.count(F.lit(1)).alias("n")
    )
    assert all(r["mx"] == r["n"] == 3 for r in per_doc.collect())
