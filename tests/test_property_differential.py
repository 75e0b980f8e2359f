"""Property-based differential testing: hypothesis generates random
filter + aggregate query fragments over `orders`, and Spark must agree
with DuckDB on every one of them.

This is the generative complement to the golden corpus — the reference
pins behavior with enumerated .q files (QTestUtil.java:941-971); here the
space of (predicate × aggregate × group key) combinations is sampled
instead of enumerated.  Expressions are restricted to the common ANSI
dialect both engines parse identically; floats are rounded on both sides
(same rule as the oracle registry).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_correctness import _canon

NUM_COLS = ["o_totalprice", "o_orderkey", "o_custkey"]
STR_COLS = ["o_orderstatus", "o_orderpriority"]
GROUP_KEYS = ["o_orderstatus", "o_orderpriority"]
CMP = ["<", "<=", ">", ">=", "="]

num_pred = st.builds(
    lambda c, op, v: f"{c} {op} {v}",
    st.sampled_from(NUM_COLS),
    st.sampled_from(CMP),
    st.integers(min_value=0, max_value=200_000),
)
str_pred = st.builds(
    lambda c, v: f"{c} {'=' if v else '<>'} 'P'",
    st.sampled_from(STR_COLS),
    st.booleans(),
)
null_pred = st.builds(
    lambda c: f"{c} IS NOT NULL", st.sampled_from(NUM_COLS + STR_COLS)
)
pred = st.one_of(num_pred, str_pred, null_pred)

# AVG is deliberately absent: over SMALL groups (which ROLLUP/CUBE
# subtotals and selective filters produce), sum/n of 2-decimal prices
# is a finite decimal that lands EXACTLY on ROUND half-boundaries where
# the engines' doubles legitimately differ by one ulp (hypothesis found
# ROUND(AVG(...),4) = x.86275 split .8628 vs .8627).  SUM/MIN/MAX at
# 2dp are identity-rounding on 2-decimal inputs — boundary-free.
agg = st.sampled_from(
    [
        "COUNT(*) AS a1",
        "CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS a1",
        "ROUND(SUM(o_totalprice), 2) AS a1",
        "ROUND(MIN(o_totalprice), 2) AS a1",
        "ROUND(MAX(o_totalprice), 2) AS a1",
    ]
)


@st.composite
def query(draw):
    ps = draw(st.lists(pred, min_size=1, max_size=3))
    a = draw(agg)
    key = draw(st.sampled_from(GROUP_KEYS))
    conj = draw(st.sampled_from([" AND ", " OR "]))
    return (
        f"SELECT {key} AS k, {a} FROM orders "
        f"WHERE {conj.join(ps)} GROUP BY {key} ORDER BY k"
    )


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=query())
def test_random_agg_query_matches_duckdb(sql, spark, sf_dir, oracle):
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables()
    sdf = eng.sql(sql)
    scols = [c.lower() for c in sdf.columns]
    srows = sdf.collect()
    rel = oracle.execute(sql)
    ocols = [d[0].lower() for d in rel.description]
    orows = rel.fetchall()
    assert sorted(scols) == sorted(ocols), sql
    assert _canon(srows, scols) == _canon(orows, ocols), sql


join_agg = st.sampled_from(
    [
        "COUNT(*) AS a1",
        "ROUND(SUM(o_totalprice), 2) AS a1",
        "CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS a1",
    ]
)


@st.composite
def join_query(draw):
    p = draw(pred)
    a = draw(join_agg)
    key = draw(st.sampled_from(["c_mktsegment", "c_nationkey"]))
    how = draw(st.sampled_from(["JOIN", "LEFT JOIN"]))
    return (
        f"SELECT {key} AS k, {a} FROM customer {how} orders "
        f"ON c_custkey = o_custkey AND {p} GROUP BY {key} ORDER BY k"
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=join_query())
def test_random_join_query_matches_duckdb(sql, spark, sf_dir, oracle):
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables()
    sdf = eng.sql(sql)
    srows = sdf.collect()
    scols = [c.lower() for c in sdf.columns]
    rel = oracle.execute(sql)
    orows = rel.fetchall()
    ocols = [d[0].lower() for d in rel.description]
    assert _canon(srows, scols) == _canon(orows, ocols), sql


WIN_FNS = [
    "CAST(row_number() OVER w AS BIGINT)",
    "CAST(rank() OVER w AS BIGINT)",
    "CAST(dense_rank() OVER w AS BIGINT)",
    "ROUND(SUM(o_totalprice) OVER w, 2)",
    "ROUND(lag(o_totalprice, 1, 0.0) OVER w, 2)",
    "ROUND(lead(o_totalprice, 1, 0.0) OVER w, 2)",
]


@st.composite
def window_query(draw):
    """Random window function over a random partition key and direction.
    o_orderkey is always the final ORDER BY tiebreaker, so every frame is
    deterministic and both engines must agree exactly."""
    wf = draw(st.sampled_from(WIN_FNS))
    pk = draw(st.sampled_from(["o_orderstatus", "o_orderpriority"]))
    direction = draw(st.sampled_from(["ASC", "DESC"]))
    frame = ""
    if wf.startswith("ROUND(SUM"):
        n = draw(st.integers(min_value=1, max_value=5))
        frame = f" ROWS BETWEEN {n} PRECEDING AND CURRENT ROW"
    lim = draw(st.integers(min_value=500, max_value=3000))
    return (
        f"SELECT o_orderkey, {wf} AS w FROM orders "
        f"WHERE o_orderkey <= {lim} "
        f"WINDOW w AS (PARTITION BY {pk} ORDER BY o_totalprice {direction}, "
        f"o_orderkey{frame}) ORDER BY o_orderkey"
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=window_query())
def test_random_window_query_matches_duckdb(sql, spark, sf_dir, oracle):
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables()
    sdf = eng.sql(sql)
    srows = sdf.collect()
    scols = [c.lower() for c in sdf.columns]
    rel = oracle.execute(sql)
    ocols = [d[0].lower() for d in rel.description]
    orows = rel.fetchall()
    assert sorted(scols) == sorted(ocols), sql
    assert _canon(srows, scols) == _canon(orows, ocols), sql


SET_OPS = [
    "UNION", "UNION ALL", "INTERSECT", "EXCEPT", "INTERSECT ALL", "EXCEPT ALL",
]


@st.composite
def setop_query(draw):
    """Random set operation over two random filtered projections of the
    same table — distinct vs multiset semantics must match exactly
    (HIVE-12764's INTERSECT/EXCEPT family plus the UNION pair)."""
    op = draw(st.sampled_from(SET_OPS))
    col = draw(st.sampled_from(["o_orderstatus", "o_orderpriority", "o_custkey"]))
    lo1 = draw(st.integers(min_value=0, max_value=1500))
    lo2 = draw(st.integers(min_value=0, max_value=1500))
    span = draw(st.integers(min_value=100, max_value=1500))
    return (
        f"SELECT {col} AS k FROM orders "
        f"WHERE o_orderkey BETWEEN {lo1} AND {lo1 + span} "
        f"{op} "
        f"SELECT {col} FROM orders "
        f"WHERE o_orderkey BETWEEN {lo2} AND {lo2 + span}"
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=setop_query())
def test_random_setop_query_matches_duckdb(sql, spark, sf_dir, oracle):
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables()
    sdf = eng.sql(sql)
    srows = sdf.collect()
    scols = [c.lower() for c in sdf.columns]
    rel = oracle.execute(sql)
    orows = rel.fetchall()
    ocols = [d[0].lower() for d in rel.description]
    assert len(srows) == len(orows), sql
    assert _canon(srows, scols) == _canon(orows, ocols), sql


@st.composite
def grouping_sets_query(draw):
    """Random GROUPING SETS / ROLLUP / CUBE over the two string keys —
    subtotal-row NULL semantics and GROUPING() disambiguation must agree
    (groupby_grouping_sets*.q family, GroupByOperator grouping-id path)."""
    form = draw(st.sampled_from(["sets", "rollup", "cube"]))
    a = draw(agg)
    if form == "sets":
        candidates = [
            "(o_orderstatus, o_orderpriority)",
            "(o_orderstatus)",
            "(o_orderpriority)",
            "()",
        ]
        picks = draw(
            st.lists(st.sampled_from(candidates), min_size=1, max_size=3, unique=True)
        )
        # Spark and Hive reject a SELECTed column that appears in no
        # grouping set (DuckDB would NULL it) — keep the full pair set in
        # every sample so both engines accept the query.
        if candidates[0] not in picks:
            picks.append(candidates[0])
        clause = f"GROUPING SETS ({', '.join(picks)})"
    elif form == "rollup":
        clause = "ROLLUP (o_orderstatus, o_orderpriority)"
    else:
        clause = "CUBE (o_orderstatus, o_orderpriority)"
    # keep the input non-empty: on an EMPTY relation Spark's grouping-sets
    # emit zero rows while DuckDB (per ANSI) emits the () grand-total row —
    # a real divergence pinned separately below, excluded from the sample
    # space here (orders keys start at 0, so <= 1000 never filters all).
    lo = draw(st.integers(min_value=0, max_value=1000))
    return (
        "SELECT o_orderstatus AS k1, o_orderpriority AS k2, "
        "CAST(GROUPING(o_orderstatus) AS INT) AS g1, "
        f"CAST(GROUPING(o_orderpriority) AS INT) AS g2, {a} "
        f"FROM orders WHERE o_orderkey >= {lo} "
        f"GROUP BY {clause}"
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=grouping_sets_query())
def test_random_grouping_sets_matches_duckdb(sql, spark, sf_dir, oracle):
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables()
    sdf = eng.sql(sql)
    srows = sdf.collect()
    scols = [c.lower() for c in sdf.columns]
    rel = oracle.execute(sql)
    orows = rel.fetchall()
    ocols = [d[0].lower() for d in rel.description]
    assert len(srows) == len(orows), sql
    assert _canon(srows, scols) == _canon(orows, ocols), sql


_INT_EXPRS = [
    "o_orderkey + o_custkey",
    "o_orderkey - o_custkey",
    "o_custkey * 3",
    "o_orderkey % 7",
    "ABS(o_custkey - 500)",
]
_STR_EXPRS = [
    "UPPER(o_orderstatus)",
    "SUBSTR(o_orderpriority, 1, 3)",
    "CONCAT(o_orderstatus, '-', o_orderpriority)",
    "LENGTH(o_orderpriority)",
]


@st.composite
def scalar_expr_query(draw):
    """Random scalar-expression projections (integer arithmetic, CASE,
    COALESCE/NULLIF, string functions) reduced through GROUP BY — the
    common-dialect expression space both engines must evaluate
    identically (udf_*.q family, sampled instead of enumerated)."""
    base = draw(st.sampled_from(_INT_EXPRS))
    wrap = draw(st.sampled_from(["plain", "case", "nullif"]))
    thresh = draw(st.integers(min_value=0, max_value=3000))
    if wrap == "case":
        e = f"CASE WHEN o_custkey < {thresh} THEN {base} ELSE -1 END"
    elif wrap == "nullif":
        e = f"COALESCE(NULLIF({base}, {thresh}), 0)"
    else:
        e = base
    s = draw(st.sampled_from(_STR_EXPRS))
    return (
        f"SELECT {s} AS sk, COUNT(*) AS n, "
        f"SUM(CAST({e} AS BIGINT)) AS tot "
        "FROM orders GROUP BY sk"
    )


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=scalar_expr_query())
def test_random_scalar_exprs_match_duckdb(sql, spark, sf_dir, oracle):
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables()
    sdf = eng.sql(sql)
    srows = sdf.collect()
    scols = [c.lower() for c in sdf.columns]
    rel = oracle.execute(sql)
    orows = rel.fetchall()
    ocols = [d[0].lower() for d in rel.description]
    assert len(srows) == len(orows), sql
    assert _canon(srows, scols) == _canon(orows, ocols), sql


def test_rollup_on_empty_input_divergence_pinned(spark, sf_dir, oracle):
    """Documented divergence: GROUP BY ROLLUP over an EMPTY relation.
    ANSI (and DuckDB) treat the () grouping set like a global aggregate —
    one grand-total row with COUNT 0; Spark emits zero rows (its Expand
    runs per input row, so no input → no output).  Hive 2.1 follows the
    per-row Expand model too (GroupByOperator emits nothing without
    input rows on the grouping-id path), so the Spark behavior is the
    Hive-parity one.  Pinned so the difference is a decision, not a
    surprise."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    sql = (
        "SELECT o_orderstatus AS k, COUNT(*) AS n FROM orders "
        "WHERE o_orderkey < 0 GROUP BY ROLLUP (o_orderstatus)"
    )
    eng = HiveEngine(spark, sf_dir)
    eng.register_tables()
    assert eng.sql(sql).collect() == []
    assert oracle.execute(sql).fetchall() == [(None, 0)]


dw_agg = st.sampled_from(["COUNT", "SUM", "AVG"])
dw_arg = st.sampled_from(
    ["o_custkey", "o_orderkey % 50", "o_custkey % 13"]
)
dw_part = st.sampled_from(GROUP_KEYS)


@st.composite
def distinct_window_query(draw):
    fn = draw(dw_agg)
    arg = draw(dw_arg)
    part = draw(dw_part)
    p = draw(pred)
    expr = f"{fn}(DISTINCT {arg}) OVER (PARTITION BY {part})"
    if fn != "COUNT":
        expr = f"ROUND(CAST({expr} AS DOUBLE), 4)"
    return (
        f"SELECT o_orderkey AS k, {expr} AS a1 "
        f"FROM orders WHERE {p} AND o_orderkey <= 2000"
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=distinct_window_query())
def test_random_distinct_window_matches_duckdb(sql, spark, sf_dir, oracle):
    """Generative differential for the HIVE-9534 collect_set rewrite:
    any (agg, expression arg, partition key, predicate) combination must
    agree with DuckDB's native distinct window aggregates."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables()
    sdf = eng.sql(sql)
    scols = [c.lower() for c in sdf.columns]
    srows = sdf.collect()
    rel = oracle.execute(sql)
    ocols = [d[0].lower() for d in rel.description]
    orows = rel.fetchall()
    assert sorted(scols) == sorted(ocols), sql
    assert _canon(srows, scols) == _canon(orows, ocols), sql


oj_where = st.sampled_from(
    [
        "o_custkey IS NULL",      # anti-join-via-outer idiom
        "c_custkey IS NULL",      # preserved-side-null (FULL/RIGHT only hits)
        "c_acctbal > 0",
        "o_totalprice > 100000",
        "1 = 1",
    ]
)


@st.composite
def outer_join_trap_query(draw):
    """Outer joins with single-side ON conjuncts (match filters, not row
    filters) and WHERE predicates that may reference the null-producing
    side — the auto_join21.q / ppd_outer_join trap family, sampled."""
    how = draw(st.sampled_from(["LEFT JOIN", "RIGHT JOIN", "FULL JOIN"]))
    on_extra = draw(pred)
    where = draw(oj_where)
    return (
        f"SELECT c_custkey AS ck, COUNT(*) AS a1, "
        f"CAST(COUNT(o_orderkey) AS BIGINT) AS a2 "
        f"FROM customer {how} orders ON c_custkey = o_custkey AND {on_extra} "
        f"WHERE {where} GROUP BY c_custkey ORDER BY ck"
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=outer_join_trap_query())
def test_random_outer_join_on_where_matches_duckdb(sql, spark, sf_dir, oracle):
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables()
    sdf = eng.sql(sql)
    scols = [c.lower() for c in sdf.columns]
    srows = sdf.collect()
    rel = oracle.execute(sql)
    ocols = [d[0].lower() for d in rel.description]
    orows = rel.fetchall()
    assert sorted(scols) == sorted(ocols), sql
    assert _canon(srows, scols) == _canon(orows, ocols), sql
