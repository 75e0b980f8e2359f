-- Ported from udf_greatest.q: GREATEST/LEAST over columns and literals,
-- including the null-skipping behavior both Hive-on-Spark and DuckDB share.
SELECT p_partkey,
       GREATEST(p_size, 25) AS g1,
       LEAST(p_size, 10) AS l1,
       GREATEST(p_size, CAST(NULL AS INT)) AS g_null_skip,
       LEAST(CAST(NULL AS INT), p_size, 40) AS l_null_skip
FROM part WHERE p_partkey <= 100
