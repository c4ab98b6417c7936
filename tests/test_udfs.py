"""UDF-surface tests: the pandas UDAF must agree with its exact-decimal
built-in twin to float tolerance, and UDF queries must use Arrow-batched
eval nodes (never row-at-a-time BatchEvalPython)."""

from __future__ import annotations

from spark_jdbc_limit_spark.operators import get_query
from spark_jdbc_limit_spark.operators.udfs import weighted_avg_builtin_twin
from spark_jdbc_limit_spark.plans import plan_text


def test_udaf_matches_builtin_twin(spark, sf_correct):
    got = {
        r.l_returnflag: r.w_avg_price
        for r in get_query("udaf_grouped_weighted_avg").builder(spark, sf_correct).collect()
    }
    want = {r.l_returnflag: r.w_avg_price for r in weighted_avg_builtin_twin(spark, sf_correct).collect()}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) <= 1e-9 * abs(want[k]), (k, got[k], want[k])


def test_udf_queries_use_arrow_eval(spark, sf_correct):
    scalar_plan = plan_text(get_query("udf_pandas_scalar").builder(spark, sf_correct))
    assert "ArrowEvalPython" in scalar_plan
    assert "BatchEvalPython" not in scalar_plan  # the 10-100x-slower row path
    grouped_plan = plan_text(get_query("udf_grouped_map_scale").builder(spark, sf_correct))
    assert "FlatMapGroupsInPandas" in grouped_plan


def test_udtf_rowcount_scales_with_words(spark, sf_correct):
    from spark_jdbc_limit_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    n_bigrams = get_query("udtf_word_ngrams").builder(spark, sf_correct).count()
    expected = (
        load_table(spark, sf_correct, "documents")
        .filter(F.col("doc_id") < 100)
        .select((F.size(F.split("text", " ")) - 1).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert n_bigrams == expected
