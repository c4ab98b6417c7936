"""Sketch-audit tests beyond oracle parity: decision margins for the
percentile audit (cross-engine interpolation + rounding), and the
sketch-exactness invariant behind the top-k audit."""

from __future__ import annotations

from spark_jdbc_limit_spark.operators import get_query


def test_percentile_audit_rounding_margins():
    """agg_approx_percentile_audit rounds EXACT percentiles at 1e-4; the
    two engines interpolate the same doubles with (potentially) last-ulp
    arithmetic differences, so the compare is sound only if no
    percentile sits within float-error distance of a half-up rounding
    boundary — the quality-gate margin discipline applied here.
    Replicates the percentile in numpy on every shipped SF."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from spark_jdbc_limit_spark.operators.sketches import PCT_PROBS

    checked = 0
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/orders.parquet"
        if not os.path.exists(path):
            continue
        t = pq.read_table(path, columns=["o_orderstatus", "o_totalprice"]).to_pandas()
        for status, grp in t.groupby("o_orderstatus"):
            v = grp["o_totalprice"].to_numpy(dtype=np.float64)
            for _, prob in PCT_PROBS:
                x = np.percentile(v, prob * 100, method="linear")
                # distance to the nearest half-up boundary at 4 decimals
                frac = abs(x) * 1e4
                dist = abs(frac - np.floor(frac) - 0.5) / 1e4
                assert dist > 1e-9, (
                    f"{sf}/{status}/p{prob}: percentile {x!r} within {dist:.2e} "
                    "of a 1e-4 rounding boundary — cross-engine flip risk"
                )
                checked += 1
    assert checked >= 9


def test_percentile_audit_rank_booleans_hold(spark, sf_correct):
    rows = get_query("agg_approx_percentile_audit").builder(spark, sf_correct).collect()
    assert len(rows) >= 3
    assert all(r["rank_ok"] for r in rows), [r.asDict() for r in rows if not r["rank_ok"]]


def test_topk_audit_sketch_is_exact_under_capacity(spark, sf_correct):
    """The invariant the audit leans on: with distinct items <= the
    sketch's tracked capacity, approx_top_k counts are exact — so the
    audit's set comparison must pass, and the sketch's counts must equal
    the true groupBy counts item-for-item."""
    from pyspark.sql import functions as F

    from spark_jdbc_limit_spark.operators.sketches import TOPK_TRACKED
    from spark_jdbc_limit_spark.sources.catalog import load_table

    o = load_table(spark, sf_correct, "orders")
    exact = {
        r["o_orderpriority"]: r["cnt"]
        for r in o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert len(exact) <= TOPK_TRACKED
    sk = o.agg(
        F.expr(f"approx_top_k(o_orderpriority, {len(exact)}, {TOPK_TRACKED})").alias("tk")
    ).collect()[0]["tk"]
    assert {e["item"]: e["count"] for e in sk} == exact

    rows = get_query("agg_approx_topk_audit").builder(spark, sf_correct).collect()
    assert all(r["topk_exact_ok"] for r in rows)
