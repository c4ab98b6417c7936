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


def test_sketch_audit_exact_comparand_excludes_null_keys(spark, tmp_path):
    """The exact comparand in the sketch audits must match COUNT(DISTINCT)
    semantics: NULL keys are excluded (approx_count_distinct and
    hll_sketch_agg both skip nulls), so a null-keyed corpus must not skew
    the two-level exact count by one. Runs both audit queries over a
    micro lineitem with NULL supp/part keys against their real oracles."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_jdbc_limit_spark.operators import REGISTRY
    from tests.oracle_utils import compare_frames

    rows = [
        # (returnflag, suppkey, partkey); group "R" is ALL-NULL on both
        # keys — exact = approx = 0, and the tolerance boolean must be
        # zero-safe TRUE (0/0 would be NULL), matching the oracle's TRUE
        ("A", 1, 10), ("A", 1, None), ("A", None, 10), ("A", 2, 11),
        ("N", None, None), ("N", 3, 12), ("N", 3, 12),
        ("R", None, None), ("R", None, None),
    ]
    tbl = pa.table({
        "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
        "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[2] for r in rows], pa.int64()),
        # columns other queries need are absent on purpose: these two
        # queries must stay runnable from just the columns they prune to
        "l_quantity": pa.array([1.0] * len(rows), pa.float64()),
    })
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{tmp_path}/lineitem.parquet')"
    )
    for name in ("agg_approx_distinct", "agg_hll_sketch_union"):
        spec = REGISTRY[name]
        spdf = spec.builder(spark, str(tmp_path)).toPandas()
        odf = con.execute(spec.oracle).fetchdf()
        compare_frames(spdf, odf, name)


def test_cms_overestimates_exist_and_invariant_holds(spark, sf_correct):
    """Non-vacuity + the CMS guarantee, from the estimates themselves:
    with ~2000 distinct parts hashed into 256 buckets, collisions are
    unavoidable, so the sketch must OVERestimate somewhere (else the
    query degenerates to an exact count and audits nothing) while never
    undershooting anywhere (each occurrence of a key lands in all d of
    its cells; collisions only add)."""
    from spark_jdbc_limit_spark.operators import get_query

    pdf = (
        get_query("agg_count_min_frequency_audit")
        .builder(spark, sf_correct)
        .toPandas()
    )
    assert (pdf["est_n"] >= pdf["exact_n"]).all()
    assert (pdf["est_n"] > pdf["exact_n"]).any(), "no collisions — sketch vacuous"
    assert pdf["never_underestimates"].all()


def test_join_size_estimate_is_nonvacuous_and_bounded(spark, sf_correct):
    """Non-vacuity + both guarantees for the inner-product estimate:
    with ~2400 date keys hashed into CMS_JOIN_W=2048 buckets the hash
    CANNOT be injective (pigeonhole), so the estimate must strictly
    overshoot — the width was pinned below the key span precisely
    because wider sketches went injective on the contiguous day range
    and made the audit vacuous — while never undershooting and staying
    within the |A|·|B|/W Markov bound."""
    from spark_jdbc_limit_spark.operators import get_query

    row = (
        get_query("agg_cms_join_size_audit").builder(spark, sf_correct).collect()[0]
    )
    assert row.est_size > row.exact_size, "no collision mass — audit vacuous"
    assert row.never_underestimates and row.overshoot_within_bound
    # the estimate is an ESTIMATE: within 2x of truth at this shape
    assert row.est_size < 2 * row.exact_size


def test_join_size_sketch_matches_materialized_join(spark, sf_correct):
    """The exact comparand really is the join size: materialize the
    orders⋈lineitem date join and count it."""
    from pyspark.sql import functions as F

    from spark_jdbc_limit_spark.operators import get_query
    from spark_jdbc_limit_spark.sources.catalog import load_table

    row = (
        get_query("agg_cms_join_size_audit").builder(spark, sf_correct).collect()[0]
    )
    o = load_table(spark, sf_correct, "orders").select(
        F.col("o_orderdate").cast("date").alias("k")
    )
    li = load_table(spark, sf_correct, "lineitem").select(
        F.col("l_shipdate").cast("date").alias("k")
    )
    assert o.join(li, "k").count() == row.exact_size
