"""Plan-assertion tests — the reference's golden-plan discipline
(reference README pins physical plans as proof pushdown fired; here we
assert PushedFilters / pruned ReadSchema / join strategy / exchange
counts so optimizations can't silently regress)."""

from __future__ import annotations

from spark_jdbc_limit_spark.operators import get_query
from spark_jdbc_limit_spark.plans import (
    assert_broadcast_hash_join,
    assert_no_python_udf_in_plan,
    assert_pushed_filters,
    assert_read_schema_cols,
    assert_sort_merge_join,
    count_exchanges,
)
from spark_jdbc_limit_spark.sources.jdbc import map_reference_options


def test_q1_pushdown_and_pruning(spark, sf_dir):
    df = get_query("q1_pricing_summary").builder(spark, sf_dir)
    assert_pushed_filters(df, "l_shipdate")
    assert_read_schema_cols(
        df,
        "lineitem",
        {
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        },
    )
    assert_no_python_udf_in_plan(df)
    # one shuffle for the agg + one for the global sort — no more
    assert count_exchanges(df) <= 2


def test_scan_filter_pushdown(spark, sf_dir):
    df = get_query("scan_project_filter_topk").builder(spark, sf_dir)
    assert_pushed_filters(df, "l_shipdate", "l_discount")
    assert_read_schema_cols(
        df,
        "lineitem",
        {"l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate", "l_discount"},
    )
    # top-k must not global-sort: TakeOrderedAndProject, zero shuffles
    from spark_jdbc_limit_spark.plans import plan_text

    assert "TakeOrderedAndProject" in plan_text(df)
    assert count_exchanges(df) == 0


def test_broadcast_join_strategy(spark, sf_dir):
    df = get_query("join_broadcast_dim").builder(spark, sf_dir)
    assert_broadcast_hash_join(df)
    # fact side must not shuffle for the join; agg adds one, sort one
    assert count_exchanges(df) <= 2


def test_sortmerge_join_strategy(spark, sf_dir):
    df = get_query("join_sortmerge_facts").builder(spark, sf_dir)
    assert_sort_merge_join(df)


def test_star_join_single_fact_shuffle(spark, sf_dir):
    df = get_query("join_multiway_star").builder(spark, sf_dir)
    assert_broadcast_hash_join(df)
    text_exchanges = count_exchanges(df)
    # lineitem⋈orders⋈customer may shuffle each input once + agg + sort;
    # anything above that means a dimension failed to broadcast.
    assert text_exchanges <= 5, f"too many exchanges: {text_exchanges}"


def test_relational_queries_stay_jvm_side(spark, sf_dir):
    for name in (
        "q1_pricing_summary",
        "join_asof_events_orders",
        "window_topk_per_group",
        "agg_rollup",
        "scalar_array_funcs",
    ):
        assert_no_python_udf_in_plan(get_query(name).builder(spark, sf_dir))


def test_pipeline_ops_shuffle_budget(spark, sf_dir):
    """The selection operators must hit their designed shuffle counts:
    hash sampling is a pure scan-side filter (zero exchanges), quota and
    packing are one window shuffle, survivor dedup is one agg shuffle."""
    sample = get_query("sample_deterministic_hash").builder(spark, sf_dir)
    assert count_exchanges(sample) == 0
    assert_read_schema_cols(sample, "documents", {"doc_id", "source", "n_chars"})
    assert_no_python_udf_in_plan(sample)

    assert count_exchanges(get_query("sample_quota_per_source").builder(spark, sf_dir)) == 1
    # packing is two-phase (r7): one DATA-sized exchange on (source, bucket)
    # plus two micro exchanges over the per-bucket totals relation; the data
    # exchange is REUSED across branches (test_pack_tokens_no_bare_source_window)
    assert count_exchanges(get_query("pack_tokens_sequential").builder(spark, sf_dir)) == 3
    assert count_exchanges(get_query("dedup_survivor_policy").builder(spark, sf_dir)) == 1


def test_reference_option_mapping():
    mapped = map_reference_options(
        {"url": "jdbc:postgresql://h/db", "table": "t", "fetchsize": 1000, "numPartitions": 8}
    )
    assert mapped["dbtable"] == "t"
    assert mapped["fetchsize"] == "1000"
    # the reference's hand-rolled pushdowns must be on by default
    assert mapped["pushDownLimit"] == "true"
    assert mapped["pushDownPredicate"] == "true"


def test_decontaminate_broadcasts_eval_side(spark, sf_dir):
    """The corpus-side scan must join the (tiny) eval shingle set and the
    contaminated-id set via broadcast — a shuffle of the corpus here is
    exactly the plan that dies at 100 TB."""
    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("decontaminate_ngram_overlap").builder(spark, sf_dir)
    text = plan_text(df)
    assert "BroadcastHashJoin" in text
    # semi (shingle overlap) + anti (survivor filter) both broadcast
    assert "LeftSemi" in text and "LeftAnti" in text
    for marker in ("SortMergeJoin", "ShuffledHashJoin"):
        assert marker not in text, f"corpus-side shuffle join: {marker}"


def test_collect_sorted_single_agg_exchange(spark, sf_dir):
    df = get_query("agg_collect_sorted").builder(spark, sf_dir)
    assert_broadcast_hash_join(df)
    # one shuffle for the groupBy, one for the output sort
    assert count_exchanges(df) <= 2


def test_interval_overlap_join_shape(spark, sf_dir):
    """Interval join must stay an equi-keyed hash/SMJ with the overlap
    predicate as a post-join condition — never a nested-loop cross
    product — and read only the three needed order columns."""
    df = get_query("join_interval_overlap").builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    assert_read_schema_cols(
        df, "orders", {"o_orderkey", "o_custkey", "o_orderdate"}
    )
    # agg reuses the join's custkey partitioning; budget: join-side
    # exchanges (or none when broadcast) + final sort
    assert count_exchanges(df) <= 3


def test_sessionize_single_exchange(spark, sf_dir):
    """Gap sessionization's whole point at scale: lag-window, running-sum
    window, and the final groupBy all share the user_id partitioning —
    ONE exchange for the entire query."""
    df = get_query("events_sessionize_gap").builder(spark, sf_dir)
    assert count_exchanges(df) == 1
    assert_no_python_udf_in_plan(df)


def test_repetition_ratio_scan_speed_shape(spark, sf_dir):
    """The 3-gram repetition signal must be a pure scan-side map: zero
    exchanges, zero Python, only the two needed columns read."""
    df = get_query("text_repetition_ratio").builder(spark, sf_dir)
    assert count_exchanges(df) == 0
    assert_no_python_udf_in_plan(df)
    assert_read_schema_cols(df, "documents", {"doc_id", "text"})


def test_curation_pipeline_shuffle_budget(spark, sf_dir):
    """Composing gate→dedup→accounting must not multiply passes: the gate
    rides the scan (no exchange of its own); the budget is the dedup
    groupBy + the distinct-lang accounting agg + its expand, ≤ 4 total."""
    df = get_query("curate_corpus_pipeline").builder(spark, sf_dir)
    assert count_exchanges(df) <= 4
    assert_no_python_udf_in_plan(df)


def test_curate_full_pipeline_plan_shape(spark, sf_dir):
    """The composed capstone (gate → dup cut + decon cut → accounting)
    must stay JVM-side and corpus-pass-bounded: zero Python in the plan,
    zero cartesian products, and at most 4 parquet scans of documents
    (the gated checkpoint's materialization, the eval slice, and the
    column-pruned accounting scans) — composition must not multiply
    corpus passes as stages are added."""
    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("curate_full_pipeline").builder(spark, sf_dir)
    txt = plan_text(df)
    assert_no_python_udf_in_plan(df)
    assert "CartesianProduct" not in txt
    assert txt.count("Scan parquet") <= 4


def test_mode_argmax_two_aggregates_no_window(spark, sf_dir):
    """The argmax-mode pattern is two hash aggregates (+ output sort) —
    no window over the raw rows, which is the skew-prone alternative."""
    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("agg_mode_argmax").builder(spark, sf_dir)
    assert count_exchanges(df) <= 3
    assert "Window" not in plan_text(df)


def test_partition_pruning_on_partitioned_layout(spark, sf_dir, tmp_path):
    """Hive-style partition layout + a partition-key predicate must prune
    at PLANNING time: the scan's PartitionFilters carries the predicate
    and only the matching partition directories are read — at 100 TB this
    is the difference between reading one day and reading the decade."""
    from pyspark.sql import functions as F

    from spark_jdbc_limit_spark.plans import plan_text
    from spark_jdbc_limit_spark.sources.catalog import load_table

    target = str(tmp_path / "events_parted")
    ev = load_table(spark, sf_dir, "events")
    ev.write.partitionBy("event_type").parquet(target)
    types = sorted(r.event_type for r in ev.select("event_type").distinct().collect())
    victim = types[0]

    pruned = spark.read.parquet(target).filter(F.col("event_type") == victim)
    plan = plan_text(pruned)
    assert "PartitionFilters" in plan and "event_type" in plan
    # every file the scan ACTUALLY reads lives under the victim partition
    # (inputFiles() is relation-level/pre-pruning, so ask execution itself)
    files = [r[0] for r in pruned.select(F.input_file_name()).distinct().collect()]
    assert files and all(f"event_type={victim}" in f for f in files)
    assert pruned.count() == ev.filter(F.col("event_type") == victim).count()


def test_salted_join_matches_plain_and_spreads_keys(spark, sf_dir):
    """The salted join is a pure redistribution trick: row-identical to
    the plain (unsalted) join — the oracle differential pins value
    equality; here we pin the plan carries the composite (key, salt)
    join key, i.e. the hot key genuinely spreads over SALT_BUCKETS
    reducers."""
    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("join_salted_replicated").builder(spark, sf_dir)
    plan = plan_text(df)
    assert "salt" in plan
    assert "Explode" in plan or "Generate" in plan  # dim replicated B×
    assert len(df.take(1)) == 1


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Both sides bucketed on the join key → the equi-join itself needs no
    Exchange: the only shuffles allowed are the post-join aggregation and
    the global sort. With broadcast disabled, a non-bucketed read of the
    same join would need two more exchanges to co-locate the keys."""
    from spark_jdbc_limit_spark.operators.joins import _bucketed_tables
    from spark_jdbc_limit_spark.plans import plan_text

    with_conf = [
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.enabled", "false"),
    ]
    old = {k: spark.conf.get(k, None) for k, _ in with_conf}
    try:
        for k, v in with_conf:
            spark.conf.set(k, v)
        cust_tbl, ord_tbl = _bucketed_tables(spark, sf_dir)
        c = spark.table(cust_tbl)
        o = spark.table(ord_tbl)
        joined = c.join(o, c["c_custkey"] == o["o_custkey"]).select(
            "c_custkey", "o_orderkey"
        )
        txt = plan_text(joined)
        assert "SortMergeJoin" in txt
        assert "Exchange" not in txt, txt
        assert joined.count() > 0

        # control: same join over the raw parquet needs exchanges
        from spark_jdbc_limit_spark.sources.catalog import load_table

        cr = load_table(spark, sf_dir, "customer")
        orr = load_table(spark, sf_dir, "orders")
        control = cr.join(orr, cr["c_custkey"] == orr["o_custkey"]).select(
            "c_custkey", "o_orderkey"
        )
        assert "Exchange" in plan_text(control)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_pii_redaction_scan_speed_shape(spark, sf_dir):
    """Redaction is a pure map: zero exchanges, zero Python — the scrub
    runs inside the scan stage's codegen at any corpus size."""
    df = get_query("text_pii_redaction").builder(spark, sf_dir)
    assert_no_python_udf_in_plan(df)
    assert count_exchanges(df) == 0


def test_ngram_topk_partial_agg_topk_shape(spark, sf_dir):
    """Bigram heavy hitters: one exchange (the hash agg), top-k via
    TakeOrderedAndProject — never a global sort of all distinct grams."""
    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("text_ngram_topk").builder(spark, sf_dir)
    assert_no_python_udf_in_plan(df)
    assert count_exchanges(df) == 1
    txt = plan_text(df)
    assert "TakeOrderedAndProject" in txt
    assert "partial_count" in txt or "partial" in txt.lower()


def test_cdc_upsert_is_aggregate_not_window(spark, sf_dir):
    """Changelog compaction must be the max_by aggregate (map-side partial
    pre-compaction, one shuffle of ~distinct keys), not the window
    row_number formulation that shuffles every raw row."""
    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("cdc_upsert_latest").builder(spark, sf_dir)
    assert_no_python_udf_in_plan(df)
    assert count_exchanges(df) == 1
    txt = plan_text(df)
    assert "Window" not in txt
    assert "max_by" in txt


def test_embedding_dim_stats_partial_agg(spark, sf_dir):
    """posexplode then a 64-key hash agg: exactly one exchange, and the
    generator feeds a partial aggregate so the shuffle is EMB_DIM rows per
    task regardless of corpus size."""
    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("embedding_dim_stats").builder(spark, sf_dir)
    assert_no_python_udf_in_plan(df)
    assert count_exchanges(df) == 1
    assert "Generate" in plan_text(df)


def test_passage_dedup_digest_before_shuffle(spark, sf_dir):
    """Passage dedup: survivor pick is a min(struct) AGGREGATE (map-side
    partial collapse of repeats), never a window; the md5 digest must be
    computed below the exchange so the shuffle carries digests, not text."""
    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("dedup_passage_exact").builder(spark, sf_dir)
    assert_no_python_udf_in_plan(df)
    txt = plan_text(df)
    assert "Window" not in txt
    assert "partial_min" in txt or "partial" in txt.lower()
    assert count_exchanges(df) == 1


def test_tfidf_broadcasts_df_side(spark, sf_dir):
    """TF-IDF: the vocabulary-sized document-frequency relation and the
    1-row corpus count both broadcast — the (doc_id, term) stream must
    never hash-shuffle for the join."""
    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("text_tfidf_topk").builder(spark, sf_dir)
    assert_no_python_udf_in_plan(df)
    txt = plan_text(df)
    assert "BroadcastHashJoin" in txt
    assert "BroadcastNestedLoopJoin" in txt  # the 1-row cross join


def test_global_rownum_no_empty_partition_window(spark, sf_dir):
    """Two-phase row numbering: every data-sized window is partitioned by
    bucket; the only empty-PARTITION BY (single-task) window runs over the
    micro per-bucket counts relation, which sits above an aggregate."""
    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("global_rownum_two_phase").builder(spark, sf_dir)
    assert_no_python_udf_in_plan(df)
    txt = plan_text(df)
    assert "BroadcastHashJoin" in txt
    # the offsets branch aggregates before its single-partition window:
    # a naive global row_number plan has a SinglePartition exchange with
    # no aggregate under it.
    assert "partial_count" in txt or "partial" in txt.lower()


def test_partition_pruning_query_plan(spark, sf_dir):
    """The registered pruning query (not just the fixture test above) must
    carry its event_type IN-list in PartitionFilters at planning time."""
    from spark_jdbc_limit_spark.plans import plan_text

    import re

    df = get_query("source_parquet_partition_pruning").builder(spark, sf_dir)
    txt = plan_text(df)
    # the IN-list must sit INSIDE the PartitionFilters clause itself —
    # event_type elsewhere in the plan (a DataFilter, the aggregate)
    # would mean pruning was silently lost
    m = re.search(r"PartitionFilters: \[[^\]]*\]", txt)
    assert m, "scan node carries no PartitionFilters clause"
    assert "event_type" in m.group(0)


def test_gapfill_aggregates_before_densify(spark, sf_dir):
    """Gap-fill must aggregate the raw stream FIRST (one partial-agg
    exchange) and densify the micro relation after — the spine explode
    (Generate) sits above broadcast inputs, never against raw events."""
    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("events_gapfill_locf").builder(spark, sf_dir)
    assert_no_python_udf_in_plan(df)
    txt = plan_text(df)
    assert "Generate" in txt            # the sequence-explode spine
    assert "partial_count" in txt or "partial" in txt.lower()


def test_scd2_single_exchange_for_both_windows(spark, sf_dir):
    """lag (change suppression) and lead (validity stamping) share the
    (user_id → ts) clustering: the plan must contain exactly one exchange
    feeding both Window nodes — a second shuffle means the common
    partitioning was lost."""
    from spark_jdbc_limit_spark.plans import plan_text, count_exchanges

    df = get_query("scd2_user_type_history").builder(spark, sf_dir)
    assert_no_python_udf_in_plan(df)
    assert count_exchanges(df) == 1
    assert plan_text(df).count("Window") >= 2


def test_q6_all_predicates_pushed(spark, sf_dir):
    """Q6 is the scan-path benchmark: every range predicate must reach the
    parquet scan and the read schema must prune to the three referenced
    columns — an unpushed filter or a wide schema makes it a different
    query at 100 TB."""
    df = get_query("q6_forecast_revenue").builder(spark, sf_dir)
    assert_pushed_filters(df, "l_shipdate")
    assert_pushed_filters(df, "l_discount")
    assert_pushed_filters(df, "l_quantity")
    assert_read_schema_cols(
        df, "lineitem", {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}
    )
    assert_no_python_udf_in_plan(df)


def test_null_key_join_isolation_pattern(spark):
    """Null join keys never match, but a naive outer join still SHUFFLES
    them — and every null hashes to ONE reducer (the canonical silent
    skew at 100 TB). The isolation pattern splits null-key rows out
    before the join and unions them back with null payload; pinned here:
    identical results to the naive left join, on data where 40% of keys
    are null."""
    import pyspark.sql.functions as F

    left = spark.range(10_000).select(
        F.col("id"),
        F.when(F.col("id") % 5 < 2, None).otherwise(F.col("id") % 50).alias("k"),
    )
    dim = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("payload")
    )

    naive = left.join(dim, "k", "left").select("id", "k", "payload")

    with_key = left.filter(F.col("k").isNotNull()).join(dim, "k", "left")
    null_side = left.filter(F.col("k").isNull()).withColumn(
        "payload", F.lit(None).cast("long")
    )
    isolated = with_key.select("id", "k", "payload").unionByName(
        null_side.select("id", "k", "payload")
    )

    a = {tuple(r) for r in naive.collect()}
    b = {tuple(r) for r in isolated.collect()}
    assert a == b
    assert left.filter(F.col("k").isNull()).count() == 4_000


def test_q19_or_predicate_pushdown_inference(spark, sf_dir):
    """Q19's OR-of-ANDs can only fully resolve post-join, but Catalyst
    must still push the disjunction's per-table projections to each
    scan: the quantity bounds to lineitem, the brand/size disjunction to
    part — and the join must broadcast the dim, never a cartesian."""
    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("q19_discounted_revenue").builder(spark, sf_dir)
    assert_pushed_filters(df, "l_quantity")
    assert_pushed_filters(df, "p_brand")
    plan = plan_text(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert_no_python_udf_in_plan(df)


def test_q5_dim_chain_broadcast_no_cartesian(spark, sf_dir):
    """Q5's region->nation->supplier chain must collapse via broadcasts
    with the date filter pushed to the orders scan; six relations, zero
    cartesian products."""
    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("q5_local_supplier_volume").builder(spark, sf_dir)
    assert_pushed_filters(df, "o_orderdate")
    assert_pushed_filters(df, "r_name")
    plan = plan_text(df)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
    assert_no_python_udf_in_plan(df)


def test_knn_join_shuffles_grid_not_pair_space(spark, sf_dir):
    """The kNN join's only nested-loop join is the queries x block-grid
    replication (a broadcast of the KNN_BLOCKS-row relation); the
    query x candidate pair space must never appear as a join."""
    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("ann_knn_join").builder(spark, sf_dir)
    plan = plan_text(df)
    assert "CartesianProduct" not in plan
    # simple mode prints each operator once (formatted repeats them in
    # the detail section)
    simple = plan_text(df, mode="simple")
    assert simple.count("BroadcastNestedLoopJoin") == 1  # the tiny grid only
    assert "FlatMapCoGroupsInPandas" in plan or "CoGroup" in plan


def test_triangle_stats_no_cartesian_and_semi_closure(spark, sf_dir):
    """Triangle counting must close wedges with a LEFT SEMI join (count,
    not materialize) and contain no cartesian product; the only
    nested-loop joins are the one-row stat assemblies."""
    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("graph_triangle_stats").builder(spark, sf_dir)
    plan = plan_text(df)
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan
    assert_no_python_udf_in_plan(df)


def test_chunking_is_shuffle_free(spark, sf_dir):
    """RAG chunking must pipeline explode into the scan: zero exchanges."""
    df = get_query("doc_chunk_sliding").builder(spark, sf_dir)
    assert count_exchanges(df) == 0
    assert_no_python_udf_in_plan(df)


def test_aqe_skew_join_splits_hot_partition(spark):
    """The OTHER skew weapon (besides the manual salted join in this
    catalog): AQE's runtime skew-join split. With a 90%-hot key and
    test-scale thresholds, the finalized adaptive plan must mark the
    sort-merge join skew=true — i.e. the hot partition was split into
    advisory-sized reader slices instead of serializing one task."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    import pyspark.sql.functions as F

    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 300000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("p"),
        )
        right = spark.range(0, 50000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k")
        rows = j.collect()  # finalize the adaptive plan
        assert len(rows) > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE did not split the skewed partition"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_join_pruning(spark, sf_dir):
    """Runtime filtering — the third join weapon next to salting and AQE
    skew-split: with a selective build side, the optimizer injects a
    bloom filter from the filtered orders into the lineitem scan side
    (might_contain below the join), so most probe rows die before the
    shuffle. This is what replaces 'broadcast the dim' when neither side
    broadcasts at 100 TB."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        from spark_jdbc_limit_spark.sources.catalog import load_table
        import pyspark.sql.functions as F

        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_totalprice") > 450000
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        rows = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, "runtime bloom filter was not injected"
        # and the filtered join is still correct
        want = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_totalprice") > 450000)
            .join(li, F.col("o_orderkey") == li.l_orderkey)
            .count()
        )
        assert len(rows) == want
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_char_entropy_zero_shuffle(spark, sf_dir):
    """Per-document entropy is partition-local: the plan must be scan →
    one Arrow exchange (mapInPandas) with ZERO shuffles and only the two
    needed columns read — the explode-per-character formulation this
    replaced shuffled one row per character."""
    df = get_query("text_char_entropy").builder(spark, sf_dir)
    assert count_exchanges(df) == 0
    assert_read_schema_cols(df, "documents", {"doc_id", "text"})


def test_semdedup_single_shuffle(spark, sf_dir):
    """SemDeDup retention shuffles ONCE on the bucket key (the orderBy
    range exchange on the micro per-vector result is the only other
    exchange); the pairwise GEMM itself adds none."""
    df = get_query("dedup_semantic_semdedup").builder(spark, sf_dir)
    assert count_exchanges(df) <= 2


def test_kmeans_step_partials_shape(spark, sf_dir):
    """The Lloyd step's fact-sized stage (scan → Arrow partials) must run
    exactly ONCE: the partial relation is lazily checkpointed because
    three finishing branches consume it — without the cut the plan
    re-scans the corpus per branch (observed 3× before the fix). In the
    final plan the corpus scan therefore appears at most once (zero
    when the checkpoint shows as an ExistingRDD scan)."""
    df = get_query("cluster_kmeans_lloyd_step").builder(spark, sf_dir)
    from spark_jdbc_limit_spark.plans import plan_text

    txt = plan_text(df, "simple")
    assert txt.count("embeddings.parquet") <= 1, "corpus scanned per branch"
    assert txt.count("MapInPandas") <= 1, "Arrow partial pass duplicated"


def test_q21_single_fact_pass(spark, sf_dir):
    """The rewritten Q21 pre-aggregates lineitem to pair cardinality and
    must scan the fact table exactly ONCE (the textbook plan scanned it
    twice); supplier stays broadcast."""
    df = get_query("q21_sole_late_supplier").builder(spark, sf_dir)
    from spark_jdbc_limit_spark.plans import plan_text

    txt = plan_text(df, "simple")
    assert txt.count("lineitem.parquet") == 1, "lineitem scanned more than once"
    assert_broadcast_hash_join(df)


def test_dhash_near_dup_no_allpairs(spark, sf_dir):
    """The Hamming join must come from band-bucket equi-joins — the plan
    may contain no cartesian/nested-loop join (the oracle brute-forces;
    the engine must not)."""
    df = get_query("multimodal_dhash_near_dup").builder(spark, sf_dir)
    from spark_jdbc_limit_spark.plans import plan_text

    txt = plan_text(df, "simple")
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt


def test_zipf_fit_no_global_sort(spark, sf_dir):
    """The vocabulary head cut must be TakeOrderedAndProject (no global
    sort of the vocabulary relation), and the token count must be a
    partial-aggregated hash agg."""
    df = get_query("text_zipf_fit").builder(spark, sf_dir)
    from spark_jdbc_limit_spark.plans import plan_text

    txt = plan_text(df, "simple")
    assert "TakeOrderedAndProject" in txt


def test_pack_tokens_no_bare_source_window(spark, sf_dir):
    """Two-phase sequence packing: the data-sized running-sum window must
    be partitioned by (source, bucket) — a window on bare `source` sorts
    ~1/20th of the corpus in ONE task at 100 TB (round-6 verdict's one
    scale-killer). The only per-source-without-bucket window allowed is
    the offsets pass over the micro per-bucket totals relation, which
    must sit above an aggregate."""
    import re

    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("pack_tokens_sequential").builder(spark, sf_dir)
    assert_no_python_udf_in_plan(df)
    txt = plan_text(df, "extended")
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", txt)
    assert specs, "expected window specs in the packing plan"
    data_specs = [s for s in specs if "doc_id" in s]
    assert data_specs, "expected the doc-level running-sum window"
    for s in data_specs:
        assert "bucket" in s, f"doc-level window not bucketed: {s}"
    # offsets come from an aggregate below the micro window
    assert "partial" in txt.lower()
    assert "BroadcastHashJoin" in plan_text(df, "simple")
    # runtime: both branches must share ONE exchange of the tokenized data
    # (AQE ReuseExchange) so text is scanned and split exactly once
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed, "data exchange not reused across branches"


def test_pagerank_shuffle_variant_agrees_and_skips_broadcast(spark, sf_dir):
    """pagerank_frame(broadcast_ranks=False) is the web-graph posture
    (node relation too big for one executor): the rank relation must be
    shuffle-joined, never planned as an explicit broadcast, and the
    fixpoint it computes must agree with the broadcast variant exactly
    (same graph, same iteration count, 1e-6-rounded ranks)."""
    from spark_jdbc_limit_spark.operators.graph import pagerank_frame
    from spark_jdbc_limit_spark.plans import plan_text

    bc = pagerank_frame(spark, sf_dir, broadcast_ranks=True)
    sh = pagerank_frame(spark, sf_dir, broadcast_ranks=False)
    # At test SF Spark's size estimator auto-broadcasts the rank join in
    # BOTH variants, hiding the difference; disabling auto-broadcast
    # leaves only EXPLICIT hints standing — exactly the 100 TB situation
    # the shuffle variant exists for (rank relation above the threshold).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bc_joins = plan_text(
            pagerank_frame(spark, sf_dir, broadcast_ranks=True), "simple"
        ).count("BroadcastHashJoin")
        sh_txt = plan_text(
            pagerank_frame(spark, sf_dir, broadcast_ranks=False), "simple"
        )
        assert bc_joins > 0, "broadcast variant lost its explicit rank hint"
        assert "BroadcastHashJoin" not in sh_txt, (
            "shuffle variant still plans a broadcast join — the rank join "
            "would OOM on a non-broadcastable node relation"
        )
        assert "SortMergeJoin" in sh_txt or "ShuffledHashJoin" in sh_txt
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    got_bc = {r["node"]: (r["degree"], r["pagerank"]) for r in bc.collect()}
    got_sh = {r["node"]: (r["degree"], r["pagerank"]) for r in sh.collect()}
    assert got_bc == got_sh
    assert len(got_bc) > 0


def test_closeness_shuffle_variant_agrees_and_skips_broadcast(spark, sf_dir):
    """closeness_frame(broadcast_dist=False) is the web-graph posture
    (k·|V| distance relation too big for one executor), mirroring
    pagerank_frame's broadcast_ranks switch (round-10 verdict #4): the
    distance relation must be shuffle-joined — no BroadcastHashJoin
    anywhere once auto-broadcast is disabled — and the result must agree
    with the broadcast variant exactly (integer distances; one float
    division rounded 1e-6)."""
    from spark_jdbc_limit_spark.operators.graph import closeness_frame
    from spark_jdbc_limit_spark.plans import plan_text

    from spark_jdbc_limit_spark.operators.graph import _closeness_step

    bc = closeness_frame(spark, sf_dir, broadcast_dist=True)
    sh = closeness_frame(spark, sf_dir, broadcast_dist=False)
    # the loop's lazy checkpoints hide the per-step join from the final
    # plan, so pin the strategy on the EXACT step function the loop runs
    bw = spark.createDataFrame(
        [(1, 2, 1), (2, 1, 1), (1, 1, 0), (2, 2, 0)], "u long, v long, w int"
    )
    d0 = spark.createDataFrame([(1, 1, 0)], "src long, node long, d int")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bc_joins = plan_text(
            _closeness_step(bw, d0, broadcast_dist=True), "simple"
        ).count("BroadcastHashJoin")
        sh_txt = plan_text(_closeness_step(bw, d0, broadcast_dist=False), "simple")
        assert bc_joins > 0, "broadcast variant lost its explicit dist hint"
        assert "BroadcastHashJoin" not in sh_txt, (
            "shuffle variant still plans a broadcast hash join — the "
            "distance join would OOM on a non-broadcastable relation"
        )
        assert "SortMergeJoin" in sh_txt or "ShuffledHashJoin" in sh_txt
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    key = lambda r: (r["src"], r["n_reached"], r["sum_dist"], r["closeness"], r["n_unsettled"])  # noqa: E731
    got_bc = sorted(key(r) for r in bc.collect())
    got_sh = sorted(key(r) for r in sh.collect())
    assert got_bc == got_sh
    assert len(got_bc) > 0


def test_label_propagation_argmax_not_window(spark, sf_dir):
    """LPA's per-node label choice must be the max(struct) AGGREGATE —
    a ranked window over neighbor-label counts would sort a celebrity
    node's whole neighborhood in one task. Also: communities must be a
    coarsening (every node keeps a label, count preserved) and at least
    one multi-node community must form on the shipped graph."""
    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("graph_label_propagation").builder(spark, sf_dir)
    assert_no_python_udf_in_plan(df)
    txt = plan_text(df, "extended")
    # the only row_number/rank windows allowed are none — label argmax is
    # an aggregate; the single window is the final community-size count
    assert "row_number" not in txt.lower()
    rows = df.collect()
    assert len(rows) > 0
    assert len({r["node"] for r in rows}) == len(rows)
    sizes = {r["community"]: r["community_size"] for r in rows}
    assert sum(sizes.values()) == len(rows)
    assert max(sizes.values()) >= 2, "no community formed — LPA degenerated"


def test_bloom_prefilter_two_layer_plan_and_equivalence(spark, sf_dir):
    """join_bloom_prefilter must show BOTH layers in the physical plan —
    a broadcast left-semi on the bucket bitmap (the runtime filter) and
    a sort-merge left-semi on the key (the exact join) — and the
    pre-prune must be a pure optimization: result identical to the
    exact semi join alone."""
    import re

    from pyspark.sql import functions as F

    from spark_jdbc_limit_spark.operators.joins import BLOOM_MIN_TOTAL
    from spark_jdbc_limit_spark.plans import plan_text
    from spark_jdbc_limit_spark.sources.catalog import load_table

    df = get_query("join_bloom_prefilter").builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"BroadcastHashJoin .*LeftSemi", plan), plan
    assert re.search(r"SortMergeJoin .*LeftSemi", plan), plan
    # scan stays pruned: only the columns the query touches
    assert_read_schema_cols(
        df,
        "lineitem",
        {"l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice", "l_discount"},
    )

    li = load_table(spark, sf_dir, "lineitem")
    keys = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderstatus") == "F")
            & (F.col("o_totalprice") > BLOOM_MIN_TOTAL)
        )
        .select("o_orderkey")
    )
    exact = (
        li.join(keys, li.l_orderkey == keys.o_orderkey, "left_semi")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
    )
    got = {r["l_returnflag"]: (r["n_items"], r["sum_qty"]) for r in df.collect()}
    want = {r["l_returnflag"]: (r["n_items"], r["sum_qty"]) for r in exact.collect()}
    assert got == want


def test_stratified_sample_exact_k_and_prune_layer(spark, sf_dir):
    """sample_stratified_exact: every stratum yields min(K, stratum size)
    rows, ranks are 1..k dense, and the histogram-prune layer is present
    (a broadcast join of the per-source cutoffs) so the exact sort never
    sees the whole corpus."""
    from collections import Counter

    from spark_jdbc_limit_spark.operators.pipeline import STRAT_K
    from spark_jdbc_limit_spark.sources.catalog import load_table

    df = get_query("sample_stratified_exact").builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan

    rows = df.collect()
    sizes = {
        r["source"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    per_src = Counter(r["source"] for r in rows)
    assert set(per_src) == set(sizes)
    for src, n in sizes.items():
        assert per_src[src] == min(STRAT_K, n), (src, n, per_src[src])
    for src in per_src:
        ranks = sorted(r["sample_rank"] for r in rows if r["source"] == src)
        assert ranks == list(range(1, per_src[src] + 1))


def test_connected_components_settled_and_match_union_find(spark, sf_dir):
    """graph_connected_components at the shipped SF: the in-query
    settlement audit reads 0 everywhere (CC_ITERS covers the diameter)
    and component count/sizes match a driver-side union-find over the
    same edge list."""
    from spark_jdbc_limit_spark.operators.graph import _supplier_edges

    df = get_query("graph_connected_components").builder(spark, sf_dir)
    rows = df.collect()
    assert rows, "edge graph unexpectedly empty"
    assert all(r["n_unsettled"] == 0 for r in rows)

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for e in _supplier_edges(spark, sf_dir).collect():
        a, b = find(e["s1"]), find(e["s2"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    truth: dict[int, int] = {}
    for n in list(parent):
        r = find(n)
        truth[r] = truth.get(r, 0) + 1
    assert sorted(truth.values()) == sorted(r["n_nodes"] for r in rows)
    # component label is the smallest member id — union-find roots agree
    assert sorted(truth) == sorted(r["component"] for r in rows)


def test_range_sort_audit_margins_and_plan(spark, sf_dir):
    """sort_range_equidepth_audit's cross-engine determinism rides on
    percentile == quantile_cont: replicate the cutoffs in numpy on every
    shipped SF and assert no price sits within 1e-9 of a cutoff unless
    it IS the cutoff (integral-index percentiles land exactly on data
    values — engine-independent). Plan: the cutoff relation must arrive
    broadcast, and every bucket must be monotone and non-empty."""
    import numpy as np

    from spark_jdbc_limit_spark.operators.advanced import (
        _RANGE_FRACS,
        RANGE_SORT_BUCKETS,
    )
    from spark_jdbc_limit_spark.sources.catalog import table_path

    df = get_query("sort_range_equidepth_audit").builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan, plan
    rows = df.collect()
    assert len(rows) == RANGE_SORT_BUCKETS
    assert all(r["monotone_ok"] == 1 for r in rows)
    assert all(r["n_rows"] > 0 for r in rows)

    import pandas as pd

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        prices = pd.read_parquet(table_path(sf, "lineitem"))[
            "l_extendedprice"
        ].to_numpy()
        cuts = np.quantile(prices, _RANGE_FRACS, method="linear")
        for c in cuts:
            d = np.abs(prices - c)
            near = d[(d > 0) & (d < 1e-9)]
            assert near.size == 0, (sf, c, near[:5])


def test_winnowing_python_pass_runs_once(spark, sf_dir):
    """dedup_winnowing_fingerprints feeds its fingerprint frame to two
    branches (frequency agg + fan-back join). The lineage cut must hold:
    the executed plan reads the checkpointed RDD in both branches and
    contains NO MapInPandas node of its own — i.e. the per-doc Python
    winnowing pass executes once, not once per branch."""
    df = get_query("dedup_winnowing_fingerprints").builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan, plan
    assert "ExistingRDD" in plan, plan


def test_dynamic_partition_pruning_fires(spark, sf_dir):
    """The DPP entry must actually prune at runtime: the fact scan's
    PartitionFilters carries a dynamicpruningexpression fed from the
    broadcast dim, so only the dim-selected partition directories are
    read."""
    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("source_parquet_dynamic_partition_pruning").builder(spark, sf_dir)
    txt = plan_text(df, "formatted")
    assert "dynamicpruningexpression" in txt, "DPP did not fire"
    assert "PartitionFilters" in txt


def test_sql_udf_inlines_into_codegen(spark, sf_dir):
    """The point of a SQL-defined function vs a Python UDF: Catalyst
    INLINES the body. The plan must contain no Python evaluation node and
    the inlined decimal arithmetic must sit inside whole-stage codegen;
    the aggregate partial-aggregates map-side like any built-in."""
    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("scalar_sql_udf").builder(spark, sf_dir)
    assert_no_python_udf_in_plan(df)
    txt = plan_text(df, "simple")
    # the function NAME is gone from the physical plan; its body appears
    # as plain decimal arithmetic feeding the partial aggregate
    assert "charged_amount" not in txt
    assert "(1 - disc" in txt and "(1 + tax" in txt
    assert "partial_sum" in txt


def test_cms_estimate_join_broadcasts_cells(spark, sf_dir):
    """The CMS cell table is <= d*w rows by construction, so the
    estimate lookup must be a broadcast hash join — never a shuffle of
    the (dimension-sized) key relation against a 1024-row sketch."""
    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("agg_count_min_frequency_audit").builder(spark, sf_dir)
    assert_no_python_udf_in_plan(df)
    assert "BroadcastHashJoin" in plan_text(df, "simple")


def test_zorder_audit_fact_windows_are_bucketed(spark, sf_dir):
    """The round-8b restructure: every fact-relation-sized rank window in
    the z-order audit must be partitioned by the two-phase bucket — a
    bare ORDER BY window funnels 600k rows (or 100 TB) through one task
    per layout. The only unpartitioned windows allowed are the offset
    passes over the micro per-bucket count relations (they sit above an
    aggregate)."""
    import re

    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("sort_zorder_skipping_audit").builder(spark, sf_dir)
    txt = plan_text(df, "extended")
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", txt)
    assert specs, "expected window specs in the z-order audit plan"
    fact_specs = [s for s in specs if "l_orderkey" in s or "l_linenumber" in s]
    assert fact_specs, "expected the fact-level rank windows"
    for s in fact_specs:
        assert "bkt" in s, f"fact-level rank window not bucketed: {s}"


def test_padding_audit_fact_windows_are_bucketed(spark, sf_dir):
    """Same pin for the batch-padding audit's two strategy ranks."""
    import re

    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("pipeline_batch_padding_audit").builder(spark, sf_dir)
    txt = plan_text(df, "extended")
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", txt)
    fact_specs = [s for s in specs if "doc_id" in s]
    assert fact_specs, "expected the doc-level rank windows"
    for s in fact_specs:
        assert "bkt" in s, f"doc-level rank window not bucketed: {s}"


def test_nested_pruning_drops_fat_struct_member(spark, sf_dir):
    """The nested round-trip's scan must read ONLY the projected struct
    subfields — the bulky 'bio' member (50x name repeat) must be pruned
    from the parquet ReadSchema, or the struct layout silently drags its
    fattest column chunk through every scan."""
    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("source_parquet_nested_pruning").builder(spark, sf_dir)
    txt = plan_text(df, "formatted")
    scan = [ln for ln in txt.splitlines() if "ReadSchema" in ln]
    assert scan, "expected a parquet scan with ReadSchema"
    rs = " ".join(scan)
    assert "segment" in rs and "balance" in rs
    assert "bio" not in rs, f"fat struct member not pruned: {rs}"
    assert "name" not in rs.replace("bio", "")


def test_analyze_statistics_feed_cbo_estimates(spark, sf_dir):
    """The statistics pipeline Catalyst's cost-based optimizer runs on:
    before ANALYZE, a managed table's plan estimate is a file-size guess
    with NO row count; after ANALYZE TABLE ... COMPUTE STATISTICS (with
    CBO enabled) the optimized plan carries the EXACT row count and the
    logical (uncompressed) size — the inputs join reordering and
    broadcast selection consume at scale. Pinning the flip proves stats
    collection actually reaches the planner, not just the catalog."""
    from spark_jdbc_limit_spark.sources.catalog import load_table

    prev = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        spark.sql("DROP TABLE IF EXISTS stats_demo_t")
        load_table(spark, sf_dir, "orders").write.mode("overwrite").saveAsTable(
            "stats_demo_t"
        )

        def plan_stats():
            st = spark.table("stats_demo_t")._jdf.queryExecution().optimizedPlan().stats()
            rc = st.rowCount()
            return int(st.sizeInBytes()), (
                int(str(rc.get())) if rc.isDefined() else None
            )

        size_pre, rows_pre = plan_stats()
        assert rows_pre is None, "row count must be unknown before ANALYZE"
        spark.sql("ANALYZE TABLE stats_demo_t COMPUTE STATISTICS")
        size_post, rows_post = plan_stats()
        actual = spark.table("stats_demo_t").count()
        assert rows_post == actual, f"ANALYZE row count {rows_post} != {actual}"
        assert size_post != size_pre, "estimate still the file-size guess after ANALYZE"
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prev)
        spark.sql("DROP TABLE IF EXISTS stats_demo_t")


def test_quantified_subquery_decomposition_shape(spark, sf_dir):
    """The EXISTS/NOT EXISTS/ANY/ALL decomposition must plan as broadcast
    semi/anti hash joins with the priority/status predicates pushed into
    the orders scans and the quantifier sets reduced to broadcast
    one-row extrema — never a per-row subquery or a cartesian."""
    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("subquery_exists_any_all").builder(spark, sf_dir)
    txt = plan_text(df)
    assert "LeftSemi" in txt and "LeftAnti" in txt
    assert_pushed_filters(df, "1-URGENT")
    assert_no_python_udf_in_plan(df)
    assert "CartesianProduct" not in txt


def test_feature_matrix_single_agg_exchange(spark, sf_dir):
    """Conditional aggregation = ONE map-side-combined shuffle on
    user_id (plus the trailing presentation sort) — the reason it is
    the scale-stable alternative to pivot."""
    df = get_query("reshape_user_feature_matrix").builder(spark, sf_dir)
    assert count_exchanges(df) <= 2
    assert_no_python_udf_in_plan(df)


def test_bootstrap_stays_jvm_side_one_exchange(spark, sf_dir):
    """The Poisson draws are codegen'd hash arithmetic, not Python; the
    only corpus-sized exchange is the 32-group partial aggregate."""
    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("agg_poisson_bootstrap_ci").builder(spark, sf_dir)
    assert_no_python_udf_in_plan(df)
    txt = plan_text(df)
    assert "Generate" in txt  # the replicate explode
    # exchanges: agg shuffle + micro-relation window/sort/broadcast plumbing;
    # the corpus passes through exactly one of them
    assert count_exchanges(df) <= 5


def test_regexp_funcs_scan_shape(spark, sf_dir):
    df = get_query("scalar_regexp_funcs").builder(spark, sf_dir)
    assert_pushed_filters(df, "p_partkey")
    assert_read_schema_cols(df, "part", {"p_partkey", "p_name"})
    assert_no_python_udf_in_plan(df)


def test_link_prediction_broadcasts_degrees_no_cartesian(spark, sf_dir):
    from spark_jdbc_limit_spark.plans import plan_text

    df = get_query("graph_jaccard_link_prediction").builder(spark, sf_dir)
    txt = plan_text(df)
    assert "BroadcastHashJoin" in txt
    assert "LeftAnti" in txt  # existing edges drop via anti join
    assert "CartesianProduct" not in txt
    assert_no_python_udf_in_plan(df)


def test_correlation_matrix_single_fold(spark, sf_dir):
    """Nine power sums in one partial-aggregated pass: fact shuffle on
    custkey + the one-row global fold — nothing else."""
    df = get_query("agg_pearson_corr_matrix").builder(spark, sf_dir)
    assert_no_python_udf_in_plan(df)
    assert count_exchanges(df) <= 3


def test_lateral_topn_decorrelates(spark, sf_dir):
    """The correlated LATERAL subquery with ORDER BY + LIMIT must plan as
    a broadcast join + ranked window — NOT a per-outer-row nested loop
    (the decorrelation is the entry's entire scale story)."""
    df = get_query("subquery_lateral_correlated_topn").builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_dsir_frequency_tables_broadcast(spark, sf_dir):
    """DSIR's vocabulary relation must reach the token stream as a
    BROADCAST join (the 100 TB posture: vocabulary-bounded, never a
    fact-scale shuffle join), and the whole entry stays JVM-side."""
    df = get_query("pipeline_dsir_importance_weights").builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan
    assert_no_python_udf_in_plan(df)


def test_binary_quantization_audit_stays_jvm_side(spark, sf_dir):
    """The sign-packing and XOR+popcount pair loop are codegen
    expressions — no Python in the plan despite the 'quantization'
    label."""
    df = get_query("embedding_binary_quantization_recall_audit").builder(
        spark, sf_dir
    )
    assert_no_python_udf_in_plan(df)


def test_dynamic_gap_session_exchange_budget(spark, sf_dir):
    """Dynamic-gap sessionization costs the same plan class as the
    fixed-gap twin: shuffle on user, in-partition merge — two exchanges
    total (session agg + output sort)."""
    df = get_query("events_session_dynamic_gap").builder(spark, sf_dir)
    assert count_exchanges(df) <= 2
    assert_no_python_udf_in_plan(df)
