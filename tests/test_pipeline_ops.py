"""Property tests for the training-data-pipeline operators (beyond oracle
parity): sample rate and determinism, quota enforcement, packing budget
invariants, and the dedup survivor policy."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from spark_jdbc_limit_spark.operators import get_query
from spark_jdbc_limit_spark.operators.pipeline import (
    PRIORITY_TIERS,
    QUOTA_PER_SOURCE,
    SAMPLE_PCT,
    TOKEN_BUDGET,
)
from spark_jdbc_limit_spark.sources.catalog import load_table


def test_deterministic_sample_rate_and_stability(spark, sf_correct):
    d = load_table(spark, sf_correct, "documents")
    total = d.count()
    s1 = {r.doc_id for r in get_query("sample_deterministic_hash").builder(spark, sf_correct).collect()}
    s2 = {r.doc_id for r in get_query("sample_deterministic_hash").builder(spark, sf_correct).collect()}
    assert s1 == s2, "hash sampling must be exactly reproducible"
    rate = len(s1) / total
    assert 0.5 * SAMPLE_PCT / 100 <= rate <= 2.0 * SAMPLE_PCT / 100, (
        f"sample rate {rate:.3f} far from nominal {SAMPLE_PCT}%"
    )


def test_quota_sample_caps_every_source(spark, sf_correct):
    rows = get_query("sample_quota_per_source").builder(spark, sf_correct).collect()
    per_source = defaultdict(int)
    for r in rows:
        per_source[r.source] += 1
    assert per_source, "quota sample returned nothing"
    assert max(per_source.values()) <= QUOTA_PER_SOURCE
    # a source with fewer docs than the quota keeps everything
    d = load_table(spark, sf_correct, "documents")
    counts = {r["source"]: r["n"] for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, n in counts.items():
        assert per_source[src] == min(n, QUOTA_PER_SOURCE)


def test_packing_preserves_stream_and_respects_budget(spark, sf_correct):
    rows = get_query("pack_tokens_sequential").builder(spark, sf_correct).collect()
    by_source = defaultdict(list)
    for r in rows:
        by_source[r.source].append(r)
    for src, docs in by_source.items():
        docs.sort(key=lambda r: r.doc_id)
        # bin ids are non-decreasing along the stream and start at 0
        bins = [r.bin_id for r in docs]
        assert bins[0] == 0
        assert all(a <= b for a, b in zip(bins, bins[1:])), src
        # a bin only overflows the budget via its LAST doc (concat-and-split
        # semantics: a doc starts in the bin where the stream cursor sits)
        fill = defaultdict(int)
        for r in docs:
            start = fill[r.bin_id]
            assert start < TOKEN_BUDGET, f"{src}: doc starts past budget"
            fill[r.bin_id] = start + r.n_tokens


def test_survivor_policy_prefers_high_priority_sources(spark, sf_correct):
    d = load_table(spark, sf_correct, "documents")
    docs = {r.doc_id: r.source for r in d.select("doc_id", "source").collect()}
    groups = defaultdict(list)
    for r in d.select("doc_id", F.md5(F.col("text").cast("binary")).alias("h")).collect():
        groups[r.h].append(r.doc_id)
    keepers = {
        r.content_hash: r.keeper_doc_id
        for r in get_query("dedup_survivor_policy").builder(spark, sf_correct).collect()
    }
    assert set(keepers) == set(groups)

    def prio(doc_id):
        return (int(docs[doc_id][3:]) % PRIORITY_TIERS, doc_id)

    for h, members in groups.items():
        assert keepers[h] == min(members, key=prio)
