"""Round-7b additions: Pareto skyline, BM25 retrieval, prefix-filtered
Jaccard join. The oracle differentials (tests/test_oracle.py
RECENT_ADDITIONS) pin end-to-end values; these tests pin the CLAIMS the
operators are built on — the skyline membership condition, the
prefix-filtering completeness lemma, and the no-global-sort /
broadcast-join plan shapes."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from spark_jdbc_limit_spark.operators import get_query
from spark_jdbc_limit_spark.operators.dedup import (
    PREFIX_TAU_DEN,
    PREFIX_TAU_NUM,
)
from spark_jdbc_limit_spark.plans import count_exchanges, plan_text

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- skyline

points = st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 10)), min_size=1, max_size=60
)


def brute_skyline(pts: list[tuple[int, int]]) -> set[tuple[int, int]]:
    out = set()
    for p, s in pts:
        dominated = any(
            q <= p and t >= s and (q < p or t > s) for q, t in pts
        )
        if not dominated:
            out.add((p, s))
    return out


@given(points)
@settings(max_examples=300, deadline=None)
def test_skyline_membership_condition(pts):
    """The two-phase plan evaluates `size == gmax(price) AND size >
    smax(strictly cheaper)` — prove that condition ≡ non-dominance on
    arbitrary point sets (ties, duplicate pairs, single-point edge)."""
    expected = brute_skyline(pts)
    gmax: dict[int, int] = {}
    for p, s in pts:
        gmax[p] = max(gmax.get(p, -1), s)
    got = set()
    for p, s in pts:
        smax = max((t for q, t in pts if q < p), default=None)
        if s == gmax[p] and (smax is None or s > smax):
            got.add((p, s))
    assert got == expected


def test_skyline_plan_broadcasts_verdicts(spark):
    df = get_query("sort_pareto_skyline").builder(spark, SF)
    txt = plan_text(df)
    assert "BroadcastHashJoin" in txt
    assert "CartesianProduct" not in txt
    # corpus-sized work: one agg exchange on the distinct-price relation;
    # everything after runs on micro relations / broadcasts
    assert count_exchanges(df) <= 4


def test_skyline_mutual_nondominance(spark):
    rows = get_query("sort_pareto_skyline").builder(spark, SF).collect()
    pts = [(r.p_retailprice, r.p_size) for r in rows]
    for i, (p, s) in enumerate(pts):
        for j, (q, t) in enumerate(pts):
            if i != j:
                assert not (q <= p and t >= s and (q < p or t > s))


# ------------------------------------------------------- prefix filtering

sets = st.lists(
    st.sets(st.integers(0, 30), min_size=1, max_size=25), min_size=2, max_size=8
)


@given(sets)
@settings(max_examples=300, deadline=None)
def test_prefix_filter_completeness_lemma(universe_sets):
    """Any pair with Jaccard ≥ τ must share a prefix element when every
    set keeps its first `n - ceil(τ·n) + 1` elements under one global
    canonical order (frequency asc, value asc) — the lossless-recall
    guarantee dedup_jaccard_prefix_filter rests on."""
    tau = PREFIX_TAU_NUM / PREFIX_TAU_DEN
    freq: dict[int, int] = {}
    for s in universe_sets:
        for x in s:
            freq[x] = freq.get(x, 0) + 1
    order = lambda x: (freq[x], x)  # noqa: E731

    def prefix(s: set[int]) -> set[int]:
        n = len(s)
        p = n - (PREFIX_TAU_NUM * n + PREFIX_TAU_DEN - 1) // PREFIX_TAU_DEN + 1
        return set(sorted(s, key=order)[:p])

    for i, a in enumerate(universe_sets):
        for b in universe_sets[i + 1 :]:
            inter = len(a & b)
            jac = inter / (len(a) + len(b) - inter)
            if jac >= tau:
                assert prefix(a) & prefix(b), (a, b, jac)


def test_prefix_index_is_smaller_than_full_index(spark):
    """The candidate join reads the PREFIX inverted index, which must be a
    strict subset of the full shingle index (that is the whole point)."""
    from spark_jdbc_limit_spark.operators.dedup import shingle_hashes
    from spark_jdbc_limit_spark.sources.catalog import load_table

    d = load_table(spark, SF, "documents")
    full = shingle_hashes(d).count()
    # rebuild the operator's prefix relation by running the query builder's
    # candidate stage indirectly: prefix size == sum over docs of p(n)
    sizes = (
        shingle_hashes(d).groupBy("doc_id").count().collect()
    )
    p_total = sum(
        r["count"]
        - (PREFIX_TAU_NUM * r["count"] + PREFIX_TAU_DEN - 1) // PREFIX_TAU_DEN
        + 1
        for r in sizes
    )
    assert 0 < p_total < full
    # τ = 0.6 keeps ~(1-τ) of the index
    assert p_total <= math.ceil(full * (1 - PREFIX_TAU_NUM / PREFIX_TAU_DEN + 0.1))


def test_prefix_join_subset_of_exhaustive(spark):
    """BOTH arms of the round-10 cost-based path switch must equal the
    independent exhaustive query's thresholded pairs: the forced PREFIX
    arm (the lossless-filter claim — no longer exercised by the auto
    entry on this short-posting-list corpus, where auto correctly picks
    exhaustive) and the forced EXHAUSTIVE arm, plus the auto choice."""
    from spark_jdbc_limit_spark.operators.dedup import dedup_jaccard_prefix_filter

    exhaustive = {
        (r.d1, r.d2, r.jaccard)
        for r in get_query("dedup_ngram_jaccard_exhaustive").builder(spark, SF).collect()
    }
    tau = PREFIX_TAU_NUM / PREFIX_TAU_DEN
    expected = {(d1, d2) for d1, d2, j in exhaustive if j >= tau}
    for path in ("auto", "prefix", "exhaustive"):
        got = {
            (r.d1, r.d2)
            for r in dedup_jaccard_prefix_filter(spark, SF, path=path).collect()
        }
        assert got == expected, f"path={path} diverged from exhaustive truth"


# ------------------------------------------------------------------ bm25

def test_bm25_plan_no_global_sort_no_cartesian(spark):
    df = get_query("text_bm25_retrieval").builder(spark, SF)
    txt = plan_text(df)
    assert "TakeOrderedAndProject" in txt  # top-k, never a global sort
    assert "CartesianProduct" not in txt  # stats/dfreq ride broadcasts

def test_bm25_scores_positive_and_rare_term_dominates(spark):
    rows = get_query("text_bm25_retrieval").builder(spark, SF).collect()
    assert rows, "query terms must match the corpus"
    assert all(r.score > 0 and r.n_terms_matched >= 1 for r in rows)
    # ranking is deterministic: strictly descending (score, -doc_id) order
    keys = [(-r.score, r.doc_id) for r in rows]
    assert keys == sorted(keys)


# ------------------------------------------------- bigram perplexity

def test_bigram_perplexity_rounding_margins():
    """cross_entropy / perplexity are float averages rounded to 4 places;
    Spark's partial-agg addition order differs from DuckDB's scan order,
    so the values are engine-stable iff no document sits within
    accumulation error (~1e-12 relative) of a half-up rounding boundary.
    Replicate the model in pure numpy on every shipped SF and assert the
    boundary distance (the test_pq_audit_margins discipline)."""
    import collections

    import numpy as np
    import pyarrow.parquet as pq

    from spark_jdbc_limit_spark.operators.text import BIGRAM_SMOOTH_K

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        t = pq.read_table(
            f"/root/testdata/{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        texts = t.column("text").to_pylist()
        big: collections.Counter = collections.Counter()
        ctx: collections.Counter = collections.Counter()
        vocab: set[str] = set()
        docs = []
        for txt in texts:
            ws = txt.split(" ")
            vocab.update(ws)
            bgs = list(zip(ws, ws[1:]))
            docs.append(bgs)
            for b in bgs:
                big[b] += 1
                ctx[b[0]] += 1
        v = float(len(vocab))
        for bgs in docs:
            if not bgs:
                continue
            lps = [
                np.log((big[b] + BIGRAM_SMOOTH_K) / (ctx[b[0]] + BIGRAM_SMOOTH_K * v))
                for b in bgs
            ]
            for val in (-np.mean(lps), np.exp(-np.mean(lps))):
                frac = (val * 1e4 + 0.5) % 1.0
                dist = min(frac, 1.0 - frac)
                assert dist > 1e-7, (sf, val, dist)


# ---------------------------------------------- null-aware anti join

def test_not_in_plans_null_aware_anti_join(spark):
    """Both NOT IN arms must compile to Spark's null-aware anti join —
    BroadcastHashJoin ... LeftAnti with the isNullAware flag — not a
    plain anti join (which would silently change the NULL semantics
    the query exists to pin)."""
    df = get_query("join_anti_null_aware").builder(spark, SF)
    txt = df._jdf.queryExecution().executedPlan().toString()
    naaj = [
        ln for ln in txt.splitlines()
        if "LeftAnti" in ln and ln.rstrip().endswith("true")
    ]
    assert len(naaj) == 2, txt


# ------------------------------------------------- cogrouped order fill

def test_cogroup_kernel_empty_right_group():
    """Orders with zero lineitems arrive as an EMPTY right frame — the
    kernel must emit n_lines=0 / fill_ratio=0, not crash (the shipped
    corpus has no such order, so the edge is pinned here)."""
    import pandas as pd

    from spark_jdbc_limit_spark.operators.udfs import _order_fill

    left = pd.DataFrame({"o_orderkey": [7], "o_totalprice": [123.45]})
    right = pd.DataFrame({"l_orderkey": pd.array([], dtype="int64"),
                          "rev": pd.array([], dtype="float64")})
    out = _order_fill(left, right)
    assert out.to_dict("records") == [
        {"o_orderkey": 7, "n_lines": 0, "fill_ratio": 0.0}
    ]


def test_cogroup_kernel_empty_left_group():
    """A lineitem key with no order row (dangling FK) must vanish, like
    the oracle's LEFT JOIN from orders — not raise on iloc[0]."""
    import pandas as pd

    from spark_jdbc_limit_spark.operators.udfs import _order_fill

    left = pd.DataFrame({"o_orderkey": pd.array([], dtype="int64"),
                         "o_totalprice": pd.array([], dtype="float64")})
    right = pd.DataFrame({"l_orderkey": [9], "rev": [10.0]})
    assert len(_order_fill(left, right)) == 0


def test_bm25_rounding_margins():
    """BM25 scores use LN (ulp-accurate, not correctly rounded — Spark's
    Math.log vs DuckDB's libm can differ in the last bit) and are
    half-up rounded to 4 places before ranking; the differential is
    stable iff no document's score sits within accumulation error of a
    rounding boundary on any shipped SF. Same discipline as
    test_bigram_perplexity_rounding_margins."""
    import collections

    import numpy as np
    import pyarrow.parquet as pq

    from spark_jdbc_limit_spark.operators.text import BM25_B, BM25_K1, BM25_QUERY

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        t = pq.read_table(
            f"/root/testdata/{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        texts = t.column("text").to_pylist()
        n_docs = float(len(texts))
        dls = [float(len(txt.split(" "))) for txt in texts]
        avgdl = sum(dls) / n_docs
        tfs: list[dict[str, int]] = []
        df: collections.Counter = collections.Counter()
        for txt in texts:
            c = collections.Counter(w for w in txt.split(" ") if w in BM25_QUERY)
            tfs.append(c)
            df.update(c.keys())
        for dl, c in zip(dls, tfs):
            if not c:
                continue
            score = 0.0
            for term in BM25_QUERY:  # fixed fold order, like both engines
                tf = c.get(term)
                if tf is None:
                    continue
                idf = np.log(1 + (n_docs - df[term] + 0.5) / (df[term] + 0.5))
                score += (idf * (tf * (BM25_K1 + 1.0))) / (
                    tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl)
                )
            frac = (score * 1e4 + 0.5) % 1.0
            dist = min(frac, 1.0 - frac)
            assert dist > 1e-7, (sf, score, dist)


# --------------------------------------------------- bitmap distinct

def test_bitmap_distinct_plan_no_expand(spark):
    """The bitmap formulation must not plan an Expand (the row-multiplying
    shape COUNT(DISTINCT) combinations produce) and must aggregate
    bitmaps, proving the distinct-ing happens map-side in fixed-size
    buckets."""
    df = get_query("agg_bitmap_distinct").builder(spark, SF)
    txt = plan_text(df)
    assert "Expand" not in txt
    assert "bitmap_construct_agg" in txt
    assert "partial_bitmap_construct_agg" in txt.lower() or "partial" in txt.lower()


# ------------------------------------------------------ hybrid RRF fusion

def test_rrf_score_lattice_clear_of_rounding_boundaries():
    """Fused scores live on the finite lattice {1/(60+r) : r∈1..50} ∪ {0}
    summed pairwise; every lattice value must sit clear of a half-up
    1e-6 rounding boundary so both engines round identically."""
    from spark_jdbc_limit_spark.operators.similarity import RRF_ARM_DEPTH, RRF_K

    vals = [0.0] + [1.0 / (RRF_K + r) for r in range(1, RRF_ARM_DEPTH + 1)]
    for a in vals:
        for b in vals:
            s = a + b
            frac = (s * 1e6 + 0.5) % 1.0
            dist = min(frac, 1.0 - frac)
            assert dist > 1e-9, (a, b, s, dist)


def test_rrf_fusion_rank_semantics(spark):
    """Fused output invariants: every row was retrieved by at least one
    arm; ranks are within arm depth; RRF score reconstructs exactly
    from the reported ranks."""
    from spark_jdbc_limit_spark.operators.similarity import RRF_ARM_DEPTH, RRF_K

    rows = get_query("ann_hybrid_rrf_fusion").builder(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.lex_rank or r.sem_rank
        assert 0 <= r.lex_rank <= RRF_ARM_DEPTH
        assert 0 <= r.sem_rank <= RRF_ARM_DEPTH
        expect = (1.0 / (RRF_K + r.lex_rank) if r.lex_rank else 0.0) + (
            1.0 / (RRF_K + r.sem_rank) if r.sem_rank else 0.0
        )
        import math

        assert math.isclose(r.rrf_score, round(expect, 6), abs_tol=1e-6)
