"""Property tests for the round-6 numeric operators: the distributed
formulation must agree with an obvious single-process reference over
adversarial random inputs — including partition splits and series
lengths the shipped corpus never exercises.

- PCA one-pass moment accumulation: summing (n, Σx, Σxxᵀ) partials over
  ANY partitioning of the rows must reproduce the direct covariance.
- Bounded-lag EWMA: the lag-window formulation must equal the explicit
  per-series Python loop for every series length (0 < L < LAGS and
  L ≥ LAGS both matter: the renormalization over existing lags is the
  part a naive implementation gets wrong at series heads).
"""

from __future__ import annotations

import numpy as np

from spark_jdbc_limit_spark.operators.windowed_events import EWMA_LAGS


def test_pca_moment_partials_match_direct_covariance():
    """Covariance from merged per-partition (n, Σx, Σxxᵀ) partials must
    equal numpy's direct biased covariance for ANY split of the rows —
    the algebraic fact the one-pass distributed phase relies on."""
    rng = np.random.default_rng(7)
    for trial in range(20):
        n = rng.integers(2, 200)
        d = rng.integers(1, 12)
        x = rng.normal(size=(n, d)) * rng.uniform(0.1, 10)
        # random partitioning into 1..6 chunks (some possibly empty)
        cuts = np.sort(rng.integers(0, n + 1, size=rng.integers(0, 5)))
        chunks = np.split(x, cuts)
        tot_n, tot_s, tot_ss = 0, np.zeros(d), np.zeros((d, d))
        for c in chunks:
            if not len(c):
                continue  # empty partitions contribute nothing
            tot_n += len(c)
            tot_s += c.sum(axis=0)
            tot_ss += c.T @ c
        mu = tot_s / tot_n
        cov = tot_ss / tot_n - np.outer(mu, mu)
        direct = np.cov(x.T, bias=True).reshape(d, d)
        assert np.allclose(cov, direct, atol=1e-9), f"trial {trial}"


def _py_ewma(series: list[int]) -> list[float]:
    out = []
    for t in range(len(series)):
        num = den = 0.0
        for j in range(EWMA_LAGS):
            if t - j < 0:
                break
            w = 0.5**j
            num += w * series[t - j]
            den += w
        out.append(num / den)
    return out


def test_ewma_window_formulation_matches_python_loop(spark):
    """events_ewma_hourly's lag-tap expression vs the obvious sequential
    loop, over series of every length around the horizon — verifies the
    head-of-series renormalization (missing lags must shrink the
    DENOMINATOR, not contribute zeros)."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from functools import reduce

    rng = np.random.default_rng(11)
    rows = []
    series = {}
    for sid in range(12):
        length = [0, 1, 2, EWMA_LAGS - 1, EWMA_LAGS, EWMA_LAGS + 5, 40][
            sid % 7
        ]
        vals = [int(v) for v in rng.integers(0, 1000, size=length)]
        series[str(sid)] = vals
        rows += [(str(sid), t, v) for t, v in enumerate(vals)]
    if not rows:
        return
    df = spark.createDataFrame(rows, "sid string, t int, n_events long")
    w = Window.partitionBy("sid").orderBy("t")
    lags = [F.lag("n_events", j).over(w) for j in range(EWMA_LAGS)]
    num = reduce(
        lambda a, b: a + b,
        [
            F.when(lags[j].isNotNull(), F.lit(0.5**j) * lags[j]).otherwise(0.0)
            for j in range(EWMA_LAGS)
        ],
    )
    den = reduce(
        lambda a, b: a + b,
        [
            F.when(lags[j].isNotNull(), F.lit(0.5**j)).otherwise(0.0)
            for j in range(EWMA_LAGS)
        ],
    )
    got = df.select("sid", "t", (num / den).alias("e")).toPandas()
    for sid, vals in series.items():
        want = _py_ewma(vals)
        g = got[got.sid == sid].sort_values("t")["e"].tolist()
        assert np.allclose(g, want, atol=1e-12), f"series {sid}"


def test_cms_pure_python_model_never_underestimates_and_merges():
    """The count-min properties the relational formulation in
    operators/sketches.py relies on, checked against a pure-Python model
    over adversarial random multisets (hypothesis): (1) min-over-rows
    point estimates never undershoot the true count for ANY key;
    (2) cells built from per-key totals equal cells built by streaming
    single increments — the fold the Spark plan performs when it
    aggregates counts per key BEFORE hashing into cells; (3) merging two
    halves' cell tables equals the cell table of the union — the
    mergeability the streaming twin exercises."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spark_jdbc_limit_spark.operators.sketches import (
        CMS_A,
        CMS_B,
        CMS_D,
        CMS_P,
        CMS_W,
    )

    def h(i, x):
        return ((x % CMS_P) * CMS_A[i] + CMS_B[i]) % CMS_P % CMS_W

    def cells_streaming(keys):
        c = Counter()
        for x in keys:
            for i in range(CMS_D):
                c[(i, h(i, x))] += 1
        return c

    def cells_from_totals(keys):
        c = Counter()
        for x, n in Counter(keys).items():
            for i in range(CMS_D):
                c[(i, h(i, x))] += n
        return c

    @settings(max_examples=200, deadline=None)
    @given(
        keys=st.lists(st.integers(min_value=0, max_value=2**40), max_size=300),
        split=st.integers(min_value=0, max_value=300),
    )
    def check(keys, split):
        cells = cells_streaming(keys)
        assert cells == cells_from_totals(keys)  # per-key fold is exact
        truth = Counter(keys)
        for x, n in truth.items():
            est = min(cells[(i, h(i, x))] for i in range(CMS_D))
            assert est >= n  # never underestimates
        lo, hi = keys[:split], keys[split:]
        merged = cells_streaming(lo) + cells_streaming(hi)
        assert merged == cells  # cell tables merge by addition

    check()


def test_table_fingerprint_is_order_and_partition_invariant(spark):
    """The fingerprint's whole value is order independence: any
    permutation AND any repartitioning of the same rows must produce
    identical (n_rows, xor_fp, sum_fp) channels, while any single-row
    edit must move at least one channel."""
    import pandas as pd

    from pyspark.sql import functions as F

    from spark_jdbc_limit_spark.operators.aggregates import (
        _FP_COLS,
        _FP_SUM_MOD,
        _fp_rowhash_sql,
    )

    rows = [
        (i, f"Customer#{i:09d}", i % 25, ["AUTOMOBILE", "BUILDING", "MACHINERY"][i % 3])
        for i in range(997)
    ]
    schema = "c_custkey long, c_name string, c_nationkey int, c_mktsegment string"
    h, poly = _fp_rowhash_sql(_FP_COLS)

    def fp(df):
        valued = df.select("c_mktsegment", F.expr(h).alias("h")).select(
            "c_mktsegment", F.expr(poly).alias("v")
        )
        out = (
            valued.groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.expr("bit_xor(v)").alias("xor_fp"),
                F.sum(F.col("v") % _FP_SUM_MOD).alias("sum_fp"),
            )
            .toPandas()
            .sort_values("c_mktsegment")
            .reset_index(drop=True)
        )
        return out

    base = spark.createDataFrame(rows, schema)
    shuffled = spark.createDataFrame(list(reversed(rows)), schema).repartition(13)
    pd.testing.assert_frame_equal(fp(base), fp(shuffled))

    mutated = rows[:500] + [(500, "Customer#MUTATED", 500 % 25, "MACHINERY")] + rows[501:]
    a, b = fp(base), fp(spark.createDataFrame(mutated, schema))
    assert not a.equals(b), "single-row edit left every fingerprint channel unchanged"


def test_attribution_credit_conserves_clicks(spark, sf_correct):
    """Linear attribution's defining invariant: total credit equals the
    number of ATTRIBUTED clicks exactly (each click contributes 1 split
    across its candidate views), and every view of the corpus appears
    exactly once in the ledger."""
    from pyspark.sql import functions as F

    from spark_jdbc_limit_spark.operators import get_query
    from spark_jdbc_limit_spark.sources.catalog import load_table

    ledger = get_query("events_attribution_multitouch").builder(spark, sf_correct)
    ev = load_table(spark, sf_correct, "events")
    n_views = ev.filter(F.col("event_type") == "view").count()
    assert ledger.count() == n_views

    # attributed clicks = distinct clicks with >=1 candidate view
    attributed = (
        get_query("events_view_click_attribution")
        .builder(spark, sf_correct)
        .select("click_id")
        .distinct()
        .count()
    )
    total_credit = ledger.agg(F.sum("credit")).collect()[0][0]
    # per-view credits are rounded at 1e-4, so conservation holds to
    # n_views * 5e-5 slack
    assert abs(total_credit - attributed) < max(1e-6, n_views * 5e-5)


def test_padding_waste_matches_python_reference(spark):
    """The DIV-batch waste arithmetic must equal an explicit Python loop
    over adversarial random lengths — including a tail batch smaller
    than PAD_BATCH and ties in length (where the doc_id tiebreak decides
    batch membership)."""
    import random

    from pyspark.sql import functions as F

    from spark_jdbc_limit_spark.operators.advanced import two_phase_rank
    from spark_jdbc_limit_spark.operators.pipeline import PAD_BATCH

    rng = random.Random(7)
    rows = [(i, rng.choice([3, 17, 17, 64, 400, 401])) for i in range(997)]
    d = spark.createDataFrame(rows, "doc_id long, n_chars long")
    ranked = two_phase_rank(d, "n_chars", ["n_chars", "doc_id"]).select(
        "n_chars", F.expr(f"(rank - 1) DIV {PAD_BATCH}").alias("batch")
    )
    got = (
        ranked.groupBy("batch")
        .agg(F.max("n_chars").alias("mx"), F.sum("n_chars").alias("s"), F.count("*").alias("c"))
        .agg(F.sum(F.col("mx") * F.col("c") - F.col("s")).alias("waste"))
        .collect()[0][0]
    )
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    want = 0
    for i in range(0, len(ordered), PAD_BATCH):
        chunk = [L for _, L in ordered[i : i + PAD_BATCH]]
        want += max(chunk) * len(chunk) - sum(chunk)
    assert got == want


def test_mann_kendall_matches_python_reference(spark):
    """Exact S against the textbook loop on a random series with planted
    ties, plus independent checks of the z formula on a strictly
    increasing series (combinatorial S identity + hand-computed z)."""
    import math
    import random

    from pyspark.sql import functions as F

    rng = random.Random(11)
    vals = [round(rng.uniform(0, 100), 2) for _ in range(60)]
    vals[10] = vals[40]  # planted tie: sign contributes 0
    rows = [(i, v) for i, v in enumerate(vals)]
    w = spark.createDataFrame(rows, "wk int, rev double")
    a, b = w.alias("a"), w.alias("b")
    got = (
        a.join(b, F.col("b.wk") > F.col("a.wk"))
        .agg(
            F.sum(
                F.when(F.col("b.rev") > F.col("a.rev"), 1)
                .when(F.col("b.rev") < F.col("a.rev"), -1)
                .otherwise(0)
            ).alias("s")
        )
        .collect()[0][0]
    )
    n = len(vals)
    want = sum(
        (vals[j] > vals[i]) - (vals[j] < vals[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    assert got == want
    # independent checks of the z formula (same transcription in builder
    # AND oracle would fool the differential): a strictly increasing
    # series has S = n(n-1)/2 by the combinatorial identity, and for
    # n = 40 the continuity-corrected z is the hand-computed constant
    # (780 - 1) / sqrt(40*39*85/18) = 9.0760 — catches /8-vs-/18 or
    # +corr-vs--corr transcriptions that agree cross-engine.
    inc = [(i, float(i)) for i in range(40)]
    wi = spark.createDataFrame(inc, "wk int, rev double")
    ai, bi = wi.alias("a"), wi.alias("b")
    s_inc = (
        ai.join(bi, F.col("b.wk") > F.col("a.wk"))
        .agg(
            F.sum(
                F.when(F.col("b.rev") > F.col("a.rev"), 1)
                .when(F.col("b.rev") < F.col("a.rev"), -1)
                .otherwise(0)
            ).alias("s")
        )
        .collect()[0][0]
    )
    assert s_inc == 40 * 39 // 2 == 780
    z_inc = (s_inc - 1) / math.sqrt(40 * 39 * (2 * 40 + 5) / 18.0)
    assert abs(z_inc - 9.0760) < 5e-4
    # tie-corrected variance: the builder's tie aggregate must equal the
    # textbook sum over equal-value groups, sum(t(t-1)(2t+5)); the
    # planted tie gives one t=2 group -> 2*1*9 = 18 (a strictly
    # increasing series has tc = 0, so z_inc above needs no term)
    tc_got = (
        w.groupBy("rev")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            )
            .cast("long")
            .alias("tc")
        )
        .collect()[0][0]
    )
    from collections import Counter

    tc_want = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(vals).values()
    )
    assert tc_got == tc_want == 18
    # and the corrected variance strictly shrinks, un-biasing z upward
    assert n * (n - 1) * (2 * n + 5) - tc_got < n * (n - 1) * (2 * n + 5)


def test_two_phase_rank_equals_global_sort_index(spark):
    """Property: for ANY key multiset (duplicates, zeros, hot keys, wide
    gaps — shapes the shipped corpus never exercises — and, since the
    round-10 extent-shift change, NEGATIVE and mixed-sign keys: the
    Spearman entry ranks balance cents, which TPC-H makes negative),
    two_phase_rank's (bucketed, offset-joined) rank must equal the
    plain global sort index. Hypothesis drives the key distribution;
    the tiebreaking id keeps the order total so equality is exact."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spark_jdbc_limit_spark.operators.advanced import two_phase_rank

    @settings(max_examples=10, deadline=None)  # trimmed r12: suite budget
    @given(
        keys=st.lists(
            st.one_of(
                st.integers(min_value=0, max_value=5),
                st.integers(min_value=0, max_value=10**9),
                st.integers(min_value=-10**9, max_value=10**9),
                st.integers(min_value=-(10**9), max_value=-1),
            ),
            min_size=1,
            max_size=120,
        ),
        buckets=st.sampled_from([1, 3, 128]),
    )
    def check(keys, buckets):
        rows = [(i, k) for i, k in enumerate(keys)]
        df = spark.createDataFrame(rows, "id long, k long").repartition(5)
        got = {
            r.id: r.rank
            for r in two_phase_rank(df, "k", ["k", "id"], buckets=buckets).collect()
        }
        want = {
            id_: rank
            for rank, (id_, _) in enumerate(sorted(rows, key=lambda r: (r[1], r[0])), 1)
        }
        assert got == want

    check()


def test_fp_rowhash_polynomial_matches_python_int_parse(spark):
    """The fingerprint's ascii-arithmetic nibble polynomial must equal
    Python's own base-16 parse of the first 15 md5 hex chars — an
    engine-independent reference for the decode both engines share.
    Random keys include empty strings, pipes (the canonical separator),
    and unicode."""
    import hashlib

    from pyspark.sql import functions as F

    from spark_jdbc_limit_spark.operators.aggregates import _fp_rowhash_sql

    vals = ["", "a", "src7", "Customer#000000042", "x|y|z", "émoji✓", "0" * 64]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    h, poly = _fp_rowhash_sql(["s"])
    got = {
        r.s: r.v
        for r in df.select("s", F.expr(h).alias("h"))
        .select("s", F.expr(poly).alias("v"))
        .collect()
    }
    for v in vals:
        want = int(hashlib.md5(v.encode("utf-8")).hexdigest()[:15], 16)
        assert got[v] == want, f"nibble polynomial diverged for {v!r}"


def test_cms_join_size_python_model_guarantees():
    """The inner-product join-size estimate's two guarantees, against a
    pure-Python model over adversarial random key multisets
    (hypothesis): min-over-rows Σ_w cellA·cellB never undershoots the
    true join size Σ_k cntA(k)·cntB(k) — the HARD invariant (cross
    terms are non-negative). The |A|·|B|/W Markov bound is an
    EXPECTATION bound, so it is asserted only in the query over the
    fixed corpus (where it is deterministic), never over hypothesis
    randomness. Key ranges include contiguous windows NARROWER than
    CMS_JOIN_W, where the affine hash goes injective and the estimate
    must turn exact — the regime the production width was deliberately
    pinned below."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spark_jdbc_limit_spark.operators.sketches import (
        CMS_A,
        CMS_B,
        CMS_D,
        CMS_JOIN_W,
        CMS_P,
    )

    def h(i, x):
        return ((x % CMS_P) * CMS_A[i] + CMS_B[i]) % CMS_P % CMS_JOIN_W

    def cells(keys):
        c = Counter()
        for x, n in Counter(keys).items():
            for i in range(CMS_D):
                c[(i, h(i, x))] += n
        return c

    keyspaces = st.one_of(
        st.integers(min_value=0, max_value=500),          # narrow window: injective
        st.integers(min_value=0, max_value=50_000),       # wide: real collisions
    )

    @settings(max_examples=80, deadline=None)
    @given(a=st.lists(keyspaces, min_size=1, max_size=300),
           b=st.lists(keyspaces, min_size=1, max_size=300))
    def check(a, b):
        ca, cb = Counter(a), Counter(b)
        true = sum(ca[k] * cb[k] for k in ca if k in cb)
        cea, ceb = cells(a), cells(b)
        est = min(
            sum(cea[(i, w)] * ceb.get((i, w), 0) for _, w in
                [(j, ww) for (j, ww) in cea if j == i])
            for i in range(CMS_D)
        )
        assert est >= true, "estimate undershot the true join size"
        # narrow-window draws must go injective → exact
        if max(a + b) <= 500 and CMS_JOIN_W > 500:
            assert est == true, "injective-regime estimate not exact"

    check()


def test_seasonality_dow_index_rounding_margins():
    """orders_seasonality_dow_index: daily sums are decimal-exact, but
    dow_avg_rev is avg() over ~hundreds of doubles per weekday group and
    seasonal_index divides two such means — both fold-order-dependent
    before their half-up rounds (1e-2 and 1e-4). The compare is sound
    only if every rounded value sits ORDERS above double fold-order
    error from its rounding boundary — the quality-gate margin
    discipline, replayed in numpy at every shipped SF (the round-8
    verdict's one unpinned float output)."""
    import os
    from decimal import Decimal

    import numpy as np
    import pyarrow.parquet as pq

    eps = np.finfo(np.float64).eps
    checked = 0
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/orders.parquet"
        if not os.path.exists(path):
            continue
        t = pq.read_table(path, columns=["o_orderdate", "o_totalprice"]).to_pandas()
        # decimal-exact daily sums, then cast to double — the query's rev
        daily = (
            t.assign(p=t["o_totalprice"].map(lambda x: Decimal(str(x))))
            .groupby(t["o_orderdate"].astype("datetime64[ns]").dt.date)["p"]
            .sum()
        )
        dows = np.array([d.isoweekday() for d in daily.index])
        rev = daily.map(float).to_numpy(dtype=np.float64)
        g = rev.mean()
        g_err = len(rev) * eps * np.abs(rev).max()  # fold-order bound on the mean*n
        for dow in sorted(set(dows)):
            v = rev[dows == dow]
            avg = v.mean()
            avg_err = len(v) * eps * np.abs(v).max()  # conservative n*eps*max
            # (true fold error grows ~sqrt(n)*eps; 100x clearance on the
            # conservative bound is already orders above reality)
            # dow_avg_rev: half-up at 1e-2
            frac2 = abs(avg) * 1e2
            dist2 = abs(frac2 - np.floor(frac2) - 0.5) / 1e2
            assert dist2 > 100 * avg_err, (
                f"{sf}/dow{dow}: dow_avg_rev {avg!r} within {dist2:.2e} of a "
                f"1e-2 boundary (err bound {avg_err:.2e})"
            )
            # seasonal_index: half-up at 1e-4; relative error compounds
            idx = avg / g
            idx_err = idx * (avg_err / avg + g_err / (g * len(rev)))
            frac4 = abs(idx) * 1e4
            dist4 = abs(frac4 - np.floor(frac4) - 0.5) / 1e4
            assert dist4 > 100 * idx_err, (
                f"{sf}/dow{dow}: seasonal_index {idx!r} within {dist4:.2e} of a "
                f"1e-4 boundary (err bound {idx_err:.2e})"
            )
            checked += 1
    assert checked >= 14


def test_matryoshka_rank_boundary_margins():
    """embedding_matryoshka_truncation_audit compares engine-local
    rankings of float cosines: the audit is sound only if the k-th /
    (k+1)-th cosine gap at every anchor exceeds cross-engine fold-order
    error (~d*eps) for BOTH the full and the prefix ranking. Numpy
    replay at every shipped SF."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from spark_jdbc_limit_spark.operators.similarity import (
        MATRYOSHKA_ANCHORS,
        MATRYOSHKA_DIMS,
        MATRYOSHKA_K,
    )

    checked = 0
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/embeddings.parquet"
        if not os.path.exists(path):
            continue
        t = pq.read_table(path).to_pandas().sort_values("vec_id")
        ids = t["vec_id"].to_numpy()
        m = np.stack(t["embedding"].to_numpy()).astype(np.float64)
        for width, tag in ((m.shape[1], "full"), (MATRYOSHKA_DIMS, "prefix")):
            x = m[:, :width]
            xn = x / np.linalg.norm(x, axis=1, keepdims=True)
            for a in range(MATRYOSHKA_ANCHORS):
                cos = xn @ xn[a]
                cos[a] = -np.inf  # self excluded
                top = np.sort(cos)[::-1]
                gap = top[MATRYOSHKA_K - 1] - top[MATRYOSHKA_K]
                assert gap > 1e-9, (
                    f"{sf}/{tag}/anchor{ids[a]}: k-boundary gap {gap:.2e} — "
                    "rankings could flip cross-engine"
                )
                checked += 1
    assert checked >= 32
