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


def test_quality_gate_threshold_margins():
    """pipeline_quality_gate_report compares rounded signals against
    PERCENTILE-INTERPOLATED thresholds computed independently by Spark
    (percentile) and DuckDB (quantile_cont). The decisions are stable
    across engines only if no signal sits within last-ulp interpolation
    error of a threshold — mirror of test_pq_audit_margins, asked for by
    ADVICE r6. Replicates all three signals and the five thresholds in
    pure numpy on every shipped SF and asserts a ≥1e-9 margin."""
    import os
    import re as _re

    import numpy as np
    import pyarrow.parquet as pq

    from spark_jdbc_limit_spark.operators.pipeline import (
        GATE_LEN_LO,
        GATE_SIG_HI,
        GATE_SIG_LO,
    )
    from spark_jdbc_limit_spark.operators.text import (
        FLESCH_BASE,
        FLESCH_SENT_W,
        FLESCH_SYL_W,
        SENT_RE,
        SYL_RE,
    )

    def r4(x):  # round_dbl's half-up at 1e-4
        return np.floor(np.asarray(x, dtype=np.float64) * 1e4 + 0.5) / 1e4

    checked = 0
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        t = pq.read_table(path, columns=["doc_id", "text", "n_chars"]).to_pandas()
        f_sig, e_sig, l_sig = [], [], []
        for text, n_chars in zip(t["text"], t["n_chars"]):
            if text is None or len(text) == 0:
                continue
            words = text.split(" ")
            n_words = len(words)
            n_sents = max(len(_re.findall(SENT_RE, text)), 1)
            n_syl = len(_re.findall(SYL_RE, text))
            f = FLESCH_BASE - FLESCH_SENT_W * (n_words / n_sents) - FLESCH_SYL_W * (n_syl / n_words)
            s = text.replace("\r", "").replace("\n", "")
            if not s:
                continue
            cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
            counts = np.unique(cp, return_counts=True)[1]
            p = counts / counts.sum()
            ent = float(-(p * np.log2(p)).sum())
            f_sig.append(float(r4(f)))
            e_sig.append(float(r4(ent)))
            l_sig.append(float(n_chars))
        f_sig, e_sig, l_sig = map(np.asarray, (f_sig, e_sig, l_sig))
        thresholds = [
            (f_sig, GATE_SIG_LO, np.percentile(f_sig, GATE_SIG_LO * 100, method="linear")),
            (f_sig, GATE_SIG_HI, np.percentile(f_sig, GATE_SIG_HI * 100, method="linear")),
            (e_sig, GATE_SIG_LO, np.percentile(e_sig, GATE_SIG_LO * 100, method="linear")),
            (e_sig, GATE_SIG_HI, np.percentile(e_sig, GATE_SIG_HI * 100, method="linear")),
            (l_sig, GATE_LEN_LO, np.percentile(l_sig, GATE_LEN_LO * 100, method="linear")),
        ]
        for sig, q, thr in thresholds:
            srt = np.sort(sig)
            idx = (len(srt) - 1) * q
            lo, hi = srt[int(np.floor(idx))], srt[int(np.ceil(idx))]
            dist = np.abs(sig - thr)
            if lo == hi:
                # threshold IS a (repeated) order statistic — every engine's
                # interpolation between equal neighbors returns it exactly,
                # so signals EQUAL to it compare identically (inclusive
                # bounds both sides); only near-misses are a flip risk
                margin = dist[dist > 0].min() if (dist > 0).any() else np.inf
            else:
                margin = dist.min()
            assert margin > 1e-9, (
                f"{sf}: signal within {margin:.2e} of threshold {thr!r} — "
                "cross-engine pass/fail flip risk"
            )
            checked += 1
    assert checked >= 5, "no shipped SF was checked"


def test_packing_keeps_null_source_stream(spark, tmp_path):
    """A null `source` is a stream like any other (the oracle's
    PARTITION BY source keeps a NULL partition): the null-safe offsets
    join must pack those docs instead of dropping them. Runs the real
    builder over a micro corpus with a null-source stream and checks it
    against the same concat-and-split computed in plain Python."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = [
        # (doc_id, text, source) — doc 2, 5, 7 belong to the NULL stream
        (0, "a b c", "s0"),
        (1, "a b", "s0"),
        (2, "x " * 300, None),
        (3, "a", "s1"),
        (5, "y " * 300, None),
        (7, "z", None),
    ]
    tbl = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1].strip() for d in docs], pa.string()),
        "lang": pa.array(["en"] * len(docs), pa.string()),
        "source": pa.array([d[2] for d in docs], pa.string()),
        "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    rows = {r.doc_id: r for r in
            get_query("pack_tokens_sequential").builder(spark, str(tmp_path)).collect()}
    assert set(rows) == {0, 1, 2, 3, 5, 7}, "null-source docs were dropped"

    # expected bins per stream, concat-and-split over doc_id order
    streams = defaultdict(list)
    for doc_id, text, source in docs:
        streams[source].append((doc_id, len(text.strip().split(" "))))
    for source, stream in streams.items():
        cum = 0
        for doc_id, n_tok in sorted(stream):
            assert rows[doc_id].bin_id == cum // TOKEN_BUDGET, (source, doc_id)
            assert rows[doc_id].n_tokens == n_tok
            assert rows[doc_id].source == source
            cum += n_tok


def test_waterfill_matches_iterative_reference(spark, sf_correct):
    """The closed-form (sorted prefix/suffix window) waterfilling must
    equal the textbook ITERATIVE algorithm — repeatedly cap every source
    whose proportional share exceeds its capacity and redistribute the
    residual — run in plain python on the same aggregates. Also pins the
    allocation invariants: every allocation <= capacity, capped sources
    saturate exactly, and the total never exceeds the budget."""
    from spark_jdbc_limit_spark.operators.pipeline import (
        ALLOC_BUDGET_DEN,
        ALLOC_BUDGET_NUM,
    )

    rows = (
        get_query("mix_capped_allocation_waterfill")
        .builder(spark, sf_correct)
        .collect()
    )
    got = {r.source: (r.allocated_tokens, r.is_capped) for r in rows}

    caps = {r.source: r.available_tokens for r in rows}
    ws = {r.source: r.n_docs for r in rows}
    budget = sum(caps.values()) * ALLOC_BUDGET_NUM // ALLOC_BUDGET_DEN

    # iterative reference: cap-and-redistribute until stable
    capped: set[str] = set()
    while True:
        rem_budget = budget - sum(caps[s] for s in capped)
        rem_w = sum(w for s, w in ws.items() if s not in capped)
        newly = {
            s
            for s in ws
            if s not in capped and caps[s] * rem_w <= rem_budget * ws[s]
        }
        if not newly:
            break
        capped |= newly
    rem_budget = budget - sum(caps[s] for s in capped)
    rem_w = sum(w for s, w in ws.items() if s not in capped)
    want = {
        s: (caps[s], True) if s in capped
        else (rem_budget * ws[s] // rem_w, False)
        for s in ws
    }
    assert got == want
    assert all(a <= caps[s] for s, (a, _) in got.items())
    assert sum(a for a, _ in got.values()) <= budget


def test_peak_concurrency_matches_python_sweep(spark, tmp_path):
    """The two-phase bucketed running sum must equal a single-pass python
    sweep on random event sets — including bucket-boundary crossings and
    same-instant opens/closes the shipped corpus may never hit."""
    import random
    from datetime import datetime, timedelta

    import pandas as pd

    rng = random.Random(20260816)
    rows = []
    base = datetime(2024, 1, 1)
    for i in range(400):
        # cluster timestamps so sessions overlap AND hit hour boundaries
        t = base + timedelta(seconds=rng.randint(0, 4 * 3600))
        rows.append(
            (
                i,
                t,
                rng.randint(0, 20),
                rng.choice(["view", "click", "purchase"]),
                float(rng.randint(0, 7200)),  # up to 2h => crosses buckets
                "{}",
            )
        )
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = str(tmp_path / "sweepdata")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )

    got = {
        r.event_type: (r.peak_concurrent, r.first_peak_ts, r.n_intervals)
        for r in get_query("events_peak_concurrency_sweep")
        .builder(spark, out)
        .collect()
    }

    want = {}
    for etype, grp in pdf.groupby("event_type"):
        deltas: dict[int, int] = {}
        for _, r in grp.iterrows():
            s = int(r.ts.value // 1000)  # ns -> us
            e = s + int(r.value) * 1_000_000
            deltas[s] = deltas.get(s, 0) + 1
            deltas[e] = deltas.get(e, 0) - 1
        cum, peak, first = 0, -1, None
        for t in sorted(deltas):
            cum += deltas[t]
            if cum > peak:
                peak, first = cum, t
        want[etype] = (peak, pd.Timestamp(first, unit="us"), len(grp))

    assert set(got) == set(want)
    for etype, (peak, first, n) in want.items():
        g_peak, g_first, g_n = got[etype]
        assert g_peak == peak and g_n == n, etype
        assert pd.Timestamp(g_first) == first, etype


def test_curate_span_cut_stage_accounting_crafted(spark):
    """The round-13 capstone's per-source, per-stage accounting pinned on
    a crafted corpus, independently of the DuckDB oracle (which derives
    from the same spec). The sharpest pin is GATED OWNERSHIP: doc 0
    (source A) carries the licence block but fails the repetition gate
    with the SMALLEST doc_id — were anchors computed over the raw corpus,
    it would own the block's bucket and doc 3 would get cut; over the
    gated survivors, doc 3 is the owner and only doc 4 loses the block's
    8 tokens."""
    from spark_jdbc_limit_spark.operators.pipeline import curate_span_cut_frame

    block = " ".join(f"lic{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            # src A: gate-dropped (block + 30x repetition → gram_rep 0.75)
            (0, "A", block + " " + " ".join(["x"] * 30)),
            # src A: clean unique 10-worder → kept, untouched
            (1, "A", " ".join(f"a{i}" for i in range(10))),
            # src A: gate-dropped (pure repetition)
            (2, "A", " ".join(["x"] * 10)),
            # src B: licence block + 2 unique → kept, OWNER (min gated id)
            (3, "B", block + " u1 u2"),
            # src B: unique + block → kept, loses the block's 8 tokens
            (4, "B", "v1 " + block + " v2"),
            # src C: 7 tokens → gate-dropped (below the length floor)
            (5, "C", " ".join(f"c{i}" for i in range(7))),
        ],
        "doc_id long, source string, text string",
    )
    got = {
        r["source"]: (
            r["n_docs_in"],
            r["n_docs_dropped_gate"],
            r["n_docs_kept"],
            r["n_tokens_kept"],
            r["n_tokens_removed"],
            r["n_docs_cut"],
        )
        for r in curate_span_cut_frame(docs).collect()
    }
    assert got == {
        "A": (3, 2, 1, 10, 0, 0),
        "B": (2, 0, 2, 20, 8, 1),
        "C": (1, 1, 0, 0, 0, 0),
    }


def test_curate_full_pipeline_stage_accounting_crafted(spark):
    """The round-14 composed capstone (gate → eval holdout → dup-span cut
    + decon cut in one pass) pinned on a crafted corpus. The sharpest
    pins: (a) UNION-vs-SUM — doc 6's duplicated run and its eval-covered
    run overlap on positions 2-9, so n_tokens_removed (10) is strictly
    less than dup (10) + decon (8); (b) the eval slice (doc_id % 11 == 0)
    is held out of the cut but its grams still cut training docs; (c) the
    dup owner rule runs over gated TRAIN docs only; (d) n_chars_out sums
    the reassembled text, including a fully-emptied doc."""
    from spark_jdbc_limit_spark.operators.pipeline import (
        DECON_EVAL_MOD,
        curate_full_frame,
    )

    assert DECON_EVAL_MOD == 11  # doc 0 is the eval slice below
    lic = " ".join(f"lic{i}" for i in range(8))
    ev = " ".join(f"ev{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            # eval doc (0 % 11 == 0): its single 8-gram defines the ev set;
            # gated (8 distinct tokens) → counted as held out, never cut
            (0, "E", ev),
            # clean unique 10-worder → kept, untouched
            (1, "A", " ".join(f"a{i}" for i in range(10))),
            # licence-block OWNER among train docs (min doc_id) → uncut
            (2, "B", lic + " u1 u2"),
            # non-owner → loses the block's 8 tokens (positions 2-9)
            (3, "B", "v1 " + lic + " v2"),
            # eval-contaminated only: ev gram at positions 2-9 → decon cut 8
            (4, "C", "w1 " + ev + " w2"),
            # exact copy of doc 4: dup cover 1-10 (owner is doc 4) AND
            # decon cover 2-9 → union 10 < 18; cleaned text is EMPTY
            (6, "D", "w1 " + ev + " w2"),
            # gate-dropped by repetition (not train, not eval)
            (7, "E", " ".join(["x"] * 10)),
        ],
        "doc_id long, source string, text string",
    )
    got = {
        r["source"]: (
            r["n_docs_in"],
            r["n_docs_dropped_gate"],
            r["n_docs_eval_heldout"],
            r["n_docs_kept"],
            r["n_tokens_kept"],
            r["n_tokens_removed_dup"],
            r["n_tokens_removed_decon"],
            r["n_tokens_removed"],
            r["n_docs_cut"],
            r["n_chars_out"],
        )
        for r in curate_full_frame(docs).collect()
    }
    expect = {
        "A": (1, 0, 0, 1, 10, 0, 0, 0, 0, 29),
        "B": (2, 0, 0, 2, 20, 8, 0, 8, 1, 50),
        "C": (1, 0, 0, 1, 10, 0, 8, 8, 1, 5),
        "D": (1, 0, 0, 1, 10, 10, 8, 10, 1, 0),
        "E": (2, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    }
    assert got == expect

    # the materialized-eval-index path (bench.py's pipeline-marginal
    # formulation) must be row-identical to the in-plan derivation
    from pyspark.sql import functions as F

    from spark_jdbc_limit_spark.operators.dedup import _dup_anchors

    ev_idx = (
        _dup_anchors(docs.filter(F.pmod("doc_id", F.lit(11)) == 0))[1]
        .select("ah")
        .distinct()
        .localCheckpoint()
    )
    got_idx = {
        r["source"]: (
            r["n_docs_in"],
            r["n_docs_dropped_gate"],
            r["n_docs_eval_heldout"],
            r["n_docs_kept"],
            r["n_tokens_kept"],
            r["n_tokens_removed_dup"],
            r["n_tokens_removed_decon"],
            r["n_tokens_removed"],
            r["n_docs_cut"],
            r["n_chars_out"],
        )
        for r in curate_full_frame(docs, ev_grams=ev_idx).collect()
    }
    assert got_idx == expect


def test_token_budget_select_prefix_and_boundary(spark):
    """The round-14 budget selection pinned on a crafted corpus where the
    budget boundary falls INSIDE a score bucket: the full-in bucket's
    docs all select with no sort, the boundary bucket splits by doc_id
    order, lower buckets are out, and the selected set is exactly the
    largest fitting prefix of (score DESC, doc_id)."""
    from spark_jdbc_limit_spark.operators.pipeline import (
        TBS_BUDGET_DEN,
        TBS_BUDGET_NUM,
        pipeline_token_budget_select,
    )
    import spark_jdbc_limit_spark.operators.pipeline as pl
    from spark_jdbc_limit_spark.sources.catalog import load_table as _lt

    # 4 docs, 10 tokens each (40 total -> budget 10 tokens at 1/4):
    #  doc 0: all-distinct (score 10000)  - fills the whole budget
    #  doc 1: all-distinct (score 10000)  - same bucket, over budget
    #  doc 2: 9 distinct   (score 9000)   - out
    #  doc 3: repetitive   (score 1000)   - out
    assert (TBS_BUDGET_NUM, TBS_BUDGET_DEN) == (1, 4)
    rows = [
        (0, "A", " ".join(f"a{i}" for i in range(10))),
        (1, "A", " ".join(f"b{i}" for i in range(10))),
        (2, "B", " ".join(f"c{i}" for i in range(9)) + " c0"),
        (3, "B", " ".join(["x"] * 10)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    import unittest.mock as mock

    with mock.patch.object(pl, "load_table", lambda s, sf, t: docs):
        got = {
            r["doc_id"]: (r["score_r"], r["n_tokens"], r["budget_tokens"], r["selected"])
            for r in pipeline_token_budget_select(spark, "ignored").collect()
        }
    assert got == {
        0: (10000, 10, 10, 1),  # first in order: inclusive cum 10 <= 10
        1: (10000, 10, 10, 0),  # same bucket, cum 20 > 10
        2: (9000, 10, 10, 0),
        3: (1000, 10, 10, 0),
    }
