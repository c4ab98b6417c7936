"""Property test for the 3-gram machinery (grams3): the slice+zip_with
formulation must agree with the obvious Python reference over adversarial
word lists — including the n<3 edge cases the corpus never exercises."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spark_jdbc_limit_spark.operators.text import grams3


def py_grams3(words: list[str]) -> list[str]:
    return [" ".join(words[i : i + 3]) for i in range(len(words) - 2)]


def test_grams3_matches_python_reference(spark):
    rng = random.Random(42)
    vocab = ["a", "bb", "ccc", "dd dd", "", "e"]
    docs = [
        [rng.choice(vocab) for _ in range(rng.randint(0, 12))] for _ in range(300)
    ]
    # deliberate edge cases: empty, 1-word, 2-word, 3-word docs
    docs += [[], ["x"], ["x", "y"], ["x", "y", "z"]]

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id int, words array<string>"
    )
    got = {
        r.doc_id: list(r.grams)
        for r in df.select(
            "doc_id", grams3(F.col("words"), F.size("words")).alias("grams")
        ).collect()
    }
    for i, d in enumerate(docs):
        assert got[i] == py_grams3(d), f"doc {i}: {d!r} -> {got[i]} != {py_grams3(d)}"


@given(
    st.floats(
        min_value=-1e6,
        max_value=1e6,
        allow_nan=False,
        allow_infinity=False,
    ),
    st.integers(min_value=0, max_value=6),
)
@settings(max_examples=300, deadline=None)
def test_round_dbl_formula_is_engine_portable(x, scale):
    """The portability contract behind every float-bearing oracle: the
    floor(x*10^n + 0.5)/10^n formula evaluated with IEEE double ops in
    DuckDB must equal the same formula in python/numpy (both mirror what
    Spark's codegen computes — pure double multiply/add/floor/divide, no
    engine-specific decimal rounding)."""
    import math

    import duckdb

    s = float(10**scale)
    py = math.floor(x * s + 0.5) / s
    (duck,) = duckdb.sql(
        f"SELECT FLOOR(CAST({x!r} AS DOUBLE) * {s} + 0.5) / {s}"
    ).fetchone()
    assert py == duck, (x, scale, py, duck)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(0, 30), min_size=0, max_size=40),
    st.lists(st.integers(0, 30), min_size=0, max_size=40),
    st.lists(st.integers(0, 30), min_size=6, max_size=25),
)
def test_winnowing_detection_floor(pre, post, shared):
    """The winnowing guarantee (SIGMOD'03): two documents sharing a run
    of >= WINNOW_W + SHINGLE_K - 1 words always share at least one
    selected fingerprint, regardless of what surrounds the run. `shared`
    is drawn FROM the exact floor — min_size 6 = WINNOW_W + SHINGLE_K - 1
    for the shipped constants (4 + 3 - 1) — so the boundary lengths an
    off-by-one in the window bounds would break are exercised, not just
    comfortably-long runs."""
    from spark_jdbc_limit_spark.operators.dedup import (
        SHINGLE_K,
        WINNOW_W,
        _winnow_set,
    )

    assert len(shared) >= WINNOW_W + SHINGLE_K - 1
    words = lambda ints, tag: [f"{tag}{i}" for i in ints]
    run = " ".join(words(shared, "s"))
    doc_a = " ".join(filter(None, [" ".join(words(pre, "a")), run]))
    doc_b = " ".join(filter(None, [run, " ".join(words(post, "b"))]))
    fa, fb = _winnow_set(doc_a), _winnow_set(doc_b)
    assert fa & fb, (doc_a, doc_b)


def test_winnowing_density_and_subset():
    """Selected fingerprints are a subset of the full shingle set, and a
    short document (< WINNOW_W shingles) contributes exactly its global
    minimum."""
    from spark_jdbc_limit_spark.operators.dedup import (
        SHINGLE_K,
        WINNOW_W,
        _shingle_set,
        _winnow_set,
    )

    text = " ".join(f"w{i % 17}" for i in range(200))
    assert _winnow_set(text) <= _shingle_set(text)
    short = " ".join(f"u{i}" for i in range(SHINGLE_K + 1))  # 2 shingles < W
    ws = _winnow_set(short)
    assert len(ws) == 1 and ws <= _shingle_set(short)
