"""Python-extension surface (SURVEY.md §2B "UDF/UDAF/UDTF"): Arrow-
vectorized pandas UDFs (scalar + grouped aggregate), grouped-map
applyInPandas, and a Python UDTF.

The reference has none — this is the engine's escape hatch for semantics
the built-ins can't express. Rules encoded here:
- every UDF is Arrow-batched (pandas_udf / applyInPandas / @udtf), never
  row-at-a-time ``F.udf`` in a hot path;
- UDF outputs are DETERMINISTIC pure functions of their inputs, so the
  DuckDB oracle can recompute them — the same discipline as the hash
  operators;
- each query's built-in-free twin exists only where built-ins genuinely
  cannot express the op (here they could — these queries exist to verify
  the extension machinery itself against known-good SQL).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_jdbc_limit_spark.operators.registry import query
from spark_jdbc_limit_spark.sources.catalog import load_table


def _make_clv_score():
    """Vectorized scalar UDF: a toy customer-value score. Pure arithmetic
    on the Arrow batch — one Python call per ~10k rows, not per row.
    (Built lazily: pandas_udf parses its DDL type against the active
    session, so decorating at import time would require one.)"""

    @F.pandas_udf("double")
    def clv_score(total: pd.Series, n_orders: pd.Series) -> pd.Series:
        import numpy as np

        return np.log1p(total) * n_orders.clip(upper=10)

    return clv_score


@query(
    "udf_pandas_scalar",
    category="udf",
    description="Arrow-vectorized scalar pandas UDF (log1p value score)",
    oracle="""
        SELECT o_custkey,
               FLOOR(LN(1.0 + SUM(o_totalprice)) *
                     LEAST(COUNT(*), 10) * 10000.0 + 0.5) / 10000.0 AS clv
        FROM orders
        GROUP BY o_custkey
        ORDER BY o_custkey
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """numpy.log1p and JVM/DuckDB LN agree to the last ulp on these
    magnitudes; the floor-round guard absorbs it either way."""
    from spark_jdbc_limit_spark.operators.relational import round_dbl

    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double").alias("total"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        per_cust.select(
            "o_custkey",
            round_dbl(_make_clv_score()(F.col("total"), F.col("n_orders")), 4).alias("clv"),
        )
        .orderBy("o_custkey")
    )




def _make_weighted_avg():
    """Grouped-aggregate pandas UDF (UDAF): quantity-weighted mean price."""

    @F.pandas_udf("double")
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        q = qty.sum()
        return float((price * qty).sum() / q) if q else float("nan")

    return weighted_avg


@query(
    "udaf_grouped_weighted_avg",
    category="udf",
    description="pandas_udf grouped-aggregate UDAF: qty-weighted avg price",
    oracle="""
        SELECT l_returnflag,
               FLOOR(CAST(SUM(CAST(l_extendedprice * l_quantity
                                   AS DECIMAL(28,6)))
                          / SUM(CAST(l_quantity AS DECIMAL(18,6)))
                          AS DOUBLE) * 10000.0 + 0.5) / 10000.0
                   AS w_avg_price
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def udaf_grouped_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDAF accumulates float64 in pandas (pairwise summation) while
    the oracle sums exact decimals; at these magnitudes the relative gap
    is ~1e-14, so a half-up round at 1e-4 on BOTH sides makes the pair
    deterministic. The exact-decimal twin below stays as the tighter
    in-suite bound."""
    from spark_jdbc_limit_spark.operators.relational import round_dbl

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            round_dbl(
                _make_weighted_avg()(
                    F.col("l_extendedprice"), F.col("l_quantity")
                ),
                4,
            ).alias("w_avg_price")
        )
        .orderBy("l_returnflag")
    )


def weighted_avg_builtin_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-decimal built-in equivalent used by tests to bound the UDAF."""
    li = load_table(spark, sf_dir, "lineitem")
    num = F.sum((F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(28,6)")).cast(
        "double"
    )
    den = F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double")
    return (
        li.groupBy("l_returnflag")
        .agg((num / den).alias("w_avg_price"))
        .orderBy("l_returnflag")
    )


def _minmax_scale(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map: min-max scale acctbal within each segment."""
    lo, hi = pdf["c_acctbal"].min(), pdf["c_acctbal"].max()
    span = hi - lo
    pdf = pdf.copy()
    pdf["bal_scaled"] = 0.0 if span == 0 else (pdf["c_acctbal"] - lo) / span
    return pdf[["c_mktsegment", "c_custkey", "bal_scaled"]]


@query(
    "udf_grouped_map_scale",
    category="udf",
    description="applyInPandas grouped-map: per-segment min-max scaling",
    oracle="""
        SELECT c_mktsegment, c_custkey,
               FLOOR(CASE WHEN MAX(c_acctbal) OVER w = MIN(c_acctbal) OVER w THEN 0.0
                    ELSE (c_acctbal - MIN(c_acctbal) OVER w)
                         / (MAX(c_acctbal) OVER w - MIN(c_acctbal) OVER w)
               END * 10000.0 + 0.5) / 10000.0 AS bal_scaled
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment)
        ORDER BY c_mktsegment, c_custkey
    """,
)
def udf_grouped_map_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-group pandas transform: each segment arrives as ONE pandas
    DataFrame (watch group size at scale — a hot segment must fit in
    executor memory; pre-salt if it can't)."""
    from spark_jdbc_limit_spark.operators.relational import round_dbl

    c = load_table(spark, sf_dir, "customer")
    scaled = c.select("c_mktsegment", "c_custkey", "c_acctbal").groupBy("c_mktsegment").applyInPandas(
        _minmax_scale, "c_mktsegment string, c_custkey long, bal_scaled double"
    )
    return (
        scaled.select(
            "c_mktsegment", "c_custkey", round_dbl(F.col("bal_scaled"), 4).alias("bal_scaled")
        )
        .orderBy("c_mktsegment", "c_custkey")
    )


@query(
    "udtf_word_ngrams",
    category="udf",
    description="Python UDTF: explode documents into word bigrams",
    oracle="""
        SELECT doc_id, w[i] || ' ' || w[i+1] AS bigram
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) d,
             UNNEST(range(1, len(w))) AS t(i)
        WHERE len(w) >= 2 AND doc_id < 100
        ORDER BY doc_id, bigram
    """,
)
def udtf_word_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table function: one input row → many output rows. (The built-in
    twin is explode+transform; the UDTF form exists to verify the
    machinery. Restricted to doc_id<100 to keep the differential small.)"""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, bigram string")
    class Bigrams:
        def eval(self, doc_id: int, text: str):
            words = text.split(" ")
            for a, b in zip(words, words[1:]):
                yield doc_id, f"{a} {b}"

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    spark.udtf.register("bigrams_udtf", Bigrams)
    d.select("doc_id", "text").createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        "SELECT b.doc_id, b.bigram FROM docs_for_udtf, "
        "LATERAL bigrams_udtf(doc_id, text) b ORDER BY doc_id, bigram"
    )


#: Deterministic "model": weight d = ((d*31 + 7) mod 13 - 6) / 13 — a
#: fixed pseudo-random projection both engines can regenerate exactly.
EMB_DIM = 64


def _model_weights():
    import numpy as np

    d = np.arange(EMB_DIM, dtype=np.int64)
    return ((d * 31 + 7) % 13 - 6) / 13.0


def _make_iter_scorer():
    """Iterator-of-series pandas UDF (SCALAR_ITER): the ML-inference shape.
    The "model" loads ONCE per partition (before the batch loop), then
    every Arrow batch reuses it — at 100 TB with a real checkpoint this
    is the difference between one multi-GB model load per task and one
    per 10k-row batch. The scalar form cannot express that amortization;
    the iterator form is why it exists."""

    @F.pandas_udf("double")
    def iter_score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        w = _model_weights()  # "expensive" init: once per partition
        for emb in batches:
            m = np.stack(emb.to_numpy()).astype(np.float64)
            raw = m @ w
            yield pd.Series(np.floor(raw * 10000.0 + 0.5) / 10000.0)

    return iter_score


@query(
    "udf_scalar_iter_model_scoring",
    category="udf",
    description="Iterator pandas UDF: per-partition model load + batched inference",
    oracle="""
        SELECT vec_id,
               FLOOR(list_sum(list_transform(range(0, 64), d ->
                   CAST(embedding[d + 1] AS DOUBLE)
                   * (((d * 31 + 7) % 13 - 6) / 13.0)
               )) * 10000.0 + 0.5) / 10000.0 AS model_score
        FROM embeddings
    """,
)
def udf_scalar_iter_model_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch model inference over an embedding column — the canonical
    LLM-pipeline scoring pass (quality classifier, reward model, toxicity
    head), expressed with the iterator pandas UDF so model initialization
    is amortized per PARTITION while scoring stays one numpy GEMV per
    Arrow batch. The model here is a deterministic fixed projection, so
    the DuckDB oracle regenerates the weights and recomputes every score
    bit-for-bit (float32→double widening first, identical in both
    engines); swap `_model_weights` for a real checkpoint load and the
    Spark plumbing is production inference unchanged."""
    e = load_table(spark, sf_dir, "embeddings")
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id", _make_iter_scorer()(emb_d).alias("model_score")
    )


#: Cogroup key coarsening factor: the kernel receives a BUCKET of orders
#: (o_orderkey % _COGROUP_BUCKETS) per invocation, not one order.
#: applyInPandas invokes the Python kernel once per key, so keying the
#: cogroup by the natural id made per-group overhead (~5 ms Arrow
#: round-trip) dominate on tiny groups — 2.39x the JVM join+agg twin in
#: the round-13 TOP20 A/B. Bucketing amortizes the hop across ~n/B
#: orders while the per-order math stays vectorized numpy/pandas inside
#: the kernel; at production scale B is sized to ~cluster parallelism ×
#: a few, keeping every kernel call thousands of rows deep.
_COGROUP_BUCKETS = 16


def _order_fill(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    """Cogroup kernel: one BUCKET of orders (left) + that bucket's
    lineitems (right) → one fill-rate row per order. Line revenue is
    rounded to exact integer cents BEFORE summing, so the per-order sums
    are row-order independent (a float sum's result depends on pandas
    row order, which Spark does not guarantee inside a cogroup); the
    per-order reduction is a vectorized pandas groupby, never a Python
    loop."""
    import numpy as np

    if not len(left):
        # lineitem bucket with no order rows: the oracle's LEFT JOIN from
        # orders never emits it — return an empty frame, don't crash
        return pd.DataFrame(
            {
                "o_orderkey": pd.array([], dtype="int64"),
                "n_lines": pd.array([], dtype="int64"),
                "fill_ratio": pd.array([], dtype="float64"),
            }
        )
    out = left[["o_orderkey", "o_totalprice"]].copy()
    if len(right):
        cents = np.floor(
            right["rev"].to_numpy(dtype="float64") * 100.0 + 0.5
        ).astype("int64")
        per_order = (
            pd.DataFrame({"k": right["l_orderkey"].to_numpy(), "c": cents})
            .groupby("k")["c"]
            .agg(["sum", "count"])
        )
        out = out.merge(per_order, left_on="o_orderkey", right_index=True, how="left")
    else:
        out["sum"] = np.nan
        out["count"] = np.nan
    cents_sum = out["sum"].fillna(0).to_numpy(dtype="float64")
    tp = out["o_totalprice"].to_numpy(dtype="float64")
    ratio = np.floor((cents_sum / 100.0) / tp * 1e4 + 0.5) / 1e4
    return pd.DataFrame(
        {
            "o_orderkey": out["o_orderkey"].to_numpy(dtype="int64"),
            "n_lines": out["count"].fillna(0).to_numpy(dtype="int64"),
            "fill_ratio": ratio,
        }
    )


@query(
    "udf_cogrouped_order_fill",
    category="udf",
    description="Cogrouped applyInPandas: per-order lineitem fill rate vs order total",
    oracle="""
        SELECT o.o_orderkey,
               CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_lines,
               FLOOR((COALESCE(SUM(CAST(FLOOR(
                          l.l_extendedprice * (1 - l.l_discount) * 100.0 + 0.5
                      ) AS BIGINT)), 0) / 100.0) / o.o_totalprice * 10000.0 + 0.5)
                   / 10000.0 AS fill_ratio
        FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey < 250
        GROUP BY o.o_orderkey, o.o_totalprice
        ORDER BY o.o_orderkey
    """,
)
def udf_cogrouped_order_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LAST Arrow API surface the UDF family was missing:
    ``groupBy().cogroup(other.groupBy()).applyInPandas`` — both
    relations arrive key-aligned as pandas frames in ONE co-partitioned
    exchange pair (no join materialized first). The kernel sees a
    bucket whose orders have zero lines as an EMPTY right frame — the
    left-join edge the built-in twin needs COALESCE for. Restricted to
    orderkey<250 so the filter pushes to both parquet scans.

    The cogroup key is a BUCKET (o_orderkey % {_COGROUP_BUCKETS}), not
    the order id (round-13 verdict #3): applyInPandas invokes the
    Python kernel once per key, so per-key cogrouping paid ~5 ms of
    Arrow round-trip per ~7-row group — 2.39x the JVM join+agg twin.
    Bucketing amortizes the hop over ~n/{_COGROUP_BUCKETS} orders per
    call with the per-order reduction vectorized inside the kernel —
    the pattern a production cogroup uses whenever per-key logic is
    vectorizable. Semantics are unchanged: per-line revenue rounds to
    integer cents before summing (row-order independent), output is one
    row per order.

    At 100 TB the cogroup shuffles both sides once on the bucket key —
    same cost as the shuffle join it replaces — with the bucket count
    sized to cluster parallelism; per-bucket memory is bounded by
    orders/bucket × lines-per-order (~7), and a skewed natural key
    cannot skew a bucket beyond its id range."""
    bucket = lambda c: F.pmod(F.col(c), F.lit(_COGROUP_BUCKETS))  # noqa: E731
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 250)
        .select("o_orderkey", "o_totalprice", bucket("o_orderkey").alias("b"))
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 250)
        .select(
            "l_orderkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
            bucket("l_orderkey").alias("b"),
        )
    )
    return (
        o.groupBy("b")
        .cogroup(li.groupBy("b"))
        .applyInPandas(
            _order_fill, "o_orderkey long, n_lines long, fill_ratio double"
        )
        .orderBy("o_orderkey")
    )


def _arrow_norm_batches(it):
    """mapInArrow kernel: zero-copy per-batch L2 norms + dominant dim.

    Operates on pyarrow buffers directly — the flattened child array of
    the fixed-width list column reshapes into an (n, d) matrix with NO
    per-row Python, which is the entire point of the Arrow-native API
    over a pandas UDF: no Series boxing, no object churn, just numpy
    over Arrow memory."""
    import numpy as np
    import pyarrow as pa

    for batch in it:
        ids = batch.column("vec_id")
        emb = batch.column("embedding")
        n = len(emb)
        if n == 0:
            continue
        d = len(emb[0])
        m = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(n, d)
        # accumulate squares SEQUENTIALLY over dims (vectorized over rows):
        # numpy's default pairwise reduction orders additions differently
        # from the oracle's left-fold list_sum, and floor-rounding only
        # guarantees equality for bit-identical doubles
        acc = np.zeros(n, dtype=np.float64)
        for j in range(d):
            acc += m[:, j] * m[:, j]
        norms = np.sqrt(acc)
        dom = np.abs(m).argmax(axis=1) + 1  # 1-based, matching SQL list_position
        yield pa.RecordBatch.from_arrays(
            [
                ids,
                pa.array([d] * n, type=pa.int32()),
                pa.array(norms, type=pa.float64()),
                pa.array(dom.astype(np.int32)),
            ],
            names=["vec_id", "dim", "l2_norm", "dominant_dim"],
        )


@query(
    "udf_arrow_map_batches",
    category="udf",
    description="mapInArrow batch kernel: zero-copy L2 norms + dominant dimension over the embedding column",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS INTEGER) AS dim,
               FLOOR(sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 10000.0 + 0.5)
                   / 10000.0 AS l2_norm,
               CAST(list_position(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
                    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))))
                   AS INTEGER) AS dominant_dim
        FROM embeddings
        ORDER BY vec_id
    """,
)
def udf_arrow_map_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow-NATIVE UDF surface (``mapInArrow``, Spark 3.3+) —
    completing the Python-execution row the pandas entries started:
    where a pandas UDF pays Series construction per column per batch,
    mapInArrow hands the kernel raw ``pyarrow.RecordBatch``es, and a
    fixed-width list column flattens to an (n, d) numpy view with zero
    per-row Python — the right call shape for numeric kernels over
    embedding columns (norms here; the same skeleton carries
    quantization, distance blocks, or feature extraction).

    Parity note: squares accumulate SEQUENTIALLY in float64, the same
    left-fold order as the oracle's list_sum, so the norms are
    bit-identical cross-engine before the belt-and-braces floor-round;
    dominant_dim is exact (both argmax and list_position take the FIRST
    maximum, emitted 1-based).

    Plan shape: one ArrowEvalPython-free mapInArrow stage, batch-local,
    no shuffle; partition-parallel at any scale."""
    from spark_jdbc_limit_spark.operators.relational import round_dbl

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = emb.mapInArrow(
        _arrow_norm_batches,
        "vec_id long, dim int, l2_norm double, dominant_dim int",
    )
    return out.select(
        "vec_id",
        "dim",
        round_dbl(F.col("l2_norm"), 4).alias("l2_norm"),
        "dominant_dim",
    ).orderBy("vec_id")


def _make_cents_sum_udaf():
    """Grouped-agg pandas UDAF returning an exact int64 cents sum — built
    for WINDOW use: int64 accumulation is order-independent (unlike the
    float UDAF above), so the windowed result hash-matches SQL exactly."""

    @F.pandas_udf("long")
    def cents_sum(cents: pd.Series) -> int:
        return int(cents.sum())

    return cents_sum


@query(
    "udf_pandas_window_agg",
    category="udf",
    description="pandas grouped-agg UDAF applied AS A WINDOW FUNCTION: segment revenue share per customer",
    oracle="""
        WITH rev AS (
            SELECT o.o_custkey, c.c_mktsegment,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100)
                        AS BIGINT) AS cents
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY 1, 2
        )
        SELECT o_custkey, c_mktsegment,
               cents AS revenue_cents,
               CAST(SUM(cents) OVER (PARTITION BY c_mktsegment) AS BIGINT)
                   AS segment_cents,
               FLOOR((CAST(cents AS DOUBLE)
                      / SUM(cents) OVER (PARTITION BY c_mktsegment))
                     * 1000000.0 + 0.5) / 1000000.0 AS segment_share
        FROM rev ORDER BY o_custkey
    """,
)
def udf_pandas_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one Python-extension execution path the family did not yet
    cover: a grouped-aggregate pandas UDAF invoked OVER A WINDOW
    (Spark ships the whole partition's column to Python as one Arrow
    batch per window partition and broadcasts the scalar back to its
    rows). The UDAF accumulates exact int64 CENTS, so unlike a float
    UDAF the windowed total is order-independent and the oracle's SQL
    window SUM must match bit-for-bit — machinery verification with no
    tolerance. The share is then one double division per row.

    Plan shape: one join + partial-aggregated rollup to customer grain,
    then a window per segment whose Python cost is one Arrow batch per
    segment (5 here; entity-bounded). In production you'd only pay the
    Python hop for semantics SQL lacks — this entry exists to pin that
    the hop itself is lossless."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rev = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")),
               o["o_custkey"] == F.col("c_custkey"))
        .groupBy("o_custkey", "c_mktsegment")
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("cents")
        )
    )
    from pyspark.sql import Window as W

    cents_sum = _make_cents_sum_udaf()
    w = W.partitionBy("c_mktsegment")
    seg = cents_sum(F.col("cents")).over(w)
    return rev.select(
        "o_custkey",
        "c_mktsegment",
        F.col("cents").alias("revenue_cents"),
        seg.alias("segment_cents"),
        (F.floor((F.col("cents").cast("double") / seg) * 1000000.0 + 0.5) / 1000000.0).alias(
            "segment_share"
        ),
    ).orderBy("o_custkey")


#: polymorphic UDTF: number of leading tokens emitted as COLUMNS — the
#: literal argument analyze() reads to build the output schema.
UDTF_HEAD_K = 3


@query(
    "udtf_polymorphic_analyze",
    category="udf",
    description=f"Polymorphic Python UDTF (Spark 4 analyze()): output schema derived from a literal arg — first {UDTF_HEAD_K} tokens as columns",
    oracle=f"""
        SELECT doc_id,
               CAST(len(w) AS BIGINT) AS n_tokens,
               {", ".join(f"w[{i + 1}] AS tok_{i + 1}" for i in range(UDTF_HEAD_K))}
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        WHERE doc_id < 100
        ORDER BY doc_id
    """,
)
def udtf_polymorphic_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC UDTF (SPARK-44503, Spark 4): the output schema is not
    declared statically — a static ``analyze()`` method inspects the
    call-site arguments (here the literal k) and RETURNS the schema, so
    one registration serves any width. This is the table-function
    surface real feature extractors want ("give me the first k tokens
    as columns, k decided per query"); the static-returnType UDTF twin
    (udtf_word_ngrams) cannot express it. Missing tokens emit NULL,
    matching the oracle's out-of-range list access. Restricted to
    doc_id < 100 to keep the differential small; the UDTF itself is
    Arrow-batched row flow like any UDTF — one pass, no shuffle."""
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, udtf
    from pyspark.sql.types import LongType, StringType, StructType

    class HeadTokens:
        @staticmethod
        def analyze(doc_id: AnalyzeArgument, text: AnalyzeArgument, k: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType().add("doc_id", LongType()).add(
                "n_tokens", LongType()
            )
            for i in range(int(k.value)):
                schema = schema.add(f"tok_{i + 1}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, doc_id: int, text: str, k: int):
            toks = text.split(" ")
            yield (doc_id, len(toks), *(toks[i] if i < len(toks) else None for i in range(k)))

    spark.udtf.register("head_tokens_udtf", udtf(HeadTokens))
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    d.select("doc_id", "text").createOrReplaceTempView("docs_for_polymorphic_udtf")
    return spark.sql(
        f"""
        SELECT h.* FROM docs_for_polymorphic_udtf,
        LATERAL head_tokens_udtf(doc_id, text, {UDTF_HEAD_K}) h
        ORDER BY doc_id
        """
    )
