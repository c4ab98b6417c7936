"""Similarity search over the embeddings table (north-star LLM pipeline,
SURVEY.md §2B; build plan M5): brute-force cosine top-k as the exact
baseline, random-hyperplane LSH bucketing and an IVF-style partition
search as the scale paths.

Scale design:
- brute force is a broadcast of ONE query vector + a codegen'd
  aggregate over arrays — a full scan, perfectly parallel, no shuffle
  except the final top-k (TakeOrderedAndProject);
- hyperplane LSH assigns each vector a 16-bit bucket in one pass; ANN
  then searches only the query's bucket (and neighbors at Hamming ≤ r);
  hyperplanes are DETERMINISTIC pseudo-random ints so the oracle
  reproduces bucket assignment exactly;
- IVF: coarse centroids from a seeded ``pyspark.ml.clustering.KMeans``
  fit over unit vectors (fit once, cached per dataset, centers shipped
  by closure); vectors partitioned by nearest centroid; queries probe
  the nearest `nprobe` partitions. At 100 TB the partition becomes a
  parquet partition key → partition pruning turns ANN into a handful of
  file reads.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_jdbc_limit_spark.operators.registry import query
from spark_jdbc_limit_spark.operators.relational import round_dbl, sql_round_dbl
from spark_jdbc_limit_spark.sources.catalog import load_table

EMB_DIM = 64
QUERY_VEC_ID = 0
TOP_K = 10

LSH_PLANES = 16
#: deterministic pseudo-random hyperplane component for plane j, dim d:
#: ((1103515245 * (j*EMB_DIM + d) + 12345) mod 2^31) / 2^31 - 0.5
_LCG_A, _LCG_C, _LCG_M = 1103515245, 12345, 1 << 31


def _plane_component(j: int, d: int) -> float:
    return ((_LCG_A * (j * EMB_DIM + d) + _LCG_C) % _LCG_M) / _LCG_M - 0.5


def dot_cols(a, b) -> Column:
    """Dot product of two array<double> columns via zip_with + aggregate —
    JVM-side, no UDF."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _norm(col) -> Column:
    return F.sqrt(F.aggregate(F.transform(col, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))


def cosine_topk(embeddings: DataFrame, query_vec: list[float], k: int) -> DataFrame:
    """Exact top-k by cosine against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = _as_double(F.col("embedding"))
    cos = dot_cols(v, q) / (_norm(v) * _norm(q))
    return (
        embeddings.select("vec_id", cos.alias("cos_raw"))
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", round_dbl(F.col("cos_raw"), 4).alias("cos_sim"))
    )


def _bruteforce_topk_sql(extra_cols: str = "") -> str:
    """Exact cosine top-k oracle fragment, shared by the brute-force query
    and the IVF/PQ recall audits (single definition so the oracles cannot
    drift apart — the _DHASH_SQL lesson from ADVICE r6)."""
    return f"""
        WITH q AS (
            SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
            FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
        )
        SELECT vec_id,
               {sql_round_dbl(
                   'list_cosine_similarity(list_transform(embedding, x -> CAST(x AS DOUBLE)), q.qv)', 4
               )} AS cos_sim{extra_cols}
        FROM embeddings, q
        WHERE vec_id <> {QUERY_VEC_ID}
        ORDER BY list_cosine_similarity(list_transform(embedding, x -> CAST(x AS DOUBLE)), q.qv) DESC,
                 vec_id
        LIMIT {TOP_K}
    """


@query(
    "ann_cosine_topk_bruteforce",
    category="llm_similarity",
    description=f"Exact cosine top-{TOP_K} for query vector vec_id={QUERY_VEC_ID}",
    oracle=_bruteforce_topk_sql(),
)
def ann_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The query vector is fetched once on the driver (it is a query
    PARAMETER, not data) and inlined as a literal → broadcast to every
    task; the scan + dot product stay in whole-stage codegen and the
    top-k is TakeOrderedAndProject (no global sort)."""
    e = load_table(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").head()[0]
    return cosine_topk(e.filter(F.col("vec_id") != QUERY_VEC_ID), [float(x) for x in qv], TOP_K)


def _sql_plane_dot(j: int) -> str:
    comps = " + ".join(
        f"CAST(embedding[{d + 1}] AS DOUBLE) * {_plane_component(j, d)!r}" for d in range(EMB_DIM)
    )
    return f"({comps})"


#: (LSH_PLANES, EMB_DIM) hyperplane matrix, deterministic — shipped to
#: executors inside the pandas_udf closure (a few KB, cheaper than any
#: broadcast machinery).
_PLANES = np.array(
    [[_plane_component(j, d) for d in range(EMB_DIM)] for j in range(LSH_PLANES)],
    dtype=np.float64,
)
_PLANE_WEIGHTS = np.int64(1) << np.arange(LSH_PLANES, dtype=np.int64)


def hyperplane_bucket_udf():
    """16-bit LSH bucket from deterministic hyperplane signs (pandas_udf,
    built lazily — decorating at import time needs a live session).

    One Arrow batch → one (n, dim) @ (dim, planes) matrix product; the
    per-plane higher-order-function formulation costs
    planes × dim interpreted lambda evals per ROW (~2M per 1k rows) —
    the GEMM is ~20× faster. GEMM and the oracle's sequential sum order
    floats differently, so a dot near 0 could flip sign; soundness on the
    compared data is VERIFIED, not assumed — tests/test_llm_ops.py::
    test_float_decision_margins_on_oracle_data pins min |dot| > 1e-6,
    ~6 orders above the accumulation error."""

    @F.pandas_udf("long")
    def bucket(emb: pd.Series) -> pd.Series:
        v = np.stack(emb.to_numpy()).astype(np.float64)
        signs = (v @ _PLANES.T) > 0
        return pd.Series((signs @ _PLANE_WEIGHTS).astype(np.int64))

    return bucket


@query(
    "ann_lsh_hyperplane_buckets",
    category="llm_similarity",
    description=f"{LSH_PLANES}-bit random-hyperplane LSH bucket per vector",
    oracle=f"""
        SELECT vec_id,
               CAST({" + ".join(
                   f"(CASE WHEN {_sql_plane_dot(j)} > 0 THEN {1 << j} ELSE 0 END)"
                   for j in range(LSH_PLANES)
               )} AS BIGINT) AS bucket
        FROM embeddings
        ORDER BY vec_id
    """,
)
def ann_lsh_hyperplane_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign of ⟨v, r_j⟩ for 16 deterministic pseudo-random hyperplanes →
    one int bucket. Cosine-similar vectors collide with high probability;
    ANN search probes the query's bucket (plus Hamming-1 neighbors for
    recall). One scan, no shuffle."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", hyperplane_bucket_udf()("embedding").alias("bucket"))


def _sql_bucket_expr() -> str:
    return (
        "CAST("
        + " + ".join(
            f"(CASE WHEN {_sql_plane_dot(j)} > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(LSH_PLANES)
        )
        + " AS BIGINT)"
    )


@query(
    "ann_lsh_probe_topk",
    category="llm_similarity",
    description=f"LSH ANN: probe query bucket + Hamming-1 neighbors, exact rerank",
    oracle=f"""
        WITH b AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                   {_sql_bucket_expr()} AS bucket
            FROM embeddings
        ),
        q AS (SELECT bucket AS qb, v AS qv FROM b WHERE vec_id = {QUERY_VEC_ID})
        SELECT b.vec_id,
               {sql_round_dbl('list_cosine_similarity(b.v, q.qv)', 4)} AS cos_sim
        FROM b, q
        WHERE b.vec_id <> {QUERY_VEC_ID}
          AND bit_count(xor(b.bucket, q.qb)) <= 1
        ORDER BY list_cosine_similarity(b.v, q.qv) DESC, b.vec_id
        LIMIT {TOP_K}
    """,
)
def ann_lsh_probe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full LSH ANN search, end to end: bucket every vector (one scan,
    shuffle-free), probe only the query's bucket plus its 16 Hamming-1
    neighbors (multi-probe doubles recall at negligible cost), exact
    cosine rerank inside the probe set. At 100 TB the bucket is a parquet
    partition key, so probing = partition pruning: the scan reads
    ~17/65536 of the corpus. Deterministic hyperplanes → the oracle
    reproduces bucket assignment and the probe set exactly."""
    e = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in e.filter(F.col("vec_id") == QUERY_VEC_ID).head()["embedding"]]
    signs = (np.asarray(qv, dtype=np.float64) @ _PLANES.T) > 0
    q_bucket = int(signs @ _PLANE_WEIGHTS)
    bucketed = e.select("vec_id", "embedding", hyperplane_bucket_udf()("embedding").alias("bucket"))
    cand = bucketed.filter(
        (F.col("vec_id") != QUERY_VEC_ID)
        & (F.bit_count(F.col("bucket").bitwiseXOR(F.lit(q_bucket))) <= 1)
    )
    return cosine_topk(cand.select("vec_id", "embedding"), qv, TOP_K)


IVF_CENTROIDS = 16
IVF_NPROBE = 4


_KMEANS_SEED = 42
_KMEANS_MAX_ITER = 20
#: fitted centroid matrices keyed by the dataset's input files — the
#: "fit once, broadcast" posture: at 100 TB the quantizer is trained
#: offline (optionally on a sample) and only the (k, dim) float matrix
#: ships with the query, never the training job.
_IVF_CENTROID_CACHE: dict[tuple[tuple[str, ...], int], np.ndarray] = {}


def fit_ivf_centroids(embeddings: DataFrame, k: int = IVF_CENTROIDS) -> np.ndarray:
    """IVF coarse quantizer: ``pyspark.ml.clustering.KMeans`` over
    L2-normalized vectors (spherical k-means — Euclidean distance on unit
    vectors is monotone in cosine, matching the cosine assignment below).
    Fixed seed → reproducible centers for a given dataset. Returns the
    (k, dim) centroid matrix, cached per (input-file set, k) so repeated
    queries reuse one fit. ``k`` defaults to the module's fixed
    IVF_CENTROIDS; the kNN-join scale path passes a corpus-derived count
    so cell SIZE stays bounded as the corpus grows."""
    key = (tuple(sorted(embeddings.inputFiles())), k)
    cached = _IVF_CENTROID_CACHE.get(key) if key[0] else None
    if cached is not None:
        return cached
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = _as_double(F.col("embedding"))

    # L2-normalize in ONE Arrow-batched numpy pass. The column-expression
    # form `transform(v, x -> x / norm(v))` is the expression-re-evaluation
    # trap text.grams3 documents: CollapseProject inlines a single-use
    # `norm(v)` alias into the lambda, where it re-runs the O(d) aggregate
    # per ELEMENT — O(d²) per row over the whole training input.
    @F.pandas_udf("array<double>")
    def unit_udf(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        return pd.Series(list(m))

    unit = embeddings.select(array_to_vector(unit_udf(v)).alias("features"))
    model = KMeans(k=k, seed=_KMEANS_SEED, maxIter=_KMEANS_MAX_ITER).fit(unit)
    centers = np.stack([np.asarray(c, dtype=np.float64) for c in model.clusterCenters()])
    if key[0]:
        _IVF_CENTROID_CACHE[key] = centers
    return centers


def ivf_assignments(embeddings: DataFrame) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """IVF coarse quantizer assignment: nearest (by cosine) KMeans
    centroid per vector, computed as one Arrow-batched GEMM per batch
    against the broadcast-by-closure centroid matrix. Returns
    (assignments df, [(centroid_id, centroid_vector), ...])."""
    c = fit_ivf_centroids(embeddings)
    cents = [(i, [float(x) for x in c[i]]) for i in range(len(c))]
    cent_ids = np.arange(len(c), dtype=np.int64)
    cn = c / np.linalg.norm(c, axis=1, keepdims=True)

    # All IVF_CENTROIDS cosines in ONE Arrow-batched matrix product per
    # batch (the per-centroid column-expression plan evaluates
    # centroids × dim interpreted lambdas per row). argmax takes the FIRST
    # maximum → ties break to the smallest centroid id, same as the
    # column-wise greatest()/when() chain it replaces.
    @F.pandas_udf("long")
    def assign_udf(emb: pd.Series) -> pd.Series:
        v = np.stack(emb.to_numpy()).astype(np.float64)
        u = v / np.linalg.norm(v, axis=1, keepdims=True)
        return pd.Series(cent_ids[(u @ cn.T).argmax(axis=1)])

    assigned = embeddings.withColumn("centroid_id", assign_udf("embedding"))
    return assigned, cents


#: minimum |IVF-top-k ∩ exact-top-k| for the in-query recall boolean.
#: Observed overlap across sf0.001/0.01/0.1 is 4-5 of 10 (single-query
#: recall on this clusterless synthetic corpus is inherently modest —
#: the averaged-recall test pins ≥0.5 over ~50 queries); 3 leaves margin.
IVF_RECALL_MIN_HITS = 3


def ivf_topk_frame(
    spark: SparkSession, sf_dir: str, qv: list[float] | None = None
) -> DataFrame:
    """The IVF ANN search itself: assign vectors to nearest coarse
    centroid, probe the query's IVF_NPROBE nearest centroids,
    exact-rerank inside them. At scale the assignment is a parquet
    partition key and probing = partition pruning. ``qv`` lets a caller
    that already fetched the query vector skip the duplicate 1-row
    parameter scan (optimization round 15: the recall audit fetched the
    same vector twice — one of its four warm build jobs)."""
    e = load_table(spark, sf_dir, "embeddings")
    assigned, cents = ivf_assignments(e)
    if qv is None:
        qv = [float(x) for x in e.filter(F.col("vec_id") == QUERY_VEC_ID).head()["embedding"]]

    def cos_py(a: list[float], b: list[float]) -> float:
        num = sum(x * y for x, y in zip(a, b))
        den = (sum(x * x for x in a) ** 0.5) * (sum(y * y for y in b) ** 0.5)
        return num / den

    probe = sorted(cents, key=lambda c: (-cos_py(qv, c[1]), c[0]))[:IVF_NPROBE]
    probe_ids = [cid for cid, _ in probe]
    cand = assigned.filter(
        F.col("centroid_id").isin(probe_ids) & (F.col("vec_id") != QUERY_VEC_ID)
    )
    return cosine_topk(cand, qv, TOP_K)


@query(
    "ann_ivf_topk",
    category="llm_similarity",
    description=f"IVF ANN recall audit: probe {IVF_NPROBE}/{IVF_CENTROIDS} partitions, exact rerank, in-query recall vs brute force",
    oracle=_bruteforce_topk_sql(",\n               TRUE AS ivf_recall_ok"),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-verifiable IVF audit (``ann_pq_rerank_audit`` discipline):
    k-means centroids are not ANSI-SQL-reproducible, so instead of
    emitting the structural IVF result this query runs BOTH the IVF
    search (``ivf_topk_frame`` — the real machinery, also exercised
    end-to-end by tests/test_llm_ops.py) and the exact brute-force
    top-k, then emits the exact rows plus one boolean:
    |IVF ∩ exact| >= IVF_RECALL_MIN_HITS. The oracle recomputes the
    exact top-k and asserts TRUE, so a hash match proves in-engine that
    the probe path surfaced the exact neighbors it claims to.

    Physical plan: both arms are TakeOrderedAndProject over one scan
    each; the overlap is a {TOP_K}-row semi join counted into a 1-row
    relation broadcast onto the output — driver traffic is the top-k
    only."""
    e = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in e.filter(F.col("vec_id") == QUERY_VEC_ID).head()["embedding"]]
    exact = cosine_topk(e.filter(F.col("vec_id") != QUERY_VEC_ID), qv, TOP_K)
    ivf_ids = ivf_topk_frame(spark, sf_dir, qv=qv).select("vec_id")
    hits = exact.join(ivf_ids, "vec_id", "left_semi").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return exact.crossJoin(F.broadcast(hits)).select(
        "vec_id",
        "cos_sim",
        (F.col("n_hits") >= IVF_RECALL_MIN_HITS).alias("ivf_recall_ok"),
    )


@query(
    "embedding_centroid_norms",
    category="llm_similarity",
    description="Per-label centroid norm + dispersion via posexplode/elementwise avg",
    oracle=f"""
        WITH d AS (
            SELECT label, i,
                   AVG(CAST(embedding[i] AS DOUBLE)) AS m,
                   COUNT(*) AS c
            FROM embeddings, range(1, {EMB_DIM + 1}) t(i)
            GROUP BY label, i
        )
        SELECT CAST(label AS INT) AS label,
               CAST(MAX(c) AS BIGINT) AS n_vecs,
               {sql_round_dbl('SQRT(SUM(m * m))', 3)} AS centroid_norm
        FROM d
        GROUP BY label
        ORDER BY label
    """,
)
def embedding_centroid_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise vector aggregation — the building block of k-means
    assignment-update, IVF coarse-centroid refresh, and class prototypes.
    posexplode → (label, dim) hash agg → 64-row-per-label regroup: the
    shuffle carries labels × dims partial sums, never raw vectors, and the
    explode is pipelined inside the scan stage (no materialized 64× blowup
    on disk). Mean in double rounded to 3 — same tolerance posture as the
    cosine queries; test_float_decision_margins_on_oracle_data pins the
    rounding margin (no per-label norm within 1e-6 of a .5 boundary at
    3 decimals on the compared data)."""
    e = load_table(spark, sf_dir, "embeddings")
    exploded = e.select(
        "label", F.posexplode(F.col("embedding")).alias("i", "x")
    ).select("label", "i", F.col("x").cast("double").alias("x"))
    per_dim = exploded.groupBy("label", "i").agg(
        F.avg("x").alias("m"), F.count(F.lit(1)).alias("c")
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.max("c").alias("n_vecs"),
            round_dbl(F.sqrt(F.sum(F.col("m") * F.col("m"))), 3).alias("centroid_norm"),
        )
        .select(F.col("label").cast("int").alias("label"), "n_vecs", "centroid_norm")
        .orderBy("label")
    )


@query(
    "embedding_dim_stats",
    category="llm_similarity",
    description="Per-dimension mean/std/min/max over the embedding matrix",
    oracle=f"""
        WITH flat AS (
            SELECT unnest(range(len(embedding))) AS dim,
                   unnest(CAST(embedding AS DOUBLE[])) AS val
            FROM embeddings
        )
        SELECT dim, COUNT(*) AS n,
               {sql_round_dbl('AVG(val)', 4)} AS mean_val,
               {sql_round_dbl('STDDEV_SAMP(val)', 4)} AS std_val,
               {sql_round_dbl('MIN(val)', 4)} AS min_val,
               {sql_round_dbl('MAX(val)', 4)} AS max_val
        FROM flat
        GROUP BY dim
        ORDER BY dim
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-matrix QA (drift detection, whitening inputs): per-dimension
    count/mean/std/min/max. ``posexplode`` keeps the dimension index without
    a join; the downstream hash aggregate has EMB_DIM distinct keys, so
    map-side partial aggregation reduces each scan task to EMB_DIM rows and
    the shuffle is negligible at any corpus size — the same partial-agg
    shape as embedding_centroid_norms. Values are cast to double BEFORE
    aggregation so both engines accumulate in f64."""
    e = load_table(spark, sf_dir, "embeddings")
    flat = e.select(
        F.posexplode("embedding").alias("dim", "fval")
    ).select(F.col("dim").cast("long").alias("dim"), F.col("fval").cast("double").alias("val"))
    return (
        flat.groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            round_dbl(F.avg("val")).alias("mean_val"),
            round_dbl(F.stddev_samp("val")).alias("std_val"),
            round_dbl(F.min("val")).alias("min_val"),
            round_dbl(F.max("val")).alias("max_val"),
        )
        # no trailing sort: the harness compares order-insensitively
    )


# --- Product quantization (PQ) ANN ----------------------------------------
PQ_M = 8  #: subspaces (EMB_DIM/PQ_M dims each)
PQ_K = 16  #: codes per subspace → 4 bits/subspace, 8 bytes/vector total
PQ_SAMPLE = 2048  #: training sample size for the codebooks
PQ_ADC_CANDIDATES = 50  #: ADC shortlist size fed to the exact reranker

_PQ_CODEBOOK_CACHE: dict[tuple[str, ...], np.ndarray] = {}


def fit_pq_codebooks(embeddings: DataFrame) -> np.ndarray:
    """Product-quantization codebooks: per-subspace Lloyd's k-means over a
    deterministic hash-ordered sample of L2-normalized vectors.

    The fit is driver-side numpy ON A BOUNDED SAMPLE (PQ_SAMPLE rows ×
    EMB_DIM floats — ~1 MB regardless of corpus size): at 100 TB the
    quantizer is always trained offline on a sample and only the
    (M, K, dim/M) codebook tensor — 4 KB here — ships with queries. The
    hash ordering (xxhash64 of vec_id) makes the sample reproducible and
    unbiased by file layout. Returns codebooks shaped (PQ_M, PQ_K, sub)."""
    key = tuple(sorted(embeddings.inputFiles()))
    cached = _PQ_CODEBOOK_CACHE.get(key) if key else None
    if cached is not None:
        return cached
    rows = (
        embeddings.select("vec_id", "embedding")
        .orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(PQ_SAMPLE)
        .collect()
    )
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    sub_dim = EMB_DIM // PQ_M
    rng = np.random.default_rng(_KMEANS_SEED)
    books = np.empty((PQ_M, PQ_K, sub_dim))
    for m in range(PQ_M):
        sub = X[:, m * sub_dim : (m + 1) * sub_dim]
        centers = sub[rng.choice(len(sub), PQ_K, replace=False)].copy()
        for _ in range(_KMEANS_MAX_ITER):
            d2 = ((sub[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            moved = False
            for c in range(PQ_K):
                pts = sub[assign == c]
                if len(pts):
                    nc = pts.mean(axis=0)
                    if not np.allclose(nc, centers[c]):
                        centers[c] = nc
                        moved = True
            if not moved:
                break
        books[m] = centers
    if key:
        _PQ_CODEBOOK_CACHE[key] = books
    return books


#: minimum |PQ-top-k ∩ exact-top-k| for the in-query recall boolean.
#: Observed overlap across sf0.001/0.01/0.1 is 5-8 of 10; the separate
#: averaged test pins shortlist recall ≥0.5; 4 leaves margin here.
PQ_RECALL_MIN_HITS = 4


def pq_topk_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN, the standard billion-vector technique:
    encode every vector as PQ_M 4-bit codes (8 bytes — 32× smaller than
    the raw float32 vector, so a 100 TB embedding corpus's codes fit in
    ~3 TB of cluster RAM), score candidates with one asymmetric-distance
    (ADC) table lookup per subspace, exact-rerank the ADC shortlist.

    Both the encoder and the scorer are single Arrow-batched pandas UDFs
    doing one numpy GEMM / fancy-index per batch against the
    broadcast-by-closure codebooks; the ADC shortlist uses
    TakeOrderedAndProject (no global sort), and only PQ_ADC_CANDIDATES
    rows reach the exact reranker. Recall@k vs the brute-force baseline
    is pinned by tests/test_llm_ops.py. The Lloyd's-fitted codebooks are
    not ANSI-SQL-reproducible, so the registered ``ann_pq_topk`` entry
    wraps this frame in an in-query recall audit vs brute force; the
    SAME encode → ADC-LUT → shortlist → exact-rerank machinery also gets
    its full three-way driver check through ``ann_pq_rerank_audit``,
    whose hash-sampled codebooks ARE SQL-expressible."""
    e = load_table(spark, sf_dir, "embeddings")
    books = fit_pq_codebooks(e)
    sub_dim = EMB_DIM // PQ_M
    qv = [float(x) for x in e.filter(F.col("vec_id") == QUERY_VEC_ID).head()["embedding"]]
    q = np.asarray(qv, dtype=np.float64)
    q = q / np.linalg.norm(q)
    # ADC lookup table: LUT[m, k] = <q_sub[m], codebook[m][k]>
    lut = np.einsum("md,mkd->mk", q.reshape(PQ_M, sub_dim), books)

    @F.pandas_udf("array<tinyint>")
    def encode_udf(emb: pd.Series) -> pd.Series:
        v = np.stack(emb.to_numpy()).astype(np.float64)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        codes = np.empty((len(v), PQ_M), dtype=np.int8)
        for m in range(PQ_M):
            sub = v[:, m * sub_dim : (m + 1) * sub_dim]
            # argmin ||sub - C||² = argmin (||C||² - 2 sub·Cᵀ) per row
            d2 = (books[m] ** 2).sum(axis=1)[None, :] - 2.0 * (sub @ books[m].T)
            codes[:, m] = d2.argmin(axis=1).astype(np.int8)
        return pd.Series(list(codes))

    @F.pandas_udf("double")
    def adc_udf(codes: pd.Series) -> pd.Series:
        c = np.stack(codes.to_numpy()).astype(np.int64)
        return pd.Series(lut[np.arange(PQ_M)[None, :], c].sum(axis=1))

    encoded = e.filter(F.col("vec_id") != QUERY_VEC_ID).select(
        "vec_id", "embedding", encode_udf("embedding").alias("pq_codes")
    )
    shortlist = (
        encoded.select("vec_id", "embedding", adc_udf("pq_codes").alias("adc_score"))
        .orderBy(F.col("adc_score").desc(), "vec_id")
        .limit(PQ_ADC_CANDIDATES)
    )
    return cosine_topk(shortlist.select("vec_id", "embedding"), qv, TOP_K)


@query(
    "ann_pq_topk",
    category="llm_similarity",
    description=f"PQ ANN recall audit: {PQ_M}x{PQ_K}-code ADC shortlist of {PQ_ADC_CANDIDATES}, exact rerank, in-query recall vs brute force",
    oracle=_bruteforce_topk_sql(",\n               TRUE AS pq_recall_ok"),
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-verifiable PQ audit (same shape as ``ann_ivf_topk``): runs
    the real PQ pipeline (``pq_topk_frame``) AND the exact brute-force
    top-k, emits the exact rows plus |PQ ∩ exact| >= PQ_RECALL_MIN_HITS.
    The oracle recomputes the exact top-k with TRUE, so the driver's
    hash verifies the quantizer's recall in-engine every round."""
    e = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in e.filter(F.col("vec_id") == QUERY_VEC_ID).head()["embedding"]]
    exact = cosine_topk(e.filter(F.col("vec_id") != QUERY_VEC_ID), qv, TOP_K)
    pq_ids = pq_topk_frame(spark, sf_dir).select("vec_id")
    hits = exact.join(pq_ids, "vec_id", "left_semi").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return exact.crossJoin(F.broadcast(hits)).select(
        "vec_id",
        "cos_sim",
        (F.col("n_hits") >= PQ_RECALL_MIN_HITS).alias("pq_recall_ok"),
    )


_PQ_SUB = EMB_DIM // PQ_M
#: sample-codebook anchor key: (A*vec_id + C) mod 2^31 — pure int64
#: arithmetic, identical in Spark and DuckDB (no overflow for
#: vec_id < 2^33, far above any shipped or projected id range).
_PQ_AUDIT_KEY = f"(({_LCG_A} * vec_id + {_LCG_C}) % {_LCG_M})"


def _pq_audit_oracle() -> str:
    sub = _PQ_SUB
    return f"""
        WITH nv AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)
                       / sqrt(list_sum(list_transform(embedding,
                             y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))))
                       AS v
            FROM embeddings
        ),
        anch AS (
            SELECT v, rn - 1 AS k FROM (
                SELECT v, ROW_NUMBER() OVER (
                           ORDER BY {_PQ_AUDIT_KEY}, vec_id) AS rn
                FROM nv
            ) WHERE rn <= {PQ_K}
        ),
        subs AS (SELECT UNNEST(range(0, {PQ_M})) AS m),
        dists AS (
            SELECT n.vec_id, s.m, a.k,
                   list_distance(list_slice(n.v, s.m * {sub} + 1, (s.m + 1) * {sub}),
                                 list_slice(a.v, s.m * {sub} + 1, (s.m + 1) * {sub}))
                       AS dist
            FROM nv n CROSS JOIN subs s CROSS JOIN anch a
            WHERE n.vec_id <> {QUERY_VEC_ID}
        ),
        codes AS (
            SELECT vec_id, m, k FROM (
                SELECT vec_id, m, k,
                       ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                          ORDER BY dist, k) AS rk
                FROM dists
            ) WHERE rk = 1
        ),
        qn AS (SELECT v AS qv FROM nv WHERE vec_id = {QUERY_VEC_ID}),
        adc AS (
            SELECT c.vec_id,
                   SUM(list_inner_product(
                       list_slice(q.qv, c.m * {sub} + 1, (c.m + 1) * {sub}),
                       list_slice(a.v, c.m * {sub} + 1, (c.m + 1) * {sub})))
                       AS adc_raw
            FROM codes c JOIN anch a ON a.k = c.k CROSS JOIN qn q
            GROUP BY c.vec_id
        ),
        short AS (
            SELECT vec_id, adc_raw FROM adc
            ORDER BY adc_raw DESC, vec_id LIMIT {PQ_ADC_CANDIDATES}
        ),
        rerank AS (
            SELECT s.vec_id, s.adc_raw,
                   list_inner_product(n.v, q.qv) AS cos_raw
            FROM short s JOIN nv n ON n.vec_id = s.vec_id CROSS JOIN qn q
        )
        SELECT vec_id,
               {sql_round_dbl('adc_raw', 4)} AS adc_est,
               {sql_round_dbl('cos_raw', 4)} AS cos_sim,
               CAST(rr AS BIGINT) AS rerank_rank,
               CAST(CASE WHEN rr <= {TOP_K} THEN 1 ELSE 0 END AS INT) AS promoted
        FROM (
            SELECT *, ROW_NUMBER() OVER (ORDER BY cos_raw DESC, vec_id) AS rr
            FROM rerank
        )
    """


@query(
    "ann_pq_rerank_audit",
    category="llm_similarity",
    description=f"PQ rerank audit: sample-codebook ADC shortlist of {PQ_ADC_CANDIDATES} with exact cosines + rerank ranks, SQL-reproducible end-to-end",
    oracle=_pq_audit_oracle(),
)
def ann_pq_rerank_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-accuracy audit for the PQ ANN stack (the embedding-side
    twin of ``dedup_minhash_estimate_audit``): the full
    encode → ADC-LUT → shortlist → exact-rerank pipeline of
    ``ann_pq_topk``, emitted per SHORTLIST member as (ADC estimate,
    exact cosine, rerank rank, promoted-to-top-{TOP_K} flag) so the
    rerank stage's behavior — which candidates the sketch surfaced and
    which the exact pass kept — is value-verified end to end. The one
    substitution that makes the DECISION chain ANSI-SQL-reproducible:
    codebooks are a deterministic hash-ordered SAMPLE ({PQ_K} anchor
    vectors by affine key (A·vec_id + C) mod 2³¹, each subspace using
    the anchors' m-th subvector) instead of Lloyd's k-means — sampled
    init IS the first step of k-means, quantization quality is the only
    delta, and that quality is exactly what the emitted
    estimate-vs-exact columns measure. Argmin code assignment, the
    shortlist cut, and the rerank order are float comparisons made
    independently by both engines; every such margin on the shipped SFs
    is ≥ ~5e-7 (pinned by tests/test_llm_ops.py::test_pq_audit_margins),
    ~8 orders above cross-engine accumulation error, so the decisions
    are stable.

    Physical plan: anchors + the query vector are driver-side bounded
    collects (16 + 1 rows — query PARAMETERS, same posture as the PQ
    codebook sample); encode + ADC is ONE Arrow-batched pandas UDF per
    scan task (numpy distance GEMM against the 16×{EMB_DIM} anchor
    matrix in closure); the shortlist is TakeOrderedAndProject; the
    rerank window runs over {PQ_ADC_CANDIDATES} rows. At 100 TB the
    scan+UDF is embarrassingly parallel and the only driver traffic is
    the {PQ_ADC_CANDIDATES}-row shortlist."""
    e = load_table(spark, sf_dir, "embeddings")
    key = (F.lit(_LCG_A) * F.col("vec_id") + F.lit(_LCG_C)) % F.lit(_LCG_M)
    anchor_rows = (
        e.select("vec_id", "embedding", key.alias("k_"))
        .orderBy("k_", "vec_id")
        .limit(PQ_K)
        .collect()
    )
    A = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in anchor_rows]
    )
    # zero-norm clamp (semdedup lesson, ADVICE r5): a degenerate vector
    # must not inject NaNs that silently poison later comparisons
    A /= np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-300)
    qv = np.asarray(
        e.filter(F.col("vec_id") == QUERY_VEC_ID).head()["embedding"],
        dtype=np.float64,
    )
    q = qv / np.linalg.norm(qv)
    sub = _PQ_SUB
    # ADC LUT: lut[m, k] = <q_sub[m], anchor_k_sub[m]>
    lut = np.einsum(
        "md,kmd->mk", q.reshape(PQ_M, sub), A.reshape(PQ_K, PQ_M, sub)
    )

    @F.pandas_udf("double")
    def adc_udf(emb: pd.Series) -> pd.Series:
        v = np.stack(emb.to_numpy()).astype(np.float64)
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-300)
        adc = np.zeros(len(v))
        for m in range(PQ_M):
            sv = v[:, m * sub : (m + 1) * sub]
            av = A[:, m * sub : (m + 1) * sub]
            # full ||s - c||² (same quantity the oracle's list_distance
            # orders by, modulo the monotone sqrt) — argmin ties break
            # to the lowest k in both engines (np.argmin / ORDER BY k)
            d2 = ((sv[:, None, :] - av[None, :, :]) ** 2).sum(axis=2)
            adc += lut[m, d2.argmin(axis=1)]
        return pd.Series(adc)

    shortlist = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "embedding", adc_udf("embedding").alias("adc_raw"))
        .orderBy(F.col("adc_raw").desc(), "vec_id")
        .limit(PQ_ADC_CANDIDATES)
    )
    vd = _as_double(F.col("embedding"))
    cos = dot_cols(vd, F.array(*[F.lit(float(x)) for x in q])) / _norm(vd)
    reranked = shortlist.select(
        "vec_id", "adc_raw", cos.alias("cos_raw")
    )
    from pyspark.sql import Window as W

    rr = F.row_number().over(
        W.orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
    )
    return reranked.select(
        "vec_id",
        round_dbl(F.col("adc_raw"), 4).alias("adc_est"),
        round_dbl(F.col("cos_raw"), 4).alias("cos_sim"),
        rr.cast("long").alias("rerank_rank"),
    ).withColumn(
        "promoted", (F.col("rerank_rank") <= TOP_K).cast("int")
    )


KMEANS_STEP_K = 8  #: clusters for the verifiable Lloyd-step operator


def _kmeans_step_oracle() -> str:
    return f"""
        WITH nv AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)
                       / sqrt(list_sum(list_transform(embedding,
                             y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))))
                       AS v
            FROM embeddings
        ),
        anch AS (
            SELECT v, rn - 1 AS k FROM (
                SELECT v, ROW_NUMBER() OVER (
                           ORDER BY {_PQ_AUDIT_KEY}, vec_id) AS rn
                FROM nv
            ) WHERE rn <= {KMEANS_STEP_K}
        ),
        dists AS (
            SELECT n.vec_id, n.v, a.k, list_distance(n.v, a.v) AS dist
            FROM nv n CROSS JOIN anch a
        ),
        assign AS (
            SELECT vec_id, v, k, dist FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                             ORDER BY dist, k) AS rk
                FROM dists
            ) WHERE rk = 1
        ),
        flat AS (
            SELECT k, unnest(range(len(v))) AS dim, unnest(v) AS val
            FROM assign
        ),
        means AS (SELECT k, dim, AVG(val) AS m FROM flat GROUP BY k, dim),
        aflat AS (
            SELECT k, unnest(range(len(v))) AS dim, unnest(v) AS a
            FROM anch
        ),
        shift AS (
            SELECT m.k, SQRT(SUM((m.m - af.a) * (m.m - af.a))) AS sh
            FROM means m JOIN aflat af USING (k, dim)
            GROUP BY m.k
        ),
        stats AS (
            SELECT k, CAST(COUNT(*) AS BIGINT) AS n_members,
                   AVG(dist) AS ad
            FROM assign GROUP BY k
        )
        SELECT CAST(s.k AS INT) AS cluster, s.n_members,
               {sql_round_dbl('s.ad', 4)} AS avg_dist,
               {sql_round_dbl('sh.sh', 4)} AS centroid_shift
        FROM stats s JOIN shift sh ON sh.k = s.k
    """


@query(
    "cluster_kmeans_lloyd_step",
    category="llm_similarity",
    description=f"One verifiable k-means Lloyd step: {KMEANS_STEP_K} hash-seeded centroids, assignment + update metrics",
    oracle=_kmeans_step_oracle(),
)
def cluster_kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One FULL Lloyd iteration of k-means over the embedding corpus,
    instrumented the way a distributed clustering job reports progress:
    per cluster, the member count, the mean member→centroid distance
    (inertia contribution), and the centroid SHIFT the update step
    produces (the convergence signal real k-means loops watch). Initial
    centroids are the deterministic affine-hash-ordered sample (the
    ``ann_pq_rerank_audit`` seeding — k-means++'s 'sample your inits'
    step made ANSI-reproducible), so assignment, update, and both
    metrics are all verified value-by-value by the SQL oracle — the
    iterative-ML primitive with a correctness gate, not a spot check.

    Physical plan — the canonical distributed-k-means shape: centroids
    broadcast by closure (K×{EMB_DIM} floats); ONE ``mapInPandas`` pass
    computes each partition's assignments via a numpy distance GEMM and
    emits PRE-AGGREGATED partials (count, Σdist, Σvec per cluster — ≤
    {KMEANS_STEP_K} rows per task, the manual map-side combine), so the
    shuffle is K rows per scan task regardless of corpus size; the
    update (element-wise mean) and shift finish on the exploded
    K×{EMB_DIM}-row micro relation. Iterating = re-invoking with the
    updated centroids; at 100 TB each iteration costs one scan + a
    kilobyte-scale shuffle, and the assignment GEMM is the same kernel
    the IVF quantizer (``ivf_assignments``) fits with Spark ML. Ties
    and float margins: argmin breaks to the lowest k in both engines;
    distances are continuous (no boundary sitters — same tolerance
    posture as ann_pq_rerank_audit)."""
    e = load_table(spark, sf_dir, "embeddings")
    key = (F.lit(_LCG_A) * F.col("vec_id") + F.lit(_LCG_C)) % F.lit(_LCG_M)
    anchor_rows = (
        e.select("vec_id", "embedding", key.alias("k_"))
        .orderBy("k_", "vec_id")
        .limit(KMEANS_STEP_K)
        .collect()
    )
    A = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in anchor_rows]
    )
    A /= np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-300)
    K = KMEANS_STEP_K

    def partials(batches):
        n = np.zeros(K, dtype=np.int64)
        sum_dist = np.zeros(K)
        sum_vec = np.zeros((K, EMB_DIM))
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-300)
            # BLAS GEMM distance expansion (optimization round 14, guide
            # §4.4): |v|² + |a|² − 2·v@Aᵀ replaces the broadcasted
            # (batch, K, dim) subtraction tensor — same O(n·K·d) flops
            # through one dgemm instead of 8× the data in memory
            # traffic. Clamp at 0: rounding can push an exact-match
            # distance a few ulps negative, and sqrt must not NaN.
            # Distances are continuous on this corpus (no boundary
            # sitters — the pinned-margin posture above), so sub-ulp
            # kernel drift cannot move an argmin or a 4dp-rounded sum.
            vv = (v * v).sum(axis=1)[:, None]
            aa = (A * A).sum(axis=1)[None, :]
            d2 = np.maximum(vv + aa - 2.0 * (v @ A.T), 0.0)
            kk = d2.argmin(axis=1)
            dist = np.sqrt(d2[np.arange(len(v)), kk])
            np.add.at(n, kk, 1)
            np.add.at(sum_dist, kk, dist)
            np.add.at(sum_vec, kk, v)
        live = np.flatnonzero(n)
        yield pd.DataFrame(
            {
                "cluster": live.astype(np.int32),
                "n": n[live],
                "sum_dist": sum_dist[live],
                "sum_vec": list(sum_vec[live]),
            }
        )

    # Lineage cut: the partial relation (≤K rows per task) feeds THREE
    # branches (stats, per-dim sums, the n_members re-join); without it
    # each branch re-runs the corpus scan + Arrow pass.
    part = e.select("embedding").mapInPandas(
        partials,
        "cluster int, n long, sum_dist double, sum_vec array<double>",
    ).localCheckpoint(eager=False)
    stats = part.groupBy("cluster").agg(
        F.sum("n").alias("n_members"),
        F.sum("sum_dist").alias("sum_dist"),
    )
    per_dim = (
        part.select("cluster", F.posexplode("sum_vec").alias("dim", "s"))
        .groupBy("cluster", "dim")
        .agg(F.sum("s").alias("s"))
    )
    anchor_df = F.broadcast(
        spark.createDataFrame(
            [
                (int(k), int(d), float(A[k, d]))
                for k in range(K)
                for d in range(EMB_DIM)
            ],
            "cluster int, dim int, a double",
        )
    )
    shift = (
        per_dim.join(stats.select("cluster", "n_members"), "cluster")
        .join(anchor_df, ["cluster", "dim"])
        .select(
            "cluster",
            ((F.col("s") / F.col("n_members")) - F.col("a")).alias("delta"),
        )
        .groupBy("cluster")
        .agg(F.sqrt(F.sum(F.col("delta") * F.col("delta"))).alias("sh"))
    )
    return stats.join(shift, "cluster").select(
        "cluster",
        "n_members",
        round_dbl(F.col("sum_dist") / F.col("n_members"), 4).alias("avg_dist"),
        round_dbl(F.col("sh"), 4).alias("centroid_shift"),
    )


PCA_POWER_ITERS = 6  #: fixed power-iteration count for the top component


def _pca_oracle() -> str:
    steps = []
    prev = "v0"
    for k in range(1, PCA_POWER_ITERS + 1):
        steps.append(f"""
        w{k} AS (
            SELECT cov.i, SUM(cov.c * {prev}.x) AS w
            FROM cov JOIN {prev} ON {prev}.j = cov.j
            GROUP BY cov.i
        ),
        v{k} AS (
            SELECT i AS j, w / SQRT(SUM(w * w) OVER ()) AS x,
                   SQRT(SUM(w * w) OVER ()) AS lam
            FROM w{k}
        )""")
        prev = f"v{k}"
    return f"""
        WITH x AS (
            SELECT vec_id,
                   list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v
            FROM embeddings
        ),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM x),
        flat AS (
            SELECT vec_id, unnest(range(len(v))) AS i, unnest(v) AS xi
            FROM x
        ),
        mu AS (SELECT i, AVG(xi) AS m FROM flat GROUP BY i),
        cov AS (
            SELECT a.i AS i, b.i AS j,
                   SUM(a.xi * b.xi) / nn.n - ma.m * mb.m AS c
            FROM flat a JOIN flat b USING (vec_id) CROSS JOIN nn
            JOIN mu ma ON ma.i = a.i
            JOIN mu mb ON mb.i = b.i
            GROUP BY a.i, b.i, nn.n, ma.m, mb.m
        ),
        v0 AS (SELECT i AS j, 0.125 AS x FROM mu),{",".join(steps)}
        SELECT CAST(j AS BIGINT) AS dim,
               {sql_round_dbl('x', 4)} AS loading,
               {sql_round_dbl('lam', 4)} AS eigenvalue
        FROM v{PCA_POWER_ITERS}
    """


@query(
    "embedding_pca_power_iteration",
    category="llm_similarity",
    description=f"Distributed PCA: top principal component of the embedding covariance via {PCA_POWER_ITERS} power iterations",
    oracle=_pca_oracle(),
)
def embedding_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding matrix — the primitive
    under whitening, drift monitoring, and anisotropy diagnostics (LLM
    embedding spaces are notoriously anisotropic; the top component's
    eigenvalue share is the standard health number). Two distributed
    phases, both verified value-by-value:

    1. COVARIANCE in one corpus pass: each task's mapInPandas partial
       emits (count, Σx, ΣxxT) — the classic one-pass moment
       accumulation, a single {EMB_DIM}×{EMB_DIM} GEMM per Arrow batch,
       ONE partial row per task (~32 KB) regardless of corpus size.
       Partials combine into the (i, j, c) covariance micro relation
       via a positional explode + hash agg; C = Σxxᵀ/n − μμᵀ.
    2. POWER ITERATION on the micro relation: {PCA_POWER_ITERS} fixed
       steps of w = C·v (join + partial-agg) with the normalization
       computed as a WINDOW over the {EMB_DIM}-row vector relation —
       not a separate norm relation, which would make each iteration
       reference its predecessor twice and double the plan per step;
       the window keeps the DAG linear, so the whole fixpoint is one
       job (the PageRank lesson applied). Start vector 1/√{EMB_DIM} =
       0.125 exactly (a power of two — both engines iterate from
       bit-identical state); the returned eigenvalue is ‖C·v‖ at the
       final step (the Rayleigh estimate at convergence).

    At 100 TB phase 1 is scan-bound and embarrassingly parallel; phase
    2's cost is independent of corpus size entirely. What is verified
    is the fixed-budget power TRAJECTORY, not a convergence claim: both
    engines iterate the same {PCA_POWER_ITERS} steps from bit-identical
    state, so the comparison is well-defined whatever the spectrum —
    and on THIS synthetic corpus the spectrum is nearly isotropic
    (λ2/λ1 ≈ 0.98, pinned by tests), so the iterate is still rotating
    and the Rayleigh estimate sits at the bulk eigenvalue level. That
    reading is itself the diagnostic: a corpus with a dominant
    direction sends the estimate far above the bulk within a few
    steps; an isotropic one doesn't. Cross-engine float drift along
    the shared trajectory is ~1e-13 (GEMM vs SQL sum ordering),
    absorbed by the 1e-4 display round; sign is pinned by the shared
    deterministic start."""
    e = load_table(spark, sf_dir, "embeddings")

    def moment_partials(batches):
        n = 0
        s = np.zeros(EMB_DIM)
        ss = np.zeros((EMB_DIM, EMB_DIM))
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            n += len(v)
            s += v.sum(axis=0)
            ss += v.T @ v
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s], "ss": [ss.ravel()]}
            )

    part = e.select("embedding").mapInPandas(
        moment_partials, "n long, s array<double>, ss array<double>"
    ).localCheckpoint(eager=False)  # feeds total-n, mean, and outer sums
    tot = part.agg(F.sum("n").cast("double").alias("nt"))
    mu = (
        part.select(F.posexplode("s").alias("i", "si"))
        .groupBy("i")
        .agg(F.sum("si").alias("s"))
        .crossJoin(F.broadcast(tot))
        .select("i", (F.col("s") / F.col("nt")).alias("m"))
    )
    outer = (
        part.select(F.posexplode("ss").alias("k", "v"))
        .groupBy("k")
        .agg(F.sum("v").alias("ssum"))
        .select(
            (F.col("k") / EMB_DIM).cast("int").alias("i"),
            (F.col("k") % EMB_DIM).cast("int").alias("j"),
            "ssum",
        )
    )
    mi = mu.select(F.col("i"), F.col("m").alias("mi"))
    mj = mu.select(F.col("i").alias("j"), F.col("m").alias("mj"))
    cov = (
        outer.crossJoin(F.broadcast(tot))
        .join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            (F.col("ssum") / F.col("nt") - F.col("mi") * F.col("mj")).alias("c"),
        )
        .localCheckpoint(eager=False)  # referenced once per iteration
    )
    from pyspark.sql import Window as W

    v = spark.createDataFrame(
        [(j, 0.125) for j in range(EMB_DIM)], "j int, x double"
    )
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    for _ in range(PCA_POWER_ITERS):
        w = (
            cov.join(F.broadcast(v), "j")
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("x")).alias("w"))
        )
        nm = F.sqrt(F.sum(F.col("w") * F.col("w")).over(wall))
        v = w.select(
            F.col("i").alias("j"),
            (F.col("w") / nm).alias("x"),
            nm.alias("lam"),
        )
    return v.select(
        F.col("j").cast("long").alias("dim"),
        round_dbl(F.col("x"), 4).alias("loading"),
        round_dbl(F.col("lam"), 4).alias("eigenvalue"),
    )


KNN_K = 5
KNN_BLOCKS = 8


@query(
    "ann_knn_join",
    category="llm_similarity",
    description=f"Exact k-NN JOIN: top-{KNN_K} cosine neighbors for EVERY vector, blocked GEMM",
    oracle=f"""
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings
        ),
        pairs AS (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   list_cosine_similarity(a.emb, b.emb) AS cos_raw
            FROM v a JOIN v b ON a.vec_id <> b.vec_id
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY cos_raw DESC, neighbor_id) AS rank
            FROM pairs
        )
        SELECT query_id, neighbor_id,
               {sql_round_dbl('cos_raw', 4)} AS cos_sim,
               CAST(rank AS BIGINT) AS rank
        FROM ranked
        WHERE rank <= {KNN_K}
    """,
)
def ann_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN JOIN (every vector gets its top-k neighbors) with a
    COST-BASED path choice (round-10 verdict #3, the
    dedup_jaccard_prefix_filter discipline): below KNN_BRUTE_MAX_PAIRS
    the exact blocked GEMM runs (and is what the oracle recomputes);
    above it — where |Q|×|C| compute is the measured-quadratic
    bottleneck (BENCH_SCALE exponent 2.09) — candidates come from the
    module's IVF machinery with cell count GROWING with the corpus, and
    only a bounded shortlist is exact-reranked. See ``knn_join_frame``
    for both arms; the forced-path and recall-audit pins live in
    tests/test_llm_ops.py.

    DRIVER-CONTRACT NOTE (round-11 advice): the registered oracle is the
    exact all-pairs join, which matches the auto path only while
    n² <= KNN_BRUTE_MAX_PAIRS (n <= 4000 embeddings; every shipped SF is
    comfortably under). On a larger correctness corpus the differential
    would go red BY DESIGN — the cost switch choosing the approximate
    arm, whose quality gate is the separate driver-green
    ``ann_knn_join_recall_audit`` entry, not a hash match. A test pins
    the shipped-SF corpus under the switch so an SF bump trips a named
    assertion instead of a mysterious mismatch
    (tests/test_llm_ops.py::test_knn_auto_picks_brute_at_shipped_sfs)."""
    return knn_join_frame(spark, sf_dir, path="auto")


#: Above this |Q|×|C| pair count the exact blocked GEMM yields to the
#: IVF-candidate path (the shipped SFs stay comfortably under it, so the
#: registry entry remains exact and oracle-verifiable end-to-end).
KNN_BRUTE_MAX_PAIRS = 16_000_000
#: IVF path: target vectors per coarse cell. The cell COUNT is derived
#: from the corpus (ceil(n / target)), so per-query candidate volume is
#: ~KNN_NPROBE × KNN_CELL_TARGET — bounded — and total work scales
#: LINEARLY with n instead of n² (a fixed cell count would leave each
#: cell, and therefore each query's scan, growing with the corpus).
KNN_CELL_TARGET = 1024
#: cells probed per query on the IVF path (capped at the cell count).
KNN_NPROBE = 4
#: query-row chunk for the GEMM kernel: bounds any single sims matrix at
#: chunk × |cell| floats regardless of how uneven k-means cells get.
_KNN_GEMM_CHUNK = 2048

#: corpus cardinality per input-file set — the cost-switch count is a
#: data property; memoize so repeated builds (schema scans, bench reps)
#: pay the job once per process.
_EMB_N_CACHE: dict[tuple[str, ...], int] = {}


def _emb_count(e: DataFrame) -> int:
    key = tuple(sorted(e.inputFiles()))
    n = _EMB_N_CACHE.get(key) if key else None
    if n is None:
        n = e.count()
        if key:
            _EMB_N_CACHE[key] = n
    return n


def _gemm_block_topk(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    """Shared cogroup kernel for both kNN-join paths: one vectorized
    float64 GEMM per (query-chunk, candidate-block), emitting the
    block-local top-KNN_K per query by (cos desc, neighbor_id asc).
    Self-matches are masked; query rows are chunked so a skewed IVF cell
    cannot blow a task's memory."""
    empty = pd.DataFrame(
        {"query_id": pd.Series(dtype="int64"),
         "neighbor_id": pd.Series(dtype="int64"),
         "cos_raw": pd.Series(dtype="float64")}
    )
    if left.empty or right.empty:
        return empty
    c = np.stack(right["c_emb"].to_numpy()).astype(np.float64)
    cids = right["cand_id"].to_numpy()
    cnorm = np.linalg.norm(c, axis=1)
    outs = []
    for lo in range(0, len(left), _KNN_GEMM_CHUNK):
        chunk = left.iloc[lo : lo + _KNN_GEMM_CHUNK]
        q = np.stack(chunk["q_emb"].to_numpy()).astype(np.float64)
        sims = (q @ c.T) / np.outer(np.linalg.norm(q, axis=1), cnorm)
        qids = chunk["query_id"].to_numpy()
        sims[qids[:, None] == cids[None, :]] = -np.inf  # no self-match
        k = min(KNN_K, sims.shape[1])
        # block-local top-k by (cos desc, neighbor_id asc): lexsort is
        # stable, primary key last
        order = np.lexsort((cids[None, :].repeat(len(q), 0), -sims), axis=1)[:, :k]
        out = pd.DataFrame(
            {
                "query_id": np.repeat(qids, k),
                "neighbor_id": cids[order].ravel(),
                "cos_raw": np.take_along_axis(sims, order, axis=1).ravel(),
            }
        )
        outs.append(out[np.isfinite(out["cos_raw"])])
    return pd.concat(outs, ignore_index=True) if outs else empty


def knn_join_frame(
    spark: SparkSession,
    sf_dir: str,
    path: str = "auto",
    cell_target: int | None = None,
    nprobe: int | None = None,
) -> DataFrame:
    """The kNN join's two physical paths behind one cost-based switch.

    ``brute`` (exact; the oracle's semantics): candidates are sharded
    into {KNN_BLOCKS} hash blocks, queries are replicated once per block
    (shuffle volume is blocks × |Q| rows, NEVER the |Q| × |C| pair
    space), each (query, candidate-block) cogroup runs the shared GEMM
    kernel, and a final window keeps the global top-k. Every global
    neighbor is in some block and survives its block-local top-k, so
    the union provably contains the exact answer — but the COMPUTE is
    inherently |Q| × |C| (measured exponent 2.09 at 1x/10x/100x).

    ``ivf`` (the scale path): fit ceil(n / KNN_CELL_TARGET) spherical
    k-means cells (the module's IVF machinery, cell count growing with
    the corpus so cell size stays bounded), single-assign candidates to
    their nearest cell, multi-assign each query to its KNN_NPROBE
    nearest cells, and run the SAME cogroup kernel per cell — an exact
    rerank of a bounded ~nprobe × cell_target candidate shortlist, so
    total work is LINEAR in n. Approximate by construction on corpora
    with > nprobe cells (recall is measured, not assumed:
    tests/test_llm_ops.py pins the forced-path audit); below
    KNN_CELL_TARGET vectors the derived cell count is 1 and the path
    degenerates to the exact single-block GEMM — which is why the
    forced-ivf pin at the shipped SFs asserts bit-identical output.

    ``auto`` (the registry entry's path): count the corpus once and
    pick brute iff n² <= KNN_BRUTE_MAX_PAIRS."""
    e = load_table(spark, sf_dir, "embeddings")
    if path == "auto":
        n = _emb_count(e)
        path = "brute" if n * n <= KNN_BRUTE_MAX_PAIRS else "ivf"
    if path == "brute":
        blocks = F.broadcast(
            spark.range(KNN_BLOCKS).select(F.col("id").alias("blk"))
        )
        cand = e.select(
            F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb")
        ).withColumn("blk", F.pmod(F.col("cand_id"), F.lit(KNN_BLOCKS)).cast("long"))
        queries = e.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        ).crossJoin(blocks)
        key = "blk"
    elif path == "ivf":
        n = _emb_count(e)
        tgt = cell_target if cell_target is not None else KNN_CELL_TARGET
        k_cells = max(1, -(-n // tgt))
        if k_cells == 1:
            # corpus fits one cell: no quantizer to fit (KMeans needs
            # k >= 2) — one cogroup group runs the exact GEMM, which is
            # why the forced-ivf pin at shipped SFs is bit-identical
            cand = e.select(
                F.col("vec_id").alias("cand_id"),
                F.col("embedding").alias("c_emb"),
            ).withColumn("cell", F.lit(0).cast("long"))
            queries = e.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("q_emb"),
            ).withColumn("cell", F.lit(0).cast("long"))
            return _knn_topk_assemble(queries, cand, "cell")
        nprobe = min(nprobe if nprobe is not None else KNN_NPROBE, k_cells)
        centers = fit_ivf_centroids(e, k=k_cells)
        cn = centers / np.linalg.norm(centers, axis=1, keepdims=True)
        cent_ids = np.arange(len(cn), dtype=np.int64)

        @F.pandas_udf("long")
        def cell_udf(emb: pd.Series) -> pd.Series:
            v = np.stack(emb.to_numpy()).astype(np.float64)
            u = v / np.linalg.norm(v, axis=1, keepdims=True)
            return pd.Series(cent_ids[(u @ cn.T).argmax(axis=1)])

        @F.pandas_udf("array<long>")
        def probe_udf(emb: pd.Series) -> pd.Series:
            v = np.stack(emb.to_numpy()).astype(np.float64)
            u = v / np.linalg.norm(v, axis=1, keepdims=True)
            sims = u @ cn.T
            # top-nprobe cells by (cos desc, cell_id asc): argsort on
            # (-cos) is stable → equal cosines keep ascending id order
            order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
            return pd.Series(list(order.astype(np.int64)))

        cand = e.select(
            F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb")
        ).withColumn("cell", cell_udf("c_emb"))
        queries = e.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        ).withColumn("cell", F.explode(probe_udf("q_emb")))
        key = "cell"
    else:
        raise ValueError(f"unknown knn join path {path!r}")
    return _knn_topk_assemble(queries, cand, key)


def _knn_topk_assemble(queries: DataFrame, cand: DataFrame, key: str) -> DataFrame:
    partial = (
        queries.groupBy(key)
        .cogroup(cand.groupBy(key))
        .applyInPandas(
            _gemm_block_topk, "query_id long, neighbor_id long, cos_raw double"
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id")
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
        .select(
            "query_id",
            "neighbor_id",
            round_dbl(F.col("cos_raw"), 4).alias("cos_sim"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


#: audit configuration for the kNN-join IVF path: a cell target small
#: enough that EVERY shipped SF gets a genuinely partial probe (8 cells
#: at 500 vectors, 32 at 2000), with nprobe = half the cells. Measured
#: recall@{KNN_K}: 0.768 / 0.773 / 0.861 at sf0.001/0.01/0.1 — the
#: clusterless synthetic corpus is the hard case; 60% is the floor
#: (random half-probing would recover ~50%).
KNN_AUDIT_CELL_TARGET = 64
KNN_AUDIT_RECALL_PCT = 60


@query(
    "ann_knn_join_recall_audit",
    category="llm_similarity",
    description=f"kNN-join IVF-path recall audit: forced partial probe (half the corpus-scaled cells), pair recall vs exact join >= {KNN_AUDIT_RECALL_PCT}%",
    oracle=f"""
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings
        ),
        pairs AS (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   list_cosine_similarity(a.emb, b.emb) AS cos_raw
            FROM v a JOIN v b ON a.vec_id <> b.vec_id
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY cos_raw DESC, neighbor_id) AS rank
            FROM pairs
        )
        SELECT query_id, neighbor_id,
               {sql_round_dbl('cos_raw', 4)} AS cos_sim,
               CAST(rank AS BIGINT) AS rank,
               TRUE AS ivf_recall_ok
        FROM ranked
        WHERE rank <= {KNN_K}
    """,
)
def ann_knn_join_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-verifiable audit of the kNN join's IVF scale path (the
    ``ann_ivf_topk`` / ``ann_pq_rerank_audit`` discipline, applied to the
    round-11 cost-based switch): k-means cells are not
    ANSI-SQL-reproducible, so the query runs BOTH the exact blocked-GEMM
    join and the IVF path under a FORCED partial probe
    (cell target {KNN_AUDIT_CELL_TARGET} → every shipped SF splits into
    multiple cells; nprobe = half of them) and emits the exact rows plus
    one integer-exact boolean: recalled pairs × 100 >=
    {KNN_AUDIT_RECALL_PCT} × exact pairs. The oracle recomputes the
    exact join and asserts TRUE, so a hash match proves IN-ENGINE that
    the approximate path recovered the claimed fraction of true
    neighbors — on this corpus the honest-hard case (clusterless
    synthetic vectors; measured 0.77-0.86).

    Plan: two cogroup GEMM fan-outs (exact + probed) over one scan
    each; the recall fold is a {KNN_K}·|Q|-row semi join counted into a
    one-row relation broadcast onto the output. At 100 TB the audit
    runs on a sampled query subset — the structure is unchanged."""
    exact = knn_join_frame(spark, sf_dir, path="brute").localCheckpoint(
        eager=False
    )  # feeds both the output and the recall fold
    e = load_table(spark, sf_dir, "embeddings")
    n = _emb_count(e)
    k_cells = -(-n // KNN_AUDIT_CELL_TARGET)
    approx = knn_join_frame(
        spark,
        sf_dir,
        path="ivf",
        cell_target=KNN_AUDIT_CELL_TARGET,
        nprobe=-(-k_cells // 2),
    )
    stats = (
        exact.alias("x")
        .join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .crossJoin(F.broadcast(exact.agg(F.count(F.lit(1)).alias("n_exact"))))
    )
    return exact.crossJoin(F.broadcast(stats)).select(
        "query_id",
        "neighbor_id",
        "cos_sim",
        "rank",
        (
            F.col("n_hits") * 100 >= F.lit(KNN_AUDIT_RECALL_PCT) * F.col("n_exact")
        ).alias("ivf_recall_ok"),
    )


RRF_K = 60          # standard reciprocal-rank-fusion damping constant
RRF_ARM_DEPTH = 50  # candidates taken from each retrieval arm
RRF_TOP = 20        # fused results returned


def _rrf_oracle() -> str:
    from spark_jdbc_limit_spark.operators.text import (
        _BM25_FIXED_SUM,
        _BM25_TERM_SCORE,
        BM25_QUERY,
    )

    return f"""
        WITH stats AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                   AVG(CAST(len(string_split(text, ' ')) AS DOUBLE)) AS avgdl
            FROM documents
        ),
        tf AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl,
                   term,
                   CAST(COUNT(*) AS DOUBLE) AS tf
            FROM (SELECT doc_id, text, unnest(string_split(text, ' ')) AS term
                  FROM documents) t
            WHERE term IN {BM25_QUERY!r}
            GROUP BY doc_id, dl, term
        ),
        dfreq AS (
            SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
        ),
        scored AS (
            SELECT tf.doc_id, tf.term, {_BM25_TERM_SCORE} AS s
            FROM tf JOIN dfreq USING (term) CROSS JOIN stats
        ),
        lex_scores AS (
            SELECT doc_id, {sql_round_dbl(_BM25_FIXED_SUM)} AS score
            FROM scored GROUP BY doc_id
        ),
        lex AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rl
            FROM lex_scores
        ),
        q AS (
            SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
            FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
        ),
        sem_scores AS (
            SELECT vec_id AS doc_id,
                   {sql_round_dbl(
                       'list_cosine_similarity(list_transform(embedding, x -> CAST(x AS DOUBLE)), q.qv)', 4
                   )} AS cs
            FROM embeddings, q
            WHERE vec_id <> {QUERY_VEC_ID}
        ),
        sem AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY cs DESC, doc_id) AS rs
            FROM sem_scores
        ),
        fused AS (
            SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
                   COALESCE(1.0 / ({RRF_K} + l.rl), 0)
                       + COALESCE(1.0 / ({RRF_K} + s.rs), 0) AS rrf_raw,
                   l.rl AS lex_rank, s.rs AS sem_rank
            FROM (SELECT * FROM lex WHERE rl <= {RRF_ARM_DEPTH}) l
            FULL OUTER JOIN (SELECT * FROM sem WHERE rs <= {RRF_ARM_DEPTH}) s
                 ON l.doc_id = s.doc_id
        )
        SELECT doc_id,
               CAST(COALESCE(lex_rank, 0) AS BIGINT) AS lex_rank,
               CAST(COALESCE(sem_rank, 0) AS BIGINT) AS sem_rank,
               {sql_round_dbl('rrf_raw', 6)} AS rrf_score
        FROM fused
        ORDER BY rrf_raw DESC, doc_id
        LIMIT {RRF_TOP}
    """


@query(
    "ann_hybrid_rrf_fusion",
    category="llm_similarity",
    description=f"Hybrid retrieval: reciprocal-rank fusion of BM25 and cosine arms (top {RRF_TOP})",
    oracle=_rrf_oracle(),
)
def ann_hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search, the shape modern retrieval stacks actually ship:
    a LEXICAL arm (BM25 keyword scores, `text_bm25_retrieval`'s exact
    machinery) and a SEMANTIC arm (exact cosine against the query
    vector, `ann_cosine_topk_bruteforce`'s) fused by Reciprocal Rank
    Fusion: ``rrf = Σ_arms 1/(k + rank)`` with the standard k=60 —
    rank-based, so no score calibration between arms is needed, which
    is RRF's whole point.

    Determinism discipline: each arm ranks by its ROUNDED score with
    doc_id tie-break (rank order = pandas-comparable values the margin
    tests already pin), so both engines assign identical ranks; the
    fused score is a sum of two exact-rational terms folded in fixed
    order from a 51×51 value lattice, property-checked clear of its
    rounding boundaries. A doc missing from one arm contributes 0 from
    it (rank reported as 0 = "not retrieved by this arm").

    Scale shape: each arm ends in its own top-``{RRF_ARM_DEPTH}``
    (TakeOrdered / per-partition heaps); ranking then runs on
    arm-depth-sized MICRO relations (the only unpartitioned windows,
    {RRF_ARM_DEPTH} rows by construction), and the fusion join touches
    ≤ 2×{RRF_ARM_DEPTH} rows. The corpus-sized work is exactly the two
    arms' scans — fusion itself is free. The two arms answer one hybrid
    query (keywords + query vector), the standard two-tower serving
    pattern."""
    from pyspark.sql.window import Window as W

    from spark_jdbc_limit_spark.operators.text import bm25_doc_scores

    lex_scores = bm25_doc_scores(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").head()[0]
    q = F.array(*[F.lit(float(x)) for x in qv])
    v = _as_double(F.col("embedding"))
    # rank and cut on the ROUNDED score in both arms (the oracle does),
    # never on the raw double — raw-order top-k could admit a different
    # member when rounding ties scores near the arm-depth boundary
    sem_scores = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select(
            F.col("vec_id").alias("doc_id"),
            round_dbl(dot_cols(v, q) / (_norm(v) * _norm(q)), 4).alias("cos_sim"),
        )
    )
    lex = (
        lex_scores.orderBy(F.desc("score"), "doc_id")
        .limit(RRF_ARM_DEPTH)
        .withColumn(
            "rl", F.row_number().over(W.orderBy(F.desc("score"), "doc_id"))
        )
        .select("doc_id", "rl")
    )
    sem = (
        sem_scores.orderBy(F.desc("cos_sim"), "doc_id")
        .limit(RRF_ARM_DEPTH)
        .withColumn(
            "rs", F.row_number().over(W.orderBy(F.desc("cos_sim"), "doc_id"))
        )
        .select("doc_id", "rs")
    )
    rrf_raw = F.coalesce(1.0 / (RRF_K + F.col("rl")), F.lit(0.0)) + F.coalesce(
        1.0 / (RRF_K + F.col("rs")), F.lit(0.0)
    )
    return (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("rl", F.lit(0)).cast("long").alias("lex_rank"),
            F.coalesce("rs", F.lit(0)).cast("long").alias("sem_rank"),
            rrf_raw.alias("rrf_raw"),
        )
        .orderBy(F.desc("rrf_raw"), "doc_id")
        .limit(RRF_TOP)
        .select(
            "doc_id",
            "lex_rank",
            "sem_rank",
            round_dbl(F.col("rrf_raw"), 6).alias("rrf_score"),
        )
    )


#: int8 scalar-quantization levels (0..255 — affine/asymmetric form).
SQ_LEVELS = 255


def _sq_oracle() -> str:
    q = f"FLOOR((val - mn) / scale + 0.5)"
    return f"""
        WITH flat AS (
            SELECT vec_id, unnest(range(len(embedding))) AS dim,
                   unnest(CAST(embedding AS DOUBLE[])) AS val
            FROM embeddings
        ),
        ext AS (
            SELECT dim, MIN(val) AS mn, MAX(val) AS mx,
                   (MAX(val) - MIN(val)) / {SQ_LEVELS} AS scale
            FROM flat GROUP BY dim
        ),
        coded AS (
            -- a constant dimension gives scale = 0: 0/0 is engine-divergent
            -- (IEEE NaN vs NULL), so code it as 0 -> dequant = mn (exact)
            SELECT f.dim, f.val, e.mn, e.scale,
                   CASE WHEN e.scale = 0 THEN e.mn
                        ELSE e.mn + {q} * e.scale END AS dequant
            FROM flat f JOIN ext e USING (dim)
        )
        SELECT dim,
               CAST(COUNT(*) AS BIGINT) AS n,
               {sql_round_dbl('MAX(ABS(val - dequant))', 6)} AS max_abs_err,
               {sql_round_dbl('MAX(scale)', 6)} AS scale,
               MAX(ABS(val - dequant)) <= MAX(scale) * 0.5000001
                   AS within_half_scale
        FROM coded GROUP BY dim ORDER BY dim
    """


@query(
    "embedding_int8_quantization_audit",
    category="llm_similarity",
    description=f"Per-dim affine int8 quantization ({SQ_LEVELS + 1} levels) with reconstruction-error bound audit",
    oracle=_sq_oracle(),
)
def embedding_int8_quantization_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALAR quantization — the serving-side embedding compression that
    PQ's codebooks are not: each dimension maps affinely onto 0..255
    (4x smaller than float32, SIMD-friendly dot products), and the whole
    value of the scheme is its per-element guarantee |x − dequant(q(x))|
    ≤ scale/2 — which this audit asserts PER DIMENSION from the data
    (with a 1e-7 relative slack for the float rounding in the codec
    itself). Quantize and dequantize use floor(v + 0.5) — the suite's
    portable rounding — over doubles both engines derive identically
    from exact float32 inputs and exact min/max, so max_abs_err itself
    hash-matches at 1e-6, not just the boolean.

    Plan shape: one explode of the embedding matrix → per-dim min/max
    aggregate (micro: d rows) → broadcast back onto the exploded
    relation for the error fold — two passes over (n·d) rows, both
    partial-aggregated, no shuffle wider than d rows. At 100 TB the
    per-dim extrema come from the same pass that writes the quantized
    table; the audit is why you trust the compressed copy for recall."""
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "val")
    )
    ext = flat.groupBy("dim").agg(
        F.min("val").alias("mn"),
        F.max("val").alias("mx"),
        ((F.max("val") - F.min("val")) / SQ_LEVELS).alias("scale"),
    )
    # scale = 0 (constant dimension) would make the codec divide 0/0 —
    # Spark yields IEEE NaN where DuckDB yields NULL, so the zero-range
    # case is coded explicitly: code 0, dequant = mn, error exactly 0.
    coded = flat.join(F.broadcast(ext), "dim").withColumn(
        "dequant",
        F.when(F.col("scale") == 0, F.col("mn")).otherwise(
            F.col("mn")
            + F.floor((F.col("val") - F.col("mn")) / F.col("scale") + 0.5) * F.col("scale")
        ),
    )
    err = F.max(F.abs(F.col("val") - F.col("dequant")))
    return (
        coded.groupBy(F.col("dim").cast("long").alias("dim"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_dbl(err, 6).alias("max_abs_err"),
            round_dbl(F.max("scale"), 6).alias("scale"),
            (err <= F.max("scale") * 0.5000001).alias("within_half_scale"),
        )
        .orderBy("dim")
    )


#: Matryoshka truncation audit: prefix width and anchors audited.
MATRYOSHKA_DIMS = 16
MATRYOSHKA_ANCHORS = 8
MATRYOSHKA_K = 10


@query(
    "embedding_matryoshka_truncation_audit",
    category="llm_similarity",
    description=f"Matryoshka audit: recall@{MATRYOSHKA_K} of {MATRYOSHKA_DIMS}-dim prefix cosine vs full {EMB_DIM}-dim",
    oracle=f"""
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings
        ),
        anchors AS (
            SELECT vec_id AS a_id, emb AS a_emb FROM v
            ORDER BY vec_id LIMIT {MATRYOSHKA_ANCHORS}
        ),
        pairs AS (
            SELECT a.a_id, b.vec_id AS n_id,
                   list_cosine_similarity(a.a_emb, b.emb) AS full_cos,
                   list_cosine_similarity(a.a_emb[1:{MATRYOSHKA_DIMS}],
                                          b.emb[1:{MATRYOSHKA_DIMS}]) AS pfx_cos
            FROM anchors a JOIN v b ON b.vec_id <> a.a_id
        ),
        full_top AS (
            SELECT a_id, n_id FROM (
                SELECT a_id, n_id, ROW_NUMBER() OVER (
                    PARTITION BY a_id ORDER BY full_cos DESC, n_id) AS r
                FROM pairs) WHERE r <= {MATRYOSHKA_K}
        ),
        pfx_top AS (
            SELECT a_id, n_id FROM (
                SELECT a_id, n_id, ROW_NUMBER() OVER (
                    PARTITION BY a_id ORDER BY pfx_cos DESC, n_id) AS r
                FROM pairs) WHERE r <= {MATRYOSHKA_K}
        )
        SELECT f.a_id AS anchor_id,
               CAST(COUNT(p.n_id) AS BIGINT) AS n_overlap,
               CAST(COUNT(p.n_id) AS DOUBLE) / {MATRYOSHKA_K} AS recall_at_k
        FROM full_top f
        LEFT JOIN pfx_top p ON p.a_id = f.a_id AND p.n_id = f.n_id
        GROUP BY f.a_id ORDER BY anchor_id
    """,
)
def embedding_matryoshka_truncation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation audit — the measurement behind serving
    truncated embeddings (MRL-trained models promise the first d' dims
    approximate the full vector): for each anchor vector, how much of
    the full-{EMB_DIM}-dim cosine top-{MATRYOSHKA_K} survives when both
    sides are truncated to the first {MATRYOSHKA_DIMS} dims. recall@k
    is an EXACT rational count/k (the float cosines only RANK, ties
    break by neighbor id in both engines; the driver-hashed outputs are
    the integer overlap and its exact ratio — synthetic embeddings are
    not MRL-trained, so observed recall is the honest unstructured
    baseline a real model's audit would beat).

    Plan shape: anchors are a {MATRYOSHKA_ANCHORS}-row broadcast
    (smallest vec_ids — deterministic, no sampling); BOTH cosines
    compute in one pass over the anchor×corpus join (zip_with/aggregate
    inside codegen — slice() reuses the same array, so the corpus is
    scanned once, no UDF); BOTH per-anchor ranks then come from ONE
    a_id exchange (two Window sorts over the same partitioning), so
    the top-{MATRYOSHKA_K} overlap is a conditional count on rows that
    already carry both ranks — no second shuffle of the pair relation
    and no rank-vs-rank join (round-14: 2 exchanges + 1 join → 1
    exchange; the checkpoint the two-consumer shape needed is gone
    because the plan is single-consumer now). At 100 TB this is
    {MATRYOSHKA_ANCHORS} broadcast probes over one scan — the kNN-join
    entry covers the all-pairs posture."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double(F.col("embedding")).alias("emb"))
    anchors = F.broadcast(
        v.orderBy("vec_id")
        .limit(MATRYOSHKA_ANCHORS)
        .select(F.col("vec_id").alias("a_id"), F.col("emb").alias("a_emb"))
    )
    a_pfx = F.slice(F.col("a_emb"), 1, MATRYOSHKA_DIMS)
    b_pfx = F.slice(F.col("emb"), 1, MATRYOSHKA_DIMS)
    pairs = v.join(anchors, F.col("vec_id") != F.col("a_id")).select(
        "a_id",
        F.col("vec_id").alias("n_id"),
        (dot_cols(F.col("a_emb"), F.col("emb"))
         / (_norm(F.col("a_emb")) * _norm(F.col("emb")))).alias("full_cos"),
        (dot_cols(a_pfx, b_pfx) / (_norm(a_pfx) * _norm(b_pfx))).alias("pfx_cos"),
    )
    r_full = F.row_number().over(
        W.partitionBy("a_id").orderBy(F.col("full_cos").desc(), "n_id")
    )
    r_pfx = F.row_number().over(
        W.partitionBy("a_id").orderBy(F.col("pfx_cos").desc(), "n_id")
    )
    in_pfx_top = F.when(F.col("r_pfx") <= MATRYOSHKA_K, F.lit(1))
    return (
        pairs.select("a_id", r_full.alias("r_full"), r_pfx.alias("r_pfx"))
        .filter(F.col("r_full") <= MATRYOSHKA_K)
        .groupBy(F.col("a_id").alias("anchor_id"))
        .agg(
            F.count(in_pfx_top).alias("n_overlap"),
            (F.count(in_pfx_top).cast("double") / MATRYOSHKA_K).alias("recall_at_k"),
        )
        .orderBy("anchor_id")
    )


# ---------------------------------------------------------------------------
# Binary (1-bit sign) quantization recall audit
# ---------------------------------------------------------------------------

#: binary-quantization audit: anchors and shortlist depth (the matryoshka
#: audit's shape, at 1 bit/dim instead of a dim prefix).
BINQ_ANCHORS = 8
BINQ_K = 10


def _binq_hamming_sql(a: str, b: str) -> str:
    """Hamming distance between the sign patterns of two float lists —
    spelled as an integer list_sum over an explicit dim range so the
    whole distance is EXACT integer arithmetic in DuckDB (mirror of the
    builder's zip_with/aggregate fold)."""
    return (
        f"list_sum(list_transform(range(1, {EMB_DIM} + 1), "
        f"i -> CASE WHEN ({a}[i] >= 0) <> ({b}[i] >= 0) THEN 1 ELSE 0 END))"
    )


@query(
    "embedding_binary_quantization_recall_audit",
    category="llm_similarity",
    description=f"Recall@{BINQ_K} of 1-bit sign-quantized Hamming search vs exact cosine, {BINQ_ANCHORS} anchors",
    oracle=f"""
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings
        ),
        anchors AS (
            SELECT vec_id AS a_id, emb AS a_emb FROM v
            ORDER BY vec_id LIMIT {BINQ_ANCHORS}
        ),
        pairs AS (
            SELECT a.a_id, b.vec_id AS n_id,
                   list_cosine_similarity(a.a_emb, b.emb) AS full_cos,
                   {_binq_hamming_sql('a.a_emb', 'b.emb')} AS ham
            FROM anchors a JOIN v b ON b.vec_id <> a.a_id
        ),
        full_top AS (
            SELECT a_id, n_id FROM (
                SELECT a_id, n_id, ROW_NUMBER() OVER (
                    PARTITION BY a_id ORDER BY full_cos DESC, n_id) AS r
                FROM pairs) WHERE r <= {BINQ_K}
        ),
        ham_top AS (
            SELECT a_id, n_id, ham FROM (
                SELECT a_id, n_id, ham, ROW_NUMBER() OVER (
                    PARTITION BY a_id ORDER BY ham ASC, n_id) AS r
                FROM pairs) WHERE r <= {BINQ_K}
        )
        SELECT f.a_id AS anchor_id,
               CAST(COUNT(h.n_id) AS BIGINT) AS n_overlap,
               CAST(COUNT(h.n_id) AS DOUBLE) / {BINQ_K} AS recall_at_k,
               CAST((SELECT MAX(ham) FROM ham_top t WHERE t.a_id = f.a_id)
                   AS BIGINT) AS max_ham_in_top
        FROM full_top f
        LEFT JOIN ham_top h ON h.a_id = f.a_id AND h.n_id = f.n_id
        GROUP BY f.a_id ORDER BY anchor_id
    """,
)
def embedding_binary_quantization_recall_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Binary quantization audit — the 32× compression used for
    first-stage retrieval in modern vector stores (sign bit per
    dimension, XOR+popcount distance): for each anchor vector, how
    much of the exact-cosine top-{BINQ_K} survives when candidates are
    ranked by HAMMING distance between sign patterns instead. The
    Hamming distance is exact INTEGER arithmetic in both engines (sign
    bits packed once per vector into two 32-bit words, per-pair
    distance = XOR + bit_count intrinsics here; an explicit range
    list_sum in the oracle) — no float enters the binary ranking at
    all, so its order is bit-exact; the exact-cosine side shares the matryoshka
    audit's verified posture (floats only RANK, ties break by id,
    margins pinned on the oracle data by the llm-ops margin test).
    recall@k and the max-Hamming radius are exact integers.

    Plan shape at 100 TB: anchors are a {BINQ_ANCHORS}-row broadcast;
    one pass over the anchor×corpus join computes BOTH metrics
    in-codegen (no UDF); per-anchor top-k windows run over
    {BINQ_ANCHORS} bounded partitions. The sign-packing runs inline
    here (one fold per vector); at write time the packed words would
    persist as columns and the scan reads 16 bytes/vector for the
    binary arm instead of the float array — a storage change, same
    plan. Reference scope: no vector surface (README.md:1-9)."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "embeddings")

    def pack(arr):
        # sign bits folded MSB-first into a long: acc*2 + bit. Two 32-bit
        # words (not one 64-bit): the doubling fold's top bit would
        # overflow int64 under ANSI mode at the 64th dim.
        bits = F.transform(
            arr,
            lambda x: F.when(x >= 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        )
        return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, b: acc * 2 + b)

    emb = F.col("embedding")
    half = EMB_DIM // 2
    # the production representation, for real: sign bits packed ONCE per
    # vector (one fold per ROW); the per-PAIR distance is then
    # XOR+popcount — a JVM intrinsic, no interpreted lambda in the pair
    # loop (A/B at 100x replication: 11.9 s -> see BASELINE.md row).
    v = e.select(
        "vec_id",
        _as_double(emb).alias("emb"),
        pack(F.slice(emb, 1, half)).alias("wlo"),
        pack(F.slice(emb, half + 1, half)).alias("whi"),
    )
    anchors = F.broadcast(
        v.orderBy("vec_id")
        .limit(BINQ_ANCHORS)
        .select(
            F.col("vec_id").alias("a_id"),
            F.col("emb").alias("a_emb"),
            F.col("wlo").alias("a_wlo"),
            F.col("whi").alias("a_whi"),
        )
    )
    ham = (
        F.bit_count(F.col("a_wlo").bitwiseXOR(F.col("wlo")))
        + F.bit_count(F.col("a_whi").bitwiseXOR(F.col("whi")))
    ).cast("int")
    pairs = (
        v.join(anchors, F.col("vec_id") != F.col("a_id"))
        .select(
            "a_id",
            F.col("vec_id").alias("n_id"),
            (
                dot_cols(F.col("a_emb"), F.col("emb"))
                / (_norm(F.col("a_emb")) * _norm(F.col("emb")))
            ).alias("full_cos"),
            ham.alias("ham"),
        )
        .localCheckpoint(eager=False)  # feeds both rankings
    )
    full_r = F.row_number().over(
        W.partitionBy("a_id").orderBy(F.col("full_cos").desc(), "n_id")
    )
    full_top = (
        pairs.select("a_id", "n_id", full_r.alias("r"))
        .filter(F.col("r") <= BINQ_K)
        .select("a_id", "n_id")
    )
    ham_r = F.row_number().over(
        W.partitionBy("a_id").orderBy(F.col("ham").asc(), "n_id")
    )
    ham_top = (
        pairs.select("a_id", "n_id", "ham", ham_r.alias("r"))
        .filter(F.col("r") <= BINQ_K)
        .select("a_id", "n_id", "ham")
    )
    radius = ham_top.groupBy("a_id").agg(F.max("ham").cast("long").alias("max_ham"))
    return (
        full_top.alias("f")
        .join(
            ham_top.alias("h"),
            (F.col("h.a_id") == F.col("f.a_id")) & (F.col("h.n_id") == F.col("f.n_id")),
            "left",
        )
        .groupBy(F.col("f.a_id").alias("anchor_id"))
        .agg(
            F.count(F.col("h.n_id")).alias("n_overlap"),
            (F.count(F.col("h.n_id")).cast("double") / BINQ_K).alias("recall_at_k"),
        )
        .join(F.broadcast(radius), F.col("anchor_id") == F.col("a_id"))
        .select("anchor_id", "n_overlap", "recall_at_k",
                F.col("max_ham").alias("max_ham_in_top"))
        .orderBy("anchor_id")
    )
