"""Scalar-function queries (SURVEY.md §2B "scalar functions"): string,
date/time, math, array, map, JSON, and conditional expressions.

The reference's only scalar-level logic is dialect identifier quoting and
predicate compilation (reference: JDBCRelationWithLimit.scala:73,
ExtJdbcUtils.scala:61); everything here is the engine surface its
workloads get from host Spark. All expressions are built-in
``pyspark.sql.functions`` — JVM-side, inside whole-stage codegen; no
Python UDFs in any of these paths.

Oracle-parity notes baked into the queries:
- ``split`` is 0-indexed in Spark, 1-indexed as DuckDB list;
- Spark ``dayofweek`` is 1=Sunday, DuckDB 0=Sunday → normalized;
- transcendentals (ln/exp) may differ in the last ulp between libm
  implementations → floor-trick rounding at 6 decimals;
- JSON extraction: ``get_json_object`` ↔ ``json_extract_string``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_jdbc_limit_spark.operators.registry import query
from spark_jdbc_limit_spark.operators.relational import round_dbl, sql_round_dbl
from spark_jdbc_limit_spark.sources.catalog import load_table


@query(
    "scalar_string_funcs",
    category="scalar",
    description="upper/lower/substring/concat/split/regexp/length/trim/replace",
    oracle="""
        SELECT p_partkey,
               UPPER(p_name) AS name_upper,
               LOWER(p_type) AS type_lower,
               SUBSTRING(p_name, 1, 5) AS name_head,
               p_brand || '/' || p_type AS brand_type,
               string_split(p_name, ' ')[1] AS first_word,
               regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
               CAST(LENGTH(p_name) AS BIGINT) AS name_len,
               TRIM('  ' || p_name || ' ') AS name_trimmed,
               REPLACE(p_name, ' ', '_') AS name_snake,
               LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded
        FROM part
        ORDER BY p_partkey
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.lower("p_type").alias("type_lower"),
            F.substring("p_name", 1, 5).alias("name_head"),
            F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
            F.split("p_name", " ").getItem(0).alias("first_word"),
            F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
            F.length("p_name").cast("long").alias("name_len"),
            F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trimmed"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
            F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        )
    )


@query(
    "scalar_date_funcs",
    category="scalar",
    description="year/month/day/quarter/trunc/diff/epoch/add on order dates",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(month(o_orderdate) AS BIGINT) AS mo,
               CAST(day(o_orderdate) AS BIGINT) AS dy,
               CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
               CAST(dayofweek(o_orderdate) AS BIGINT) AS dow_sun0,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
               CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT)
                   AS days_since_95,
               CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
               strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date
        FROM orders
        ORDER BY o_orderkey
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
            F.dayofmonth("o_orderdate").cast("long").alias("dy"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
            (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow_sun0"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
            .cast("long")
            .alias("days_since_95"),
            F.unix_timestamp("o_orderdate").alias("epoch_s"),
            F.date_format(
                F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), "yyyy-MM-dd"
            ).alias("due_date"),
        )
    )


@query(
    "scalar_math_funcs",
    category="scalar",
    description="abs/ceil/floor/sqrt/power/ln/mod/sign over lineitem measures",
    oracle=f"""
        SELECT l_orderkey, l_linenumber,
               ABS(l_extendedprice - 50000.0) AS dist_from_50k,
               CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
               CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
               {sql_round_dbl('SQRT(l_extendedprice)', 6)} AS price_sqrt,
               l_quantity * l_quantity AS qty_sq,
               {sql_round_dbl('LN(l_extendedprice + 1.0)', 6)} AS price_ln,
               CAST(CAST(l_orderkey AS BIGINT) % 7 AS BIGINT) AS key_mod7,
               CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """qty_sq uses x*x (IEEE-exact) rather than pow(x, 2.0) — pow goes
    through libm and can differ in the last ulp across platforms."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.abs(F.col("l_extendedprice") - 50000.0).alias("dist_from_50k"),
            F.ceil("l_quantity").cast("long").alias("qty_ceil"),
            F.floor("l_quantity").cast("long").alias("qty_floor"),
            round_dbl(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
            (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
            round_dbl(F.log(F.col("l_extendedprice") + 1.0), 6).alias("price_ln"),
            (F.col("l_orderkey") % 7).cast("long").alias("key_mod7"),
            F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
        )
    )


@query(
    "scalar_array_funcs",
    category="scalar",
    description="size/element_at/slice/fold over embedding vectors",
    oracle=f"""
        SELECT vec_id,
               CAST(len(embedding) AS BIGINT) AS n_dims,
               CAST(embedding[1] AS DOUBLE) AS first_dim,
               {sql_round_dbl("list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))", 6)}
                   AS sum_dims,
               {sql_round_dbl(
                   "SQRT(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))",
                   6,
               )} AS l2_norm
        FROM embeddings
        ORDER BY vec_id
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.aggregate folds on the JVM inside codegen — the idiomatic way to
    reduce an array column without a UDF."""
    e = load_table(spark, sf_dir, "embeddings")
    dsum = F.aggregate(
        "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    dsq = F.aggregate(
        "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return (
        e.select(
            "vec_id",
            F.size("embedding").cast("long").alias("n_dims"),
            F.element_at("embedding", 1).cast("double").alias("first_dim"),
            round_dbl(dsum, 6).alias("sum_dims"),
            round_dbl(F.sqrt(dsq), 6).alias("l2_norm"),
        )
    )


@query(
    "scalar_json_funcs",
    category="scalar",
    description="JSON extraction from the events.props string column",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
               CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
               json_extract_string(props, '$.missing') AS missing_val
        FROM events
        ORDER BY event_id
    """,
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``from_json`` with an explicit schema parses each props string ONCE
    and extracts every field from the struct; per-field ``get_json_object``
    would re-run the JSON parser per extraction (3× the parse work here,
    and linearly worse as fields are added)."""
    ev = load_table(spark, sf_dir, "events")
    j = F.from_json("props", "k bigint, missing string")
    return (
        ev.select("event_id", j.alias("j"))
        .select(
            "event_id",
            F.col("j.k").alias("k_val"),
            (F.col("j.k") % 10).alias("k_bucket"),
            F.col("j.missing").alias("missing_val"),
        )
    )


@query(
    "scalar_map_funcs",
    category="scalar",
    description="map construction, key/value extraction, map_concat",
    oracle="""
        SELECT event_id,
               event_type AS et_from_map,
               ROUND(value, 2) AS val_from_map,
               2 AS n_keys
        FROM events
        ORDER BY event_id
    """,
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Builds a MapType column and reads it back — the oracle computes the
    same values directly (DuckDB MAP extraction semantics differ, so the
    parity check is on the roundtripped VALUES, not the map type)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("value"), F.round("value", 2).cast("string"),
    )
    return (
        ev.select(
            "event_id",
            F.element_at(m, "type").alias("et_from_map"),
            F.element_at(m, "value").cast("double").alias("val_from_map"),
            F.size(F.map_keys(m)).cast("int").alias("n_keys"),
        )
    )


@query(
    "scalar_conditional",
    category="scalar",
    description="CASE/coalesce/nullif/greatest/least tiering",
    oracle="""
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN 'debt'
                    WHEN c_acctbal < 5000 THEN 'standard'
                    ELSE 'premium' END AS tier,
               COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_masked,
               GREATEST(LEAST(c_acctbal, 9000.0), 0.0) AS bal_clamped
        FROM customer
        ORDER BY c_custkey
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.when(F.col("c_acctbal") < 0, "debt")
            .when(F.col("c_acctbal") < 5000, "standard")
            .otherwise("premium")
            .alias("tier"),
            F.coalesce(F.nullif("c_mktsegment", F.lit("MACHINERY")), F.lit("OTHER")).alias(
                "segment_masked"
            ),
            F.greatest(F.least("c_acctbal", F.lit(9000.0)), F.lit(0.0)).alias("bal_clamped"),
        )
    )


@query(
    "scalar_bitwise_funcs",
    category="scalar",
    description="Bitwise AND/OR/XOR, shifts, and popcount on join keys",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_orderkey & CAST(l_linenumber AS BIGINT) AS k_and,
               l_orderkey | CAST(l_linenumber AS BIGINT) AS k_or,
               xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS k_xor,
               l_orderkey << 3 AS k_shl,
               l_orderkey >> 2 AS k_shr,
               CAST(bit_count(l_orderkey) AS INT) AS k_pop
        FROM lineitem
        WHERE l_orderkey < 2000
    """,
)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise algebra stays in whole-stage codegen — the substrate of the
    engine's own SimHash/LSH bucket arithmetic (band packing, Hamming
    probes). Shifts widen through BIGINT identically in both engines;
    per-row output, no trailing sort (driver compare is order-insensitive)."""
    li = load_table(spark, sf_dir, "lineitem")
    ln = F.col("l_linenumber").cast("long")
    k = F.col("l_orderkey")
    return li.filter(k < 2000).select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(ln).alias("k_and"),
        k.bitwiseOR(ln).alias("k_or"),
        k.bitwiseXOR(ln).alias("k_xor"),
        F.shiftleft(k, 3).alias("k_shl"),
        F.shiftright(k, 2).alias("k_shr"),
        F.bit_count(k).alias("k_pop"),
    )


@query(
    "scalar_struct_funcs",
    category="scalar",
    description="Nested struct columns: build, field access, array-of-struct transform",
    oracle="""
        SELECT o_orderkey,
               {'status': o_orderstatus, 'price': o_totalprice}.status AS s_status,
               FLOOR(({'status': o_orderstatus, 'price': o_totalprice}.price) * 100.0 + 0.5) / 100.0
                   AS s_price,
               len(list_transform(range(1, 4),
                   i -> {'k': i, 'v': o_orderkey * i})) AS n_pairs,
               array_to_string(list_transform(range(1, 4), i -> o_orderkey * i),
                               ',') AS key_multiples
        FROM orders
        WHERE o_orderkey < 500
    """,
)
def scalar_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested types as first-class columns — the capability the reference
    explicitly THROWS on (its write path rejects StructType/MapType,
    reference: ExtJdbcUtils.scala:175-178; SURVEY.md §1.5 upgrades this).
    Struct build + field access + array-of-struct transform, all inside
    whole-stage codegen; structs are flattened by Tungsten so the nesting
    costs nothing at execution."""
    o = load_table(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_orderstatus").alias("status"), F.col("o_totalprice").alias("price")
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.lit(3)),
        lambda i: F.struct(i.alias("k"), (F.col("o_orderkey") * i).alias("v")),
    )
    return o.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        s.getField("status").alias("s_status"),
        round_dbl(s.getField("price"), 2).alias("s_price"),
        F.size(pairs).alias("n_pairs"),
        # serialized, not array-typed: the driver's pandas canonicalizer
        # sorts output columns and cannot hash list cells
        F.concat_ws(
            ",", F.transform(pairs, lambda p: p.getField("v").cast("string"))
        ).alias("key_multiples"),
    )


@query(
    "scalar_variant_funcs",
    category="scalar",
    description="VariantType semi-structured access: parse_json -> variant_get/type/missing-path",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS INT) AS k_int,
               CAST(json_extract(props, '$.k') AS INT) % 10 AS k_mod,
               CAST(NULL AS VARCHAR) AS missing_path
        FROM events
    """,
)
def scalar_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's VariantType — the engine's semi-structured upgrade over
    both the reference (whose write path rejects anything nested,
    ExtJdbcUtils.scala:175-178) and stringly JSON: ``parse_json`` builds a
    binary variant ONCE, then typed ``variant_get`` paths read it without
    re-parsing (vs get_json_object re-parsing per call — the exact cost
    scalar_json_funcs' single-parse pattern works around). Missing paths
    via try_variant_get are NULL, not errors; the DuckDB twin models the
    same access over its native JSON."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return ev.select("event_id", v.alias("v")).select(
        "event_id",
        F.variant_get("v", "$.k", "int").alias("k_int"),
        (F.variant_get("v", "$.k", "int") % 10).alias("k_mod"),
        F.try_variant_get("v", "$.missing", "string").alias("missing_path"),
    )


_BIG = 9223372036854775807 - 250  # BIGINT max minus a headroom inside the key range


@query(
    "scalar_try_safe_funcs",
    category="scalar",
    description="ANSI-safe try_* family: divide-by-zero, BIGINT overflow, bad parse, OOB index",
    oracle=f"""
        SELECT o_orderkey,
               {sql_round_dbl('o_totalprice / (o_custkey % 3)')} AS safe_div,
               TRY_CAST(CAST({_BIG} AS HUGEINT) + o_orderkey AS BIGINT) AS safe_add,
               TRY_CAST(CASE WHEN o_orderstatus = 'O' THEN '123'
                             ELSE concat('x', o_orderstatus) END AS INT) AS parsed,
               [10, 20, 30][CAST(1 + o_orderkey % 5 AS INT)] AS elem
        FROM orders
        WHERE o_orderkey < 500
        ORDER BY o_orderkey
    """,
)
def scalar_try_safe_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI-mode safety surface: ``try_divide`` / ``try_add`` /
    ``try_cast`` / ``try_element_at`` return NULL where strict ANSI
    evaluation would abort the job — the contract that lets a 100 TB
    pipeline survive one malformed row without rerunning the stage, and
    the engine-native replacement for wrapping arithmetic in Python
    guards. Every edge is exercised BY THE DATA, not just typed:
    ~1/3 of rows divide by zero (``custkey % 3``), keys above 250
    overflow BIGINT in ``try_add``, non-'O' statuses fail the parse,
    and 2/5 of the array indexes run off the end.

    DuckDB needs no TRY on division or indexing (its default semantics
    are already NULL-on-edge there: ``1/0 → NULL``, OOB list index →
    NULL — probed, not assumed) but DOES need ``TRY_CAST`` for the
    overflow and parse arms — exactly the cross-engine semantic map
    this entry documents. All expressions are codegen JVM-side; no
    exchange beyond the pruned scan."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 500)
        .selectExpr(
            "o_orderkey",
            "try_divide(o_totalprice, o_custkey % 3) AS div_raw",
            f"try_add({_BIG}L, o_orderkey) AS safe_add",
            "try_cast(CASE WHEN o_orderstatus = 'O' THEN '123' "
            "ELSE concat('x', o_orderstatus) END AS INT) AS parsed",
            "try_element_at(array(10, 20, 30), "
            "CAST(1 + o_orderkey % 5 AS INT)) AS elem",
        )
    )
    return o.select(
        "o_orderkey",
        round_dbl(F.col("div_raw")).alias("safe_div"),
        "safe_add",
        "parsed",
        "elem",
    ).orderBy("o_orderkey")


@query(
    "scalar_sql_udf",
    category="scalar",
    description="Declarative SQL UDF (CREATE FUNCTION ... RETURN expr): reusable logic with no serialization tax",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n_items,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                    AS DECIMAL(18,6))), 2) AS DOUBLE) AS charged
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def scalar_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined functions (Spark 4): business logic named once with
    ``CREATE FUNCTION ... RETURNS ... RETURN <expr>`` and reused across
    queries — unlike a Python UDF, the body is INLINED by Catalyst into
    the calling plan (plain decimal arithmetic inside whole-stage
    codegen, zero serialization boundary; the oracle is the inlined
    expression, which is the point). The 100 TB relevance: shared
    semantic definitions (how "charged amount" is computed) stop drifting
    between pipelines without paying the Python-worker tax the UDF
    catalog's pandas entries measure. CREATE OR REPLACE is idempotent
    per session, like this catalog's staging writes."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION charged_amount("
        "price DECIMAL(18,6), disc DECIMAL(18,6), tax DECIMAL(18,6)) "
        "RETURNS DECIMAL(18,6) "
        "RETURN price * (1 - disc) * (1 + tax)"
    )
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("li_sqludf")
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_items,
               CAST(ROUND(SUM(charged_amount(
                    CAST(l_extendedprice AS DECIMAL(18,6)),
                    CAST(l_discount AS DECIMAL(18,6)),
                    CAST(l_tax AS DECIMAL(18,6)))), 2) AS DOUBLE) AS charged
        FROM li_sqludf
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query(
    "scalar_collation_ci_group",
    category="scalar",
    description="Case-insensitive grouping via UTF8_LCASE collation (engine-level, not lower()-rewrites)",
    oracle="""
        SELECT LOWER(et_mixed) AS event_type_ci,
               COUNT(*) AS n_events,
               CAST(COUNT(DISTINCT et_mixed) AS BIGINT) AS n_case_variants
        FROM (
            SELECT CASE WHEN event_id % 2 = 1 THEN UPPER(event_type)
                        ELSE event_type END AS et_mixed
            FROM events
        ) t
        GROUP BY LOWER(et_mixed)
        ORDER BY event_type_ci
    """,
)
def scalar_collation_ci_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4): comparison semantics live on the TYPE
    (``COLLATE(c, 'UTF8_LCASE')``), so grouping, joins, and DISTINCT are
    case-insensitive at the ENGINE level — hash/sort operators compare
    collation keys directly, instead of every query hand-wrapping
    ``lower()`` (and silently breaking on the next un-wrapped one). The
    mixed-case column is derived deterministically (odd event_ids
    uppercased) and ``n_case_variants`` = 2 per group proves the engine
    really merged binary-distinct strings. The oracle is the lower()
    rewrite — identical result, which is exactly the equivalence the
    collation feature guarantees."""
    ev = load_table(spark, sf_dir, "events")
    mixed = F.when(F.col("event_id") % 2 == 1, F.upper("event_type")).otherwise(
        F.col("event_type")
    )
    return (
        ev.select(mixed.alias("et_mixed"))
        .groupBy(F.expr("COLLATE(et_mixed, 'UTF8_LCASE')").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("et_mixed").cast("long").alias("n_case_variants"),
        )
        .select(
            F.lower("k").cast("string").alias("event_type_ci"),
            "n_events",
            "n_case_variants",
        )
        .orderBy("event_type_ci")
    )


@query(
    "scalar_regexp_funcs",
    category="scalar",
    description="Regexp function family: extract / extract-group / replace / count / boolean match",
    oracle=r"""
        SELECT p_partkey,
               regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
               regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
               regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
               CAST(LENGTH(p_name) - LENGTH(regexp_replace(p_name, '[aeiou]', '', 'g'))
                    AS BIGINT) AS n_vowels,
               regexp_matches(p_name, '^[a-z]+ [a-z]+$') AS two_words_exact
        FROM part
        WHERE p_partkey <= 500
        ORDER BY p_partkey
    """,
)
def scalar_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The regexp function family on one relation — extraction (whole
    match and a numbered group), global replacement, occurrence counting
    (spelled as a length delta, the one formulation both engines share
    verbatim), and boolean full-match. Patterns stay inside the
    character-class/anchor/group subset where Java regex (Spark) and RE2
    (DuckDB) agree by construction — the documented boundary: lookaround
    or backreferences would be Java-only and do NOT belong in a
    cross-engine pipeline contract. Spark's regexp_replace is
    global-by-default where DuckDB needs the 'g' flag; the oracle spells
    that explicitly.

    Plan shape: pure projection over the pruned, filter-pushed scan —
    regexps run inside whole-stage codegen, no UDF."""
    p = load_table(spark, sf_dir, "part")
    name = F.col("p_name")
    devow = F.regexp_replace(name, "[aeiou]", "_")
    gone = F.regexp_replace(name, "[aeiou]", "")
    return (
        p.filter(F.col("p_partkey") <= 500)
        .select(
            "p_partkey",
            F.regexp_extract(name, r"([a-z]+)", 1).alias("first_word"),
            F.regexp_extract(name, r"([a-z]+) ([a-z]+)", 2).alias("second_word"),
            devow.alias("devoweled"),
            (F.length(name) - F.length(gone)).cast("long").alias("n_vowels"),
            name.rlike(r"^[a-z]+ [a-z]+$").alias("two_words_exact"),
        )
        .orderBy("p_partkey")
    )
