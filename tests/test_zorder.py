"""Z-order clustering: Morton-key math, layout correctness, and the
actual data-skipping payoff measured from parquet row-group statistics."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spark_jdbc_limit_spark.sources.catalog import load_table
from spark_jdbc_limit_spark.sources.zorder import (
    interleave_bits,
    row_groups_matching,
    write_zordered,
)


def test_interleave_bits_is_morton_order(spark):
    """Pin the interleave against hand-computed Morton codes."""
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3), (5, 6)], "x long, y long"
    )
    out = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", interleave_bits([F.col("x"), F.col("y")], bits=4).alias("z")
        ).collect()
    }
    # bit j of x -> position 2j; bit j of y -> position 2j+1
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 1
    assert out[(0, 1)] == 2
    assert out[(1, 1)] == 3
    # x=10 -> bit1 at pos 2; y=11 -> bits at pos 1,3 => 0b1110
    assert out[(2, 3)] == 0b1110
    # x=101 -> pos 0,4 (17); y=110 -> pos 3,5 (40)
    assert out[(5, 6)] == 57


def _events_2d(spark, sf_correct):
    ev = load_table(spark, sf_correct, "events")
    # bucketize both dims to rank-like non-negative ints
    return ev.select(
        "event_id",
        (F.col("user_id") % 1024).alias("u"),
        F.least(F.floor(F.col("value")).cast("long"), F.lit(1023)).alias("v"),
    ).filter(F.col("v") >= 0)


@pytest.fixture(scope="module")
def zorder_layouts(spark, sf_correct, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    src = _events_2d(spark, sf_correct)
    z_path, lin_path = str(base / "zord"), str(base / "linear")
    # Range-exchange bounds come from a reservoir SAMPLE whose seed shifts
    # with RDD ids, so file boundaries — and the row-group hit counts the
    # skipping assertions below compare — drift with suite ordering. A
    # sample hint >= the row count makes the bounds exact quantiles, so
    # both layouts are deterministic regardless of what ran before.
    key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    old = spark.conf.get(key)
    spark.conf.set(key, 1_000_000)
    try:
        write_zordered(src, z_path, ["u", "v"], bits=10, num_files=16)
        # the comparison layout: linearly sorted by the first dimension only
        (
            src.repartitionByRange(16, "u")
            .sortWithinPartitions("u")
            .write.mode("overwrite")
            .parquet(lin_path)
        )
    finally:
        spark.conf.set(key, old)
    return src, z_path, lin_path


def test_zorder_write_preserves_rows(spark, zorder_layouts):
    src, z_path, _ = zorder_layouts
    back = spark.read.parquet(z_path)
    assert back.count() == src.count()
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0


def test_zorder_skips_on_secondary_dimension(spark, zorder_layouts):
    """The payoff claim: for a range predicate on the SECOND dimension,
    a layout sorted by dim1 must fetch (nearly) every row group, while
    the z-ordered layout's bounded rectangles let most be skipped."""
    _, z_path, lin_path = zorder_layouts
    box = {"v": (100.0, 160.0)}
    z_hit, z_total = row_groups_matching(z_path, box)
    l_hit, l_total = row_groups_matching(lin_path, box)
    assert z_total > 4 and l_total > 4, "need multiple row groups to compare"
    assert l_hit / l_total > 0.9, "dim1-sorted layout cannot prune dim2"
    assert z_hit / z_total < 0.6, (
        f"z-order should skip most row groups, got {z_hit}/{z_total}"
    )
    # and the engine agrees on the answer either way
    a = spark.read.parquet(z_path).filter(F.col("v").between(100, 160))
    b = spark.read.parquet(lin_path).filter(F.col("v").between(100, 160))
    assert a.count() == b.count()


def test_zorder_skips_on_combined_box(spark, zorder_layouts):
    """A selective corner box prunes well under BOTH layouts (the linear
    layout's leading dim carries this box); the z-order claim is that it
    stays in the same ballpark here while utterly dominating on the
    secondary dimension (previous test) — the sum of the two cases is
    what a mixed workload sees."""
    _, z_path, lin_path = zorder_layouts
    box = {"u": (0.0, 37.0), "v": (0.0, 34.0)}
    z_hit, z_total = row_groups_matching(z_path, box)
    l_hit, l_total = row_groups_matching(lin_path, box)
    assert z_hit / z_total < 0.5
    assert z_hit <= l_hit + max(2, l_total // 8), (
        f"z-order fell too far behind the leading-dim layout on its own "
        f"best case: z {z_hit}/{z_total} vs linear {l_hit}/{l_total}"
    )


def test_interleave_bits_properties(spark):
    """Property-pin the Morton key: injective over the domain, and
    monotone along each axis when the other is fixed."""
    from hypothesis import given, settings, strategies as st

    def morton_py(x, y, bits=10):
        z = 0
        for j in range(bits):
            z |= ((x >> j) & 1) << (2 * j) | ((y >> j) & 1) << (2 * j + 1)
        return z

    @settings(max_examples=200, deadline=None)
    @given(st.integers(0, 1023), st.integers(0, 1023), st.integers(0, 1023))
    def check(x, y, y2):
        zx = morton_py(x, y)
        assert morton_py(x, y) == zx  # deterministic
        if y2 > y:
            assert morton_py(x, y2) > zx  # monotone in y for fixed x
    check()

    # spark expression agrees with the reference python bit-twiddle
    import pyspark.sql.functions as F
    from spark_jdbc_limit_spark.sources.zorder import interleave_bits

    rows = [(x, y) for x in (0, 1, 7, 512, 1023) for y in (0, 3, 8, 700, 1023)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", interleave_bits([F.col("x"), F.col("y")], bits=10).alias("z")).collect()
    for r in got:
        assert r.z == morton_py(r.x, r.y), (r.x, r.y)


# NOTE: parquet column bloom filters were evaluated here and dropped:
# parquet-mr skips bloom writing for dictionary-encoded columns, and every
# candidate column of the synthetic corpus dictionary-encodes (measured:
# zero byte delta with parquet.bloom.filter.enabled). Point-lookup
# skipping below min/max stats on this corpus therefore comes from the
# runtime bloom-filter JOIN pruning pinned in test_plans.py.


def test_zorder_audit_oracle_interleave_matches_spark_helper(spark):
    """The audit's DuckDB oracle re-derives the Morton key with integer
    div/mod SQL; pin that arithmetic against sources.zorder's shift/mask
    helper on adversarial bit patterns (all-ones, alternating, max-range)
    so the two definitions can never drift apart silently."""
    import duckdb

    from spark_jdbc_limit_spark.operators.advanced import (
        ZORDER_MAX_BITS,
        zorder_z_sql,
    )

    vals = [
        (0, 0),
        (1, 1),
        (32767, 32767),
        (21845, 10922),
        (19999, 999),
        (2, 1),
        # beyond the pre-round-10 15-bit constant: the oracle expression
        # is fixed at ZORDER_MAX_BITS, the helper must agree up there too
        (65541, 131072),
        ((1 << 20) + 3, (1 << 19) + 1),
        ((1 << 31) - 1, (1 << 31) - 1),
    ]
    df = spark.createDataFrame(vals, "l_partkey long, l_suppkey long")
    spark_z = [
        r.z
        for r in df.select(
            interleave_bits(
                [F.col("l_partkey"), F.col("l_suppkey")], bits=ZORDER_MAX_BITS
            ).alias("z")
        ).collect()
    ]
    sql = zorder_z_sql()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (l_partkey BIGINT, l_suppkey BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", vals)
    duck_z = [r[0] for r in con.execute(f"SELECT {sql} FROM t").fetchall()]
    con.close()
    assert spark_z == duck_z


def test_zorder_audit_scanned_rows_conserve(spark, sf_correct):
    """Pruned + scanned must account for every row in every layout, and
    the headline claim must hold: the lexicographic layout prunes ZERO
    blocks for the trailing-dimension box."""
    from spark_jdbc_limit_spark.operators import get_query

    total = load_table(spark, sf_correct, "lineitem").count()
    rows = {
        r.layout: r
        for r in get_query("sort_zorder_skipping_audit")
        .builder(spark, sf_correct)
        .collect()
    }
    lex, zo = rows["lex"], rows["zorder"]
    assert lex.pruned_trailing == 0
    assert zo.pruned_trailing > 0
    assert zo.scanned_trailing < total
    for r in (lex, zo):
        assert r.n_blocks == 64
        # scanned_* counts rows in unpruned blocks; pruned blocks hold
        # the remainder — equal-count blocks make this checkable
        assert r.scanned_trailing + (total // 64) * r.pruned_trailing <= total
        assert r.scanned_trailing >= total - (total // 64 + 1) * r.pruned_trailing


def _clone_sf0001_with_shifted_partkeys(tmp_path, shift: int) -> str:
    """Copy every sf0.001 table into tmp_path, shifting lineitem's
    l_partkey by ``shift`` — the synthetic-huge-key fixture for the
    adaptive-bits audit (the keys stay distinct and positive; only their
    magnitude changes). Written via pyarrow as SINGLE parquet files so
    the DuckDB oracle's exact-path views read them like the shipped
    testdata layout."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from spark_jdbc_limit_spark.sources.catalog import TABLES, table_path

    out = str(tmp_path / f"bigkeys_{shift}")
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(table_path("/root/testdata/sf0.001", t))
        if t == "lineitem":
            i = tbl.schema.get_field_index("l_partkey")
            shifted = pc.add(tbl.column("l_partkey").cast(pa.int64()), shift)
            tbl = tbl.set_column(i, "l_partkey", shifted)
        pq.write_table(tbl, f"{out}/{t}.parquet")
    return out


def test_zorder_audit_adapts_past_15_bit_keys(spark, tmp_path):
    """Round-9 verdict #5 'done' criterion: keys beyond the old 15-bit
    constant (here max(l_partkey) ≈ 2^17) run GREEN through the full
    audit + DuckDB oracle differential — the bit width now derives from
    the observed maxima instead of aborting on a tuned constant."""
    from spark_jdbc_limit_spark.operators import REGISTRY

    from tests.oracle_utils import run_differential

    d = _clone_sf0001_with_shifted_partkeys(tmp_path, 3 << 15)
    run_differential(spark, REGISTRY["sort_zorder_skipping_audit"], d)


def test_zorder_audit_raises_past_long_capacity(spark, tmp_path):
    """Past 2^31 a 2-D Morton key cannot fit a signed long at all — the
    audit must refuse with the named error, not truncate silently."""
    import pytest

    from spark_jdbc_limit_spark.operators import get_query

    d = _clone_sf0001_with_shifted_partkeys(tmp_path, 1 << 40)
    with pytest.raises(ValueError, match="Morton"):
        get_query("sort_zorder_skipping_audit").builder(spark, d)
