"""Distributed as-of join (no native Spark SQL equivalent).

Strategy (scale-first): the classic union-merge. Tag left and right rows,
union them on a shared schema, and run ONE window over
(key, time, side-order): the most recent right-side payload is
``last(col, ignorenulls=True)`` over the preceding frame. Cost = one
shuffle + sort on the by-key — the same cost as a sort-merge join — with
no range-join row blowup (a naive ``l.t >= r.t`` join is O(|L|·|R|) per
key before the window trims it).

At 100 TB: the shuffle partitions by the by-key; a hot key (one user with
millions of events) serializes into one task — mitigate upstream by salting
the by-key and replicating right rows per salt, which this module supports
via ``num_salts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on_left: str,
    on_right: str,
    by_left: str,
    by_right: str,
    right_payload: list[str],
    suffix: str = "",
    num_salts: int = 1,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the payload of the most recent right row
    with ``right.on_right <= left.on_left`` and matching by-key
    (backward-inclusive as-of, DuckDB ``ASOF JOIN`` semantics).

    ``direction="forward"`` flips the inequality: the EARLIEST right row
    with ``right.on_right >= left.on_left`` wins (DuckDB ``ASOF ... ON
    l.t <= r.t``) — same union-merge, with the window frame mirrored to
    [current, following] and ``first(ignorenulls)`` instead of ``last``.

    Unmatched left rows keep NULL payload (left-outer as-of). If multiple
    right rows share (by, on) the one later in sort order wins — pre-dedupe
    the right side for full determinism.

    ``num_salts > 1`` splits each by-key into salt buckets: left rows are
    scattered, right rows replicated per salt, shrinking the per-task state
    for skewed keys at the cost of num_salts× right-side duplication.
    """
    payload = [c + suffix for c in right_payload]
    l_tagged = left.withColumn("__side", F.lit(1)).withColumn("__t", F.col(on_left))
    for src, dst in zip(right_payload, payload):
        l_tagged = l_tagged.withColumn(dst, F.lit(None).cast(right.schema[src].dataType))
    r_tagged = right.select(
        F.col(by_right).alias(by_left),
        F.col(on_right).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(src).alias(dst) for src, dst in zip(right_payload, payload)],
    )
    left_cols = [c for c in left.columns]
    if num_salts > 1:
        l_tagged = l_tagged.withColumn("__salt", F.pmod(F.xxhash64(*left_cols), F.lit(num_salts)))
        r_tagged = r_tagged.crossJoin(
            F.broadcast(l_tagged.sparkSession.range(num_salts).select(F.col("id").alias("__salt")))
        )
        part_keys = [by_left, "__salt"]
    else:
        l_tagged = l_tagged.withColumn("__salt", F.lit(0))
        r_tagged = r_tagged.withColumn("__salt", F.lit(0))
        part_keys = [by_left]

    unioned = l_tagged.select(by_left, "__t", "__side", "__salt", *payload, *[
        c for c in left_cols if c != by_left
    ]).unionByName(r_tagged, allowMissingColumns=True)

    if direction == "backward":
        # Right rows (__side=0) sort before left rows at equal time → inclusive.
        w = (
            W.partitionBy(*part_keys)
            .orderBy(F.col("__t").asc(), F.col("__side").asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        fills = [F.last(c, ignorenulls=True).over(w) for c in payload]
    elif direction == "forward":
        # Right rows sort AFTER left rows at equal time so the
        # [current, following] frame still sees an equal-time right row.
        w = (
            W.partitionBy(*part_keys)
            .orderBy(F.col("__t").asc(), F.col("__side").desc())
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        fills = [F.first(c, ignorenulls=True).over(w) for c in payload]
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    filled = unioned.select(
        "*", *[fill.alias(c + "__filled") for c, fill in zip(payload, fills)]
    )
    return (
        filled.filter(F.col("__side") == 1)
        .select(
            *left_cols,
            *[F.col(c + "__filled").alias(c) for c in payload],
        )
    )
