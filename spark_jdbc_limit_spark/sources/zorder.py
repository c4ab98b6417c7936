"""Z-order (Morton) clustering for multi-dimensional data skipping.

Parquet min/max statistics prune row groups only along the physical sort
order: a table linearly sorted by ``user_id`` answers user-range scans
with a handful of row groups but must read EVERY row group for a
``value``-range scan, because each group's value min/max spans the whole
domain. Interleaving the bits of both dimensions into one Morton key and
range-partitioning + sorting on it gives every file/row group a bounded
rectangle in (user_id, value) space — so predicates on EITHER dimension
(or both) skip most of the data. This is the layout trick behind
Delta/Iceberg OPTIMIZE ZORDER, built here from public primitives only:
a codegen'd bit-interleave expression, ``repartitionByRange`` (range
exchange with sampled bounds) and ``sortWithinPartitions``.

Scale notes:
- The z-value is a pure per-row expression (no shuffle of its own);
  the single range exchange is the same cost any sorted write pays.
- ``bits`` caps the per-dimension resolution; 16 bits/dim → 32-bit keys
  is plenty for row-group-granularity skipping (a 100 TB table has ~10⁷
  row groups; 2³² cells ≫ that).
- Inputs must be rank-like non-negative ints. For skewed or unbounded
  domains, bucketize first (e.g. ``F.ntile`` or width buckets) — the
  interleave needs uniform-ish bit utilization to balance rectangles.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_Z_COL = "__zvalue"


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Morton key: bit j of column i lands at position j * len(cols) + i.

    Built as a flat OR-tree of shift/mask primitives so the whole key
    stays inside whole-stage codegen (one projection, no UDF).
    """
    n = len(cols)
    parts = [
        F.shiftleft(F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1)), j * n + i)
        for i, c in enumerate(cols)
        for j in range(bits)
    ]
    return functools.reduce(lambda a, b: a.bitwiseOR(b), parts)


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: list[str],
    bits: int = 16,
    num_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the Morton key of ``zcols``."""
    z = interleave_bits([F.col(c) for c in zcols], bits=bits)
    (
        df.withColumn(_Z_COL, z)
        .repartitionByRange(num_files, _Z_COL)
        .sortWithinPartitions(_Z_COL)
        .drop(_Z_COL)
        .write.mode("overwrite")
        .parquet(path)
    )


def row_groups_matching(path: str, col_ranges: dict[str, tuple[float, float]]) -> tuple[int, int]:
    """(matching, total) parquet row groups whose min/max stats intersect
    every ``col -> (lo, hi)`` range — i.e. the row groups a stats-pruning
    reader would actually fetch for that conjunctive range predicate."""
    import glob
    import os

    import pyarrow.parquet as pq

    matching = total = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            hit = True
            for col, (lo, hi) in col_ranges.items():
                st = md.row_group(rg).column(names[col]).statistics
                if st is None or st.min is None:
                    continue  # no stats → reader must fetch
                if st.min > hi or st.max < lo:
                    hit = False
                    break
            matching += int(hit)
    return matching, total
