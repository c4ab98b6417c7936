"""Differential correctness: every oracle-paired query in the registry,
run at sf0.01 (the driver's correctness scale factor)."""

from __future__ import annotations

import pytest

from spark_jdbc_limit_spark.operators import REGISTRY

from tests.oracle_utils import run_differential

ORACLE_SPECS = [spec for spec in REGISTRY.values() if spec.oracle is not None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_oracle_differential(spark, sf_correct, spec):
    run_differential(spark, spec, sf_correct)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
