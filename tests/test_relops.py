"""Relational-operator coverage vs DuckDB oracle (reference model:
TestExampleQueries / TestSetOp / TestWindowFunctions / TestGroupingSetsResults)."""

from __future__ import annotations

import pytest

from drill_spark import relops

from .conftest import SF_DIR, assert_same_results


@pytest.mark.parametrize("name", sorted(relops.SPECS))
def test_relop(name, spark, duck):
    df = relops.queries()[name](spark, SF_DIR)
    assert_same_results(df, duck, relops.oracle_sql()[name])
