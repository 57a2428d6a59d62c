"""TPC-H adapted corpus vs DuckDB oracle (reference test model:
TestTpchSingleMode.java / golden-baseline compare via TestBuilder)."""

from __future__ import annotations

import pytest

from drill_spark import tpch

from .conftest import SF_DIR, assert_same_results

NONEMPTY = {
    # queries that must return rows at sf0.001 to be meaningful
    "tpch_q01": 1,
    "tpch_q04": 1,
    "tpch_q05": 0,
    "tpch_q06": 1,
    "tpch_q13": 1,
}


@pytest.mark.parametrize("name", sorted(tpch.TPCH))
def test_tpch_query(name, spark, duck):
    df = tpch.queries()[name](spark, SF_DIR)
    assert_same_results(df, duck, tpch.TPCH[name], check_rows=NONEMPTY.get(name))
