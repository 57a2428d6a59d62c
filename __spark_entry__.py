"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries are contributed by drill_spark modules; each module exposes a
``queries()`` dict of (spark, sf_dir) -> DataFrame callables and an
``oracle_sql()`` dict of DuckDB-runnable SQL with matching column names.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULES = None


def _modules():
    global _MODULES
    if _MODULES is None:
        from drill_spark import tpch

        mods = [tpch]
        try:
            from drill_spark import relops

            mods.append(relops)
        except ImportError:
            pass
        try:
            from drill_spark import extops

            mods.append(extops)
        except ImportError:
            pass
        _MODULES = mods
    return _MODULES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1) on /root/testdata/sf0.001."""
    from drill_spark import tpch

    return tpch.queries()["tpch_q01"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        out.update(mod.queries())
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.oracle_sql())
    return out
