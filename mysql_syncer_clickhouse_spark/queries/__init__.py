"""Registry of oracle-checkable queries.

Each submodule exports QUERIES (name -> callable(spark, sf_dir) ->
DataFrame) and ORACLE (name -> ANSI SQL for the DuckDB oracle; a name
missing from ORACLE gets a rows-only check by the driver).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import cdc, llm, relational, scalar, streaming_q

_MODULES = [relational, scalar, cdc, llm, streaming_q]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        dupes = out.keys() & m.QUERIES.keys()
        if dupes:
            raise ValueError(f"duplicate query names: {dupes}")
        out.update(m.QUERIES)
    return out


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    unknown = out.keys() - all_queries().keys()
    if unknown:
        raise ValueError(f"oracle entries without queries: {unknown}")
    return out
