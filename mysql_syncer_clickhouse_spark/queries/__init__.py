"""Registry of oracle-checkable queries.

Each submodule exports QUERIES (name -> callable(spark, sf_dir) ->
DataFrame) and ORACLE (name -> ANSI SQL for the DuckDB oracle; a name
missing from ORACLE gets a rows-only check by the driver).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import cdc, llm, relational, scalar, streaming_q, tpch

# Registry order is part of the correctness contract: the driver
# evaluates at most the FIRST 50 entries of all_queries(). The total is
# kept under 50 (merged same-shape variants; see each module's "merged
# registry queries" section) and the highest-value layers come first so
# a future addition that overflows the window can only push out a
# redundant relational variant, never an LLM/streaming/CDC component.
_MODULES = [llm, streaming_q, cdc, scalar, relational, tpch]
_MAX_REGISTRY = 50


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        dupes = out.keys() & m.QUERIES.keys()
        if dupes:
            raise ValueError(f"duplicate query names: {dupes}")
        out.update(m.QUERIES)
    if len(out) > _MAX_REGISTRY:
        raise ValueError(
            f"registry has {len(out)} entries; the driver checks only the "
            f"first {_MAX_REGISTRY} -- merge or demote before adding")
    return out


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    unknown = out.keys() - all_queries().keys()
    if unknown:
        raise ValueError(f"oracle entries without queries: {unknown}")
    return out
