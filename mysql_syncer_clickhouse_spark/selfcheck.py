"""Self-validation: run registry queries against their ANSI-SQL
oracle twins on DuckDB and compare rows + schema + values -- the same
gate the external correctness driver applies (__spark_entry__'s
queries()/oracle_sql() contract), packaged as a CLI mode so any
deployment can prove its install end-to-end on a fixture directory:

    python -m mysql_syncer_clickhouse_spark \\
        --selfcheck [q1_pricing_summary,join_asof] \\
        --sf-dir /root/testdata/sf0.01

Comparison is order-insensitive and type-canonical: columns sorted by
name, rows sorted under a None-safe key, Decimal->float, NaN->NULL,
dates as midnight datetimes (DuckDB returns date where Spark returns
timestamp for the same expression -- a comparator artifact, not a
divergence), floats rounded to 9 significant decimals to absorb
engine-formatting noise while still catching real arithmetic drift
(the repo's decimal-sum convention keeps true aggregates exact).
"""

from __future__ import annotations

import datetime
import decimal
import math
from typing import Callable

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def canon(v):
    """One value -> comparison-canonical form."""
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, float):
        # 9 SIGNIFICANT decimals (not decimal places): large-magnitude
        # doubles (TPC-H revenue sums ~1e9) must also absorb last-ulp
        # engine-formatting noise, or benign differences fail selfcheck
        return float(f"{v:.9g}")
    return v


def row_key(row: tuple):
    """None-safe, type-stable sort key (plain sorted() raises
    TypeError on rows containing NULLs)."""
    return tuple((v is None, str(type(v)), v if v is not None else 0)
                 for v in row)


def compare_one(spark, con, query: Callable, oracle_sql: str,
                sf_dir: str) -> dict:
    """One entry -> {'rows_match','schema_match','values_match',
    'n_rows', ...} (or {'err': ...})."""
    sdf = query(spark, sf_dir)
    scols = sorted(sdf.columns)
    srows = sorted((tuple(canon(r[c]) for c in scols)
                    for r in sdf.collect()), key=row_key)
    rel = con.execute(oracle_sql)
    ocols_raw = [d[0] for d in rel.description]
    order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
    ocols = [ocols_raw[i] for i in order]
    orows = sorted((tuple(canon(r[i]) for i in order)
                    for r in rel.fetchall()), key=row_key)
    out = {
        "schema_match": scols == ocols,
        "rows_match": len(srows) == len(orows),
        "values_match": srows == orows,
        "n_rows": len(srows),
    }
    if not out["schema_match"]:
        out["spark_cols"], out["oracle_cols"] = scols, ocols
    elif not out["values_match"] and srows and orows:
        bad = next((i for i, (a, b) in enumerate(zip(srows, orows))
                    if a != b), None)
        if bad is not None:
            out["first_diff"] = {"spark": srows[bad],
                                 "oracle": orows[bad]}
    return out


def run_selfcheck(sf_dir: str, names: list[str] | None = None, *,
                  spark=None) -> dict:
    """Run the registry (or `names`) against the oracles at `sf_dir`.
    Returns {"sf_dir", "checked", "passed", "failed": [...],
    "skipped_no_oracle": [...], "results": {name: {...}}}."""
    import os
    import sys

    import duckdb

    # __spark_entry__ sits at the repo root (the external driver's
    # import contract); make selfcheck runnable from any cwd
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if root not in sys.path:
        sys.path.insert(0, root)
    import __spark_entry__ as entry_mod
    from .session import get_spark
    spark = spark or get_spark("msc-selfcheck")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    wanted = sorted(names if names else qs)
    unknown = [n for n in wanted if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}; "
                         f"--query list shows all")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")
    results: dict[str, dict] = {}
    skipped, failed = [], []
    for name in wanted:
        if name not in oracles:
            skipped.append(name)     # rows-only entries (non-SQL ops)
            continue
        try:
            r = compare_one(spark, con, qs[name], oracles[name], sf_dir)
        except Exception as e:       # a failing entry must not hide
            r = {"err": f"{type(e).__name__}: {e}"[:300]}
        results[name] = r
        if r.get("err") or not (r.get("schema_match")
                                and r.get("rows_match")
                                and r.get("values_match")):
            failed.append(name)
    return {"mode": "selfcheck", "sf_dir": sf_dir,
            "checked": len(results), "passed": len(results) - len(failed),
            "failed": failed, "skipped_no_oracle": skipped,
            "results": results}
