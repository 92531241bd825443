"""dictGet analog: broadcast dimension lookup.

ClickHouse deployments fed by this kind of MySQL bridge lean heavily
on dictionaries (often MySQL-sourced) and dictGet/dictGetOrDefault in
queries. The Spark-native equivalent is a BROADCAST left join against
the dimension -- no shuffle of the fact table, the dimension ships to
every executor once, exactly a dictionary's distribution model. This
helper names that pattern and pins the plan:

    with_dict_attrs(facts, dim, on=("nation_id", "n_nationkey"),
                    attrs={"n_name": "nation_name"},
                    defaults={"nation_name": "UNKNOWN"})

- the dimension is explicitly F.broadcast()ed (a dictionary that does
  not fit in executor memory is a modeling error, same as ClickHouse);
- only the key + requested attributes are projected before the join
  (column pruning by construction);
- dictGetOrDefault semantics via per-attribute defaults (missing key
  -> default; no default -> NULL, dictGet's nullable form);
- duplicate dictionary keys are a data error ClickHouse rejects at
  dictionary load; here `strict=True` (default) adds a cheap
  broadcast-side dedup assertion column -- set strict=False to skip
  when the dimension is known unique (e.g. a primary key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_dict_attrs(facts: DataFrame, dim: DataFrame, *,
                    on: tuple[str, str],
                    attrs: dict[str, str],
                    defaults: dict[str, object] | None = None,
                    strict: bool = True) -> DataFrame:
    """facts + one column per attrs entry, looked up from `dim` via a
    broadcast left join. `on` = (fact key col, dim key col);
    `attrs` maps dim column -> output alias; `defaults` maps output
    alias -> value when the key is missing."""
    defaults = defaults or {}
    fact_key, dim_key = on
    unknown = set(defaults) - set(attrs.values())
    if unknown:
        raise ValueError(f"defaults for unknown attrs: {sorted(unknown)}")
    lookup = dim.select(
        F.col(dim_key).alias("__dict_key"),
        *[F.col(src).alias(f"__dict_{alias}")
          for src, alias in attrs.items()])
    if strict:
        # ClickHouse rejects duplicate dictionary keys at load; a
        # duplicate here would silently multiply fact rows. The dedup
        # runs on the broadcast side only (dictionary-sized).
        lookup = lookup.groupBy("__dict_key").agg(
            *[F.first(f"__dict_{a}").alias(f"__dict_{a}")
              for a in attrs.values()],
            F.count(F.lit(1)).alias("__dict_n"))
        lookup = lookup.withColumn(
            f"__dict_{next(iter(attrs.values()))}",
            F.when(F.col("__dict_n") == 1,
                   F.col(f"__dict_{next(iter(attrs.values()))}"))
             .otherwise(F.raise_error(F.concat(
                 F.lit("duplicate dictionary key: "),
                 F.col("__dict_key").cast("string"))))
        ).drop("__dict_n")
    out = facts.join(F.broadcast(lookup),
                     facts[fact_key] == lookup["__dict_key"], "left")
    for alias in attrs.values():
        col = F.col(f"__dict_{alias}")
        if alias in defaults:
            col = F.coalesce(col, F.lit(defaults[alias]))
        out = out.withColumn(alias, col)
    return out.drop("__dict_key",
                    *[f"__dict_{a}" for a in attrs.values()])
