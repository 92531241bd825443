"""Replication rule model -- the reference's per-table config
(river/rule.go:9-23, river/config.go:18-51, etc/river.toml:51-60).

A Rule declares: source -> sink routing (R3), the synced column subset
(R4, column filter), field renames with optional ',list'/',date'
transform suffixes (R5/F7/F8, river/sync.go:317-332,428-455), and the
primary key (R7 -- composite keys handled correctly, unlike the
reference which silently uses only the first pair,
river/sync.go:387-413).

`apply_projection` turns a Rule into a plain `select()` so Catalyst
column-prunes the scan -- the Spark analog of the reference pruning the
synced column set to the sink schema (river/river.go:293-312).
"""

from __future__ import annotations

import fnmatch
import re
import tomllib
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.transforms import csv_to_list, unix_to_ts


@dataclass(frozen=True)
class Rule:
    source_schema: str
    source_table: str              # may be a regex (wildcard fan-in, S4)
    sink_schema: str
    sink_table: str
    pk: tuple[str, ...] = ("id",)
    column_filter: tuple[str, ...] | None = None   # None = all columns
    field_mapping: dict[str, str] = field(default_factory=dict)

    @property
    def key(self) -> str:
        # reference keys its rule map on lower(schema:table),
        # river/river.go:319-321
        return f"{self.source_schema}:{self.source_table}".lower()

    @property
    def sink(self) -> str:
        return f"{self.sink_schema}.{self.sink_table}"

    def _field_parts(self, src: str) -> tuple[str, str | None]:
        """'es_title' -> ('es_title', None); 'es_date,date' ->
        ('es_date', 'date')  (getFieldParts, river/sync.go:317-332)."""
        mapped = self.field_mapping.get(src, src)
        if "," in mapped:
            name, transform = mapped.split(",", 1)
            return (name or src), transform
        return mapped, None

    def projection(self, columns: list[str]) -> list[Column]:
        cols = [c for c in columns
                if self.column_filter is None or c in self.column_filter]
        out = []
        for c in cols:
            name, transform = self._field_parts(c)
            col = F.col(c)
            if transform == "list":
                col = csv_to_list(col)
            elif transform == "date":
                col = unix_to_ts(col)
            out.append(col.alias(name))
        return out

    def apply_projection(self, df: DataFrame) -> DataFrame:
        return df.select(*self.projection(df.columns))

    def pk_key(self) -> Column:
        """Composite-PK-correct document key (the reference intends
        'a:b' ids, river/river_test.go:109, but only uses the first
        column -- we do it right and note the divergence)."""
        return F.concat_ws(":", *[F.col(c).cast("string") for c in self.pk])


@dataclass
class RuleSet:
    rules: list[Rule]

    def match(self, schema: str, table: str) -> Rule | None:
        """Exact key match first, then regex source_table patterns
        (wildcard expansion, river/river.go:182-236)."""
        key = f"{schema}:{table}".lower()
        for r in self.rules:
            if r.key == key:
                return r
        for r in self.rules:
            if r.source_schema.lower() == schema.lower() and \
                    re.fullmatch(r.source_table, table, re.IGNORECASE):
                return r
        return None

    def table_regexes(self) -> list[str]:
        """The canal include-filter analog (river/river.go:114-118)."""
        return [rf"{r.source_schema}\.{r.source_table}" for r in self.rules]


def rules_from_config(cfg: dict) -> RuleSet:
    """Build rules from a parsed reference config. Accepts BOTH key
    shapes the reference uses: the shipped config's source_schema/
    source_table (etc/river.toml:56-60) and the older schema/table
    (river/river_test.go:88-124)."""
    rules = []
    for raw in cfg.get("rule", []):
        schema = raw.get("source_schema", raw.get("schema"))
        table = raw.get("source_table", raw.get("table"))
        rules.append(Rule(
            source_schema=schema,
            source_table=table,
            sink_schema=raw.get("sink_schema", schema),
            sink_table=raw.get("sink_table", table),
            pk=tuple(raw.get("id", ["id"])),
            column_filter=tuple(raw["filter"]) if "filter" in raw else None,
            field_mapping=dict(raw.get("field", {})),
        ))
    return RuleSet(rules)


def load_rules_toml(path: str) -> RuleSet:
    """Parse the reference's TOML [[rule]] shape (etc/river.toml:51-60)."""
    with open(path, "rb") as f:
        cfg = tomllib.load(f)
    return rules_from_config(cfg)


def wildcard_to_regex(pattern: str) -> str:
    return fnmatch.translate(pattern)
