"""Engine config -- parses the reference's river.toml verbatim
(river/config.go:18-51, etc/river.toml) so an existing deployment's
config file drives this engine unchanged.

Field mapping to Spark concepts:
- data_dir          -> sink + checkpoint root (master.info analog is the
                       Structured Streaming offset log under it)
- bulk_size         -> maxFilesPerTrigger (micro-batch size cap;
                       river/sync.go:117-120)
- flush_bulk_time   -> processingTime trigger interval
                       (river/sync.go:122-125); batch drains use
                       availableNow instead
- thread            -> spark.sql.shuffle.partitions floor
                       (clickhouse/client.go:83's pool-size analog)
- source_addr/user/pass -> sources/jdbc.py connection settings (the
                       mysqldump/binlog endpoints; unused in the
                       file-changelog test path)
- skip_no_pk_table  -> rules without a PK are dropped instead of erroring
                       (river/river.go:283-291)
"""

from __future__ import annotations

import re
import tomllib
from dataclasses import dataclass, field

from .plans.rules import (Rule, RuleSet, expand_source_rules,
                          rules_from_config)

_DURATION_RE = re.compile(r"^(\d+)(ms|s|m|h)$")
_UNIT_MS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000}


def parse_duration_ms(text: str, default_ms: int = 200) -> int:
    """'1ms' / '3s' / '2m' -> milliseconds (flush_bulk_time format)."""
    m = _DURATION_RE.match(text.strip()) if text else None
    return int(m.group(1)) * _UNIT_MS[m.group(2)] if m else default_ms


@dataclass
class EngineConfig:
    rules: RuleSet
    # raw [[source]] blocks (schema + tables, possibly regex) -- the
    # reference's subscription set; effective_rules() expands them
    sources: list = field(default_factory=list)
    data_dir: str = "./log"
    bulk_size: int = 128
    flush_bulk_ms: int = 200
    threads: int = 10
    skip_no_pk_table: bool = False
    # the reference's -delete / -update flags
    # (clickhouse/client.go:240-243: FilterDelete/FilterUpdate --
    # skipped ops never reach the sink). DIVERGENCE, deliberate: the
    # reference defaults BOTH to true, silently dropping every
    # update/delete unless the operator passes -delete=false -- a
    # data-loss footgun; we default to applying everything and make
    # the skip an explicit opt-in (toml skip_delete/skip_update or
    # CLI --skip-delete/--skip-update).
    skip_delete: bool = False
    skip_update: bool = False
    source_addr: str | None = None
    source_user: str | None = None
    source_pass: str | None = None
    # reference river/config.go:22, wired at river.go:107 -- the
    # charset the replica declares in its handshake. sink_charset is
    # accepted-but-ignored: ClickHouse is UTF-8 only.
    source_charset: str | None = None
    # reference river/config.go:24-27 -- the ClickHouse endpoint. When
    # set, the CLI applies batches to ClickHouse (the reference's only
    # sink): native TCP for host:port (the reference's own transport),
    # the HTTP writer for http(s):// URLs. Unset -> file sinks.
    sink_addr: str | None = None
    sink_user: str | None = None
    sink_pass: str | None = None
    # TLS for the native sink (ClickHouse's secure port, 9440):
    # sink_secure=true uses the system trust store;
    # sink_ca=<pem path> pins a CA bundle (implies secure). HTTP(S)
    # sinks take the scheme from sink_addr instead.
    # reference river/config.go:30-31 -> database/sql pool knobs
    # (clickhouse/client.go:39-41). max_open caps CONCURRENT sink
    # connections; the Spark analog is capping insert partitions per
    # micro-batch (each partition opens one connection), so the sinks
    # coalesce to max_open before foreachPartition. max_connect
    # (SetMaxIdleConns) is accepted-but-ignored like sink_charset:
    # per-batch executor connections have no idle pool to size.
    max_open: int = 0
    max_connect: int = 0
    sink_secure: bool = False
    sink_ca: str | None = None
    # reference river/config.go:34 -- the pseudo-replica's identity on
    # the master (must be unique among its replicas)
    server_id: int = 1001
    # reference river/config.go:35 -- 'mysql' (default) or 'mariadb'.
    # The binlog v4 event layer is shared; (file, pos) dumping works
    # for both, MySQL GTID resume uses COM_BINLOG_DUMP_GTID
    # (SID-block sets) and MariaDB GTID resume announces
    # @slave_connect_state ('domain-server-seq' lists) before a plain
    # dump -- see sources/mysql_repl.py.
    flavor: str = "mysql"
    # reference river/config.go:38 -- where to serve /stat (+ /stacks)
    stat_addr: str | None = None
    # reference river/config.go:40 (toml key `mysqldump`, wired at
    # river.go:111 cfg.Dump.ExecutionPath) -- path to the mysqldump
    # binary the snapshot phase EXECUTES; empty/None skips exec-dump
    dump_exec: str | None = None
    # reference etc/river.toml `skip_master_data` -- set when the dump
    # user lacks RELOAD/SUPER for --master-data (no binlog position
    # will be captured; a subsequent --tail must start explicitly)
    skip_master_data: bool = False

    @classmethod
    def from_dict(cls, cfg: dict) -> EngineConfig:
        return cls(
            rules=rules_from_config(cfg),
            sources=[{"schema": b.get("schema", ""),
                      "tables": list(b.get("tables", []))}
                     for b in cfg.get("source", [])],
            data_dir=cfg.get("data_dir", "./log"),
            bulk_size=int(cfg.get("bulk_size", 128)),
            flush_bulk_ms=parse_duration_ms(cfg.get("flush_bulk_time", "")),
            threads=int(cfg.get("thread", 10)),
            skip_no_pk_table=bool(cfg.get("skip_no_pk_table", False)),
            skip_delete=bool(cfg.get("skip_delete", False)),
            skip_update=bool(cfg.get("skip_update", False)),
            source_addr=cfg.get("source_addr"),
            source_user=cfg.get("source_user"),
            source_pass=cfg.get("source_pass"),
            source_charset=cfg.get("source_charset"),
            sink_addr=cfg.get("sink_addr"),
            sink_user=cfg.get("sink_user"),
            sink_pass=cfg.get("sink_pass"),
            max_open=int(cfg.get("max_open", 0) or 0),
            max_connect=int(cfg.get("max_connect", 0) or 0),
            sink_secure=bool(cfg.get("sink_secure", False)),
            sink_ca=cfg.get("sink_ca") or None,
            server_id=int(cfg.get("server_id", 1001)),
            flavor=str(cfg.get("flavor", "mysql")),
            stat_addr=cfg.get("stat_addr"),
            dump_exec=cfg.get("mysqldump") or None,
            skip_master_data=bool(cfg.get("skip_master_data", False)),
        )

    @classmethod
    def from_toml(cls, path: str) -> EngineConfig:
        with open(path, "rb") as f:
            return cls.from_dict(tomllib.load(f))

    def effective_rules(self, available=None) -> RuleSet:
        """[[source]] defaults + [[rule]] overrides (the reference's
        prepareRule, river/river.go:238-276). `available` = the
        (schema, table) pairs the drain can actually see -- the
        file-source stand-in for live information_schema wildcard
        expansion. Without source blocks this is exactly `rules`."""
        if not self.sources:
            return self.rules
        return expand_source_rules(self.sources, self.rules, available)

    def skip_ops(self) -> tuple[str, ...]:
        """Ops the pipelines must drop before apply (the reference's
        FilterDelete/FilterUpdate surface)."""
        out = []
        if self.skip_delete:
            out.append("delete")
        if self.skip_update:
            out.append("update")
        return tuple(out)

    def sink_dir(self, rule: Rule) -> str:
        return f"{self.data_dir}/{rule.sink_schema}.{rule.sink_table}"

    def checkpoint_dir(self, rule: Rule) -> str:
        return f"{self.data_dir}/_checkpoints/{rule.sink_schema}.{rule.sink_table}"

    def trigger_kwargs(self, follow: bool) -> dict:
        """availableNow for a catch-up drain; the configured flush
        interval when following the stream."""
        if follow:
            return {"processing_time": f"{self.flush_bulk_ms} milliseconds"}
        return {}
