"""MySQL DDL replication -> ClickHouse schema evolution
(sources/ddl.py): statement parsing, rule re-expression, ClickHouse
emission, sink column-model refresh, and the binlog QUERY-event
surfacing the reference only checkpoints past (OnDDL,
river/sync.go:62-65)."""

from __future__ import annotations

import pytest

from mysql_syncer_clickhouse_spark.plans.rules import Rule
from mysql_syncer_clickhouse_spark.sources import ddl as D
from mysql_syncer_clickhouse_spark.sources.binlog import (
    decode_binlog_ddl, decode_binlog_file_bytes, read_binlog_ddl)
from mysql_syncer_clickhouse_spark.sources.binlog_writer import (
    BinlogColumn, BinlogFileWriter)


# ------------------------------------------------------------ parse

def _one(sql, **kw):
    acts = D.parse_mysql_ddl(sql, **kw)
    assert len(acts) == 1, acts
    return acts[0]


def test_parse_add_column_forms():
    a = _one("ALTER TABLE shop.items ADD COLUMN price "
             "decimal(10,2) NOT NULL AFTER `title`")
    assert (a.kind, a.schema, a.table) == ("add_column", "shop", "items")
    assert (a.column, a.mysql_type, a.nullable, a.after) == \
        ("price", "decimal(10,2)", False, "title")

    a = _one("alter table `items` add `flags` bigint unsigned first",
             default_schema="shop")
    assert (a.schema, a.column, a.mysql_type, a.first) == \
        ("shop", "flags", "bigint unsigned", True)

    # parenthesized multi-add; enum with a quoted comma must not split
    acts = D.parse_mysql_ddl(
        "ALTER TABLE s.t ADD COLUMN (a int, b enum('x,y','z') "
        "NOT NULL)")
    assert [x.kind for x in acts] == ["add_column", "add_column"]
    assert acts[1].mysql_type == "enum('x,y','z')"
    assert acts[1].nullable is False

    a = _one("ALTER TABLE s.t ADD COLUMN IF NOT EXISTS c text NULL")
    assert (a.column, a.mysql_type, a.nullable) == ("c", "text", True)


def test_parse_multi_clause_and_ignored():
    acts = D.parse_mysql_ddl(
        "ALTER TABLE s.t ADD COLUMN a int, DROP COLUMN b, "
        "ADD INDEX idx_a (a), DROP PRIMARY KEY, MODIFY c varchar(64), "
        "CHANGE old_c new_c bigint NOT NULL, RENAME COLUMN p TO q, "
        "ENGINE=InnoDB, ALGORITHM=INPLACE, LOCK=NONE")
    kinds = [x.kind for x in acts]
    assert kinds == ["add_column", "drop_column", "ignored", "ignored",
                     "modify_column", "change_column", "rename_column",
                     "ignored", "ignored", "ignored"]
    ch = acts[5]
    assert (ch.column, ch.new_name, ch.mysql_type, ch.nullable) == \
        ("old_c", "new_c", "bigint", False)
    rn = acts[6]
    assert (rn.column, rn.new_name) == ("p", "q")


def test_parse_default_string_does_not_trip_keywords():
    # 'NOT NULL' / 'AFTER x' inside string literals must not parse as
    # constraints or position hints
    a = _one("ALTER TABLE s.t ADD c varchar(32) DEFAULT 'NOT NULL'")
    assert a.nullable is True and a.after is None and not a.first
    a = _one("ALTER TABLE s.t ADD c varchar(32) COMMENT 'AFTER id'")
    assert a.after is None


def test_parse_table_level_statements():
    acts = D.parse_mysql_ddl("RENAME TABLE s.a TO s.b, c TO d",
                             default_schema="dflt")
    assert [(x.schema, x.table, x.new_name) for x in acts] == \
        [("s", "a", "b"), ("dflt", "c", "d")]
    a = _one("TRUNCATE TABLE shop.items")
    assert (a.kind, a.table) == ("truncate", "items")
    a = _one("truncate items", default_schema="shop")
    assert (a.kind, a.schema) == ("truncate", "shop")
    acts = D.parse_mysql_ddl("DROP TABLE IF EXISTS s.a, b",
                             default_schema="dflt")
    assert [(x.kind, x.schema, x.table) for x in acts] == \
        [("drop_table", "s", "a"), ("drop_table", "dflt", "b")]


def test_parse_create_table():
    a = _one("CREATE TABLE IF NOT EXISTS shop.items ("
             "id bigint unsigned NOT NULL, title varchar(64), "
             "tags enum('a','b') NOT NULL, KEY k (title), "
             "PRIMARY KEY (id)) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4")
    assert a.kind == "create_table"
    assert a.columns == (("id", "bigint unsigned", False),
                         ("title", "varchar(64)", True),
                         ("tags", "enum('a','b')", False))
    assert a.pk == ("id",)


def test_parse_non_ddl_returns_empty():
    for stmt in ["BEGIN", "COMMIT",
                 "INSERT INTO t VALUES (1)",
                 "UPDATE t SET a=1",
                 "SET NAMES utf8mb4",
                 "GRANT ALL ON *.* TO 'u'@'%'",
                 "CREATE DATABASE shop",
                 "CREATE INDEX i ON t (a)",
                 "CREATE OR REPLACE VIEW v AS SELECT 1",
                 "DROP TEMPORARY TABLE tmp1",
                 "ANALYZE TABLE t",
                 "XA START 'x'",
                 ""]:
        assert D.parse_mysql_ddl(stmt) == [], stmt


def test_parse_versioned_comment_wrapping():
    # mysqldump wraps DDL in /*!NNNNN ... */ -- content must survive
    a = _one("/*!40101 ALTER TABLE s.t ADD c int */;")
    assert (a.kind, a.column) == ("add_column", "c")
    # plain comments and -- lines are stripped
    a = _one("ALTER TABLE s.t /* web release */ ADD c int -- ticket 7")
    assert a.kind == "add_column"


# ----------------------------------------------------- clickhouse ddl

def test_clickhouse_ddl_per_kind():
    add = _one("ALTER TABLE s.t ADD c smallint NOT NULL AFTER b")
    assert D.clickhouse_ddl(add, database="olap", table="t_sink") == \
        ["ALTER TABLE `olap`.`t_sink` ADD COLUMN IF NOT EXISTS `c` "
         "Int16 AFTER `b`"]
    # nullable wraps; pk columns stay bare
    add2 = _one("ALTER TABLE s.t ADD c int")
    assert "Nullable(Int32)" in D.clickhouse_ddl(
        add2, database="olap", table="t")[0]
    assert "`c` Int32" in D.clickhouse_ddl(
        add2, database="olap", table="t", pk=("c",))[0]

    drop = _one("ALTER TABLE s.t DROP COLUMN c")
    assert D.clickhouse_ddl(drop, database="olap", table="t") == \
        ["ALTER TABLE `olap`.`t` DROP COLUMN IF EXISTS `c`"]

    mod = _one("ALTER TABLE s.t MODIFY c varchar(128) NOT NULL")
    assert D.clickhouse_ddl(mod, database="olap", table="t") == \
        ["ALTER TABLE `olap`.`t` MODIFY COLUMN `c` String"]

    # CHANGE = rename + retype, two ordered statements
    ch = _one("ALTER TABLE s.t CHANGE a b bigint NOT NULL")
    assert D.clickhouse_ddl(ch, database="olap", table="t") == \
        ["ALTER TABLE `olap`.`t` RENAME COLUMN `a` TO `b`",
         "ALTER TABLE `olap`.`t` MODIFY COLUMN `b` Int64"]
    # same-name CHANGE is just a MODIFY
    ch2 = _one("ALTER TABLE s.t CHANGE a a bigint NOT NULL")
    assert len(D.clickhouse_ddl(ch2, database="olap", table="t")) == 1

    tr = _one("TRUNCATE TABLE s.t")
    assert D.clickhouse_ddl(tr, database="olap", table="t") == \
        ["TRUNCATE TABLE `olap`.`t`"]

    rt = _one("ALTER TABLE s.t RENAME TO t2")
    assert D.clickhouse_ddl(rt, database="olap", table="t") == \
        ["RENAME TABLE `olap`.`t` TO `olap`.`t2`"]

    ct = _one("CREATE TABLE s.t (id bigint NOT NULL, v text, "
              "PRIMARY KEY (id))")
    [sql] = D.clickhouse_ddl(ct, database="olap", table="t")
    assert sql.startswith("CREATE TABLE IF NOT EXISTS `olap`.`t` ")
    assert "`id` Int64" in sql and "ORDER BY (`id`)" in sql

    ign = _one("ALTER TABLE s.t ADD INDEX i (a)")
    assert D.clickhouse_ddl(ign, database="olap", table="t") == []


# ------------------------------------------------------- rule mapping

RULE = Rule(source_schema="shop", source_table="items",
            sink_schema="olap", sink_table="items_sink",
            pk=("id",), column_filter=("id", "title", "csv"),
            field_mapping={"title": "es_title", "csv": "tags,list"})


def test_map_action_filters_renames_and_transforms():
    # other table -> None
    assert D.map_action(
        _one("ALTER TABLE shop.other ADD c int"), RULE) is None
    # unsynced column -> None
    assert D.map_action(
        _one("ALTER TABLE shop.items ADD c int"), RULE) is None
    # renamed column lands under the SINK name
    a = D.map_action(
        _one("ALTER TABLE shop.items MODIFY title varchar(128)"), RULE)
    assert (a.schema, a.table, a.column) == \
        ("olap", "items_sink", "es_title")
    # ',list' transform re-types: the sink stores Array(String)
    a = D.map_action(
        _one("ALTER TABLE shop.items MODIFY csv text"), RULE)
    assert (a.column, a.mysql_type) == ("tags", "list")
    assert "Array(String)" in D.clickhouse_ddl(
        a, database="olap", table="items_sink")[0]
    # AFTER hint maps too; an unsynced AFTER column degrades to append
    a = D.map_action(
        _one("ALTER TABLE shop.items ADD title varchar(8) AFTER csv"),
        RULE)
    assert a.after == "tags"
    # source-side RENAME TABLE does not move the rule-addressed sink
    assert D.map_action(
        _one("ALTER TABLE shop.items RENAME TO items2"), RULE) is None
    # truncate carries through to the sink table
    a = D.map_action(_one("TRUNCATE shop.items"), RULE)
    assert (a.kind, a.table) == ("truncate", "items_sink")


def test_map_action_wildcard_rule():
    wild = Rule(source_schema="shop", source_table="logs_\\d+",
                sink_schema="olap", sink_table="logs_all", pk=("id",))
    a = D.map_action(_one("ALTER TABLE shop.logs_7 ADD c int"), wild)
    assert (a.table, a.column) == ("logs_all", "c")
    assert D.map_action(
        _one("ALTER TABLE shop.users ADD c int"), wild) is None


# ------------------------------------------------- column-model refresh

def test_apply_to_columns_positions_and_mutations():
    cols = [("id", "bigint", False), ("a", "int", True),
            ("b", "text", True)]
    add = _one("ALTER TABLE s.t ADD c smallint AFTER a")
    assert [c[0] for c in D.apply_to_columns(cols, add)] == \
        ["id", "a", "c", "b"]
    addf = _one("ALTER TABLE s.t ADD z int FIRST")
    assert D.apply_to_columns(cols, addf)[0] == ("z", "int", True)
    # AFTER an unknown column appends (same degrade as MySQL errors,
    # but the model must never lose the column)
    addu = _one("ALTER TABLE s.t ADD c int AFTER nope")
    assert [c[0] for c in D.apply_to_columns(cols, addu)][-1] == "c"
    drop = _one("ALTER TABLE s.t DROP COLUMN a")
    assert [c[0] for c in D.apply_to_columns(cols, drop)] == ["id", "b"]
    mod = _one("ALTER TABLE s.t MODIFY a bigint NOT NULL")
    assert D.apply_to_columns(cols, mod)[1] == ("a", "bigint", False)
    ch = _one("ALTER TABLE s.t CHANGE a a2 bigint")
    assert D.apply_to_columns(cols, ch)[1] == ("a2", "bigint", True)
    rn = _one("ALTER TABLE s.t RENAME COLUMN b TO b2")
    assert D.apply_to_columns(cols, rn)[2] == ("b2", "text", True)
    ct = _one("CREATE TABLE s.t (x int NOT NULL, PRIMARY KEY (x))")
    assert D.apply_to_columns(cols, ct) == [("x", "int", False)]
    tr = _one("TRUNCATE s.t")
    assert D.apply_to_columns(cols, tr) == cols


# ------------------------------------------------------ sink end-to-end

@pytest.fixture()
def fake_ch():
    from tests.test_clickhouse_sink import _FakeClickHouse
    srv = _FakeClickHouse().start()
    yield srv
    srv.stop()


def test_apply_ddl_to_sink_http(fake_ch):
    from tests.test_clickhouse_sink import COLUMNS, _sink
    sink = _sink(fake_ch.url)
    actions = D.parse_mysql_ddl(
        "ALTER TABLE shop.items ADD COLUMN price decimal(10,2) "
        "NOT NULL AFTER title, DROP COLUMN mydate, ADD INDEX i (id)")
    executed = D.apply_ddl_to_sink(sink, actions)
    assert executed == [
        "ALTER TABLE `olap`.`items_sink` ADD COLUMN IF NOT EXISTS "
        "`price` Decimal(10,2) AFTER `title`",
        "ALTER TABLE `olap`.`items_sink` DROP COLUMN IF EXISTS "
        "`mydate`"]
    # the fake server saw exactly those statements, in order
    assert [q for q, _ in fake_ch.requests] == executed
    # the column model evolved in lock-step
    names = [c[0] for c in sink.columns]
    assert names == ["seq", "op", "id", "title", "price"]
    assert ("price", "decimal(10,2)", False) in [tuple(c)
                                                 for c in sink.columns]
    assert len(COLUMNS) == 5   # the shared fixture itself is untouched


def test_apply_ddl_to_sink_with_rule(fake_ch):
    from tests.test_clickhouse_sink import _sink
    sink = _sink(fake_ch.url)
    sink.columns = [("id", "bigint", False), ("es_title", "text", True),
                    ("tags", "list", True)]
    actions = D.parse_mysql_ddl(
        "ALTER TABLE shop.items MODIFY title varchar(128) NOT NULL, "
        "ADD secret int")        # 'secret' is filtered by the rule
    executed = D.apply_ddl_to_sink(sink, actions, rule=RULE)
    assert executed == [
        "ALTER TABLE `olap`.`items_sink` MODIFY COLUMN `es_title` "
        "String"]
    assert ("es_title", "varchar(128)", False) in [
        tuple(c) for c in sink.columns]
    assert "secret" not in [c[0] for c in sink.columns]


# --------------------------------------------------- binlog surfacing

def _binlog_with_ddl() -> bytes:
    w = BinlogFileWriter("shop", "items",
                         [BinlogColumn.bigint("id"),
                          BinlogColumn.varchar("title")])
    w.insert([[1, "a"], [2, "b"]])
    w.xid(7)
    w.ddl("BEGIN")                       # transaction marker: filtered
    w.ddl("ALTER TABLE items ADD COLUMN price decimal(10,2) "
          "NOT NULL AFTER title")        # schema from the event header
    w.insert([[3, "c"]])
    w.xid(8)
    w.ddl("TRUNCATE TABLE shop.items")
    return w.to_bytes()


def test_decode_binlog_ddl_filters_and_orders():
    data = _binlog_with_ddl()
    ddls = decode_binlog_ddl("mysql-bin.000001", data)
    assert [d["query"].split()[0] for d in ddls] == ["ALTER", "TRUNCATE"]
    assert all(d["db"] == "shop" for d in ddls)
    assert ddls[0]["pos"] < ddls[1]["pos"]
    # default_schema from the event header completes unqualified DDL
    acts = D.parse_mysql_ddl(ddls[0]["query"],
                             default_schema=ddls[0]["db"])
    assert (acts[0].schema, acts[0].column) == ("shop", "price")
    # the envelope decode is unaffected by interleaved QUERY events
    env = decode_binlog_file_bytes("mysql-bin.000001", data)
    assert [e["op"] for e in env] == ["insert"] * 3


def test_read_binlog_ddl_spark(spark, tmp_path):
    (tmp_path / "mysql-bin.000001").write_bytes(_binlog_with_ddl())
    w2 = BinlogFileWriter("shop", "items", [BinlogColumn.bigint("id")])
    w2.ddl("DROP TABLE shop.items")
    (tmp_path / "mysql-bin.000002").write_bytes(w2.to_bytes())
    rows = (read_binlog_ddl(spark, str(tmp_path))
            .orderBy("file", "pos").collect())
    assert [r["query"].split()[0] for r in rows] == \
        ["ALTER", "TRUNCATE", "DROP"]
    assert rows[0]["file"] == "mysql-bin.000001"
    assert rows[-1]["file"] == "mysql-bin.000002"


def test_parse_error_surfaces_loudly():
    with pytest.raises(ValueError):
        D.parse_mysql_ddl("RENAME TABLE gibberish")
    with pytest.raises(ValueError):
        D.parse_mysql_ddl("ALTER TABLE s.t ADD c badtype(")


def test_virtual_generated_columns_ignored_stored_kept():
    """VIRTUAL generated columns never appear in binlog row images --
    their ADD must not create a forever-NULL sink column; STORED ones
    DO appear and replicate normally (MySQL defaults to VIRTUAL when
    neither keyword is given)."""
    a = _one("ALTER TABLE s.t ADD full_name varchar(64) "
             "GENERATED ALWAYS AS (CONCAT(a, b)) VIRTUAL")
    assert a.kind == "ignored"
    a = _one("ALTER TABLE s.t ADD doubled int AS (qty * 2)")
    assert a.kind == "ignored"          # bare AS(...) = VIRTUAL
    a = _one("ALTER TABLE s.t ADD doubled int "
             "GENERATED ALWAYS AS (qty * 2) STORED")
    assert (a.kind, a.column) == ("add_column", "doubled")
    # multi-add form: the virtual one drops, the plain one stays
    acts = D.parse_mysql_ddl(
        "ALTER TABLE s.t ADD COLUMN (v int AS (a+1), w int)")
    assert [x.kind for x in acts] == ["ignored", "add_column"]
    # a DEFAULT string containing 'AS (' must not trip the detector
    a = _one("ALTER TABLE s.t ADD c varchar(20) DEFAULT 'AS (x)'")
    assert a.kind == "add_column"


def test_drop_table_restrict_cascade_tail():
    acts = D.parse_mysql_ddl("DROP TABLE s.a, b CASCADE",
                             default_schema="d")
    assert [(x.kind, x.schema, x.table) for x in acts] == \
        [("drop_table", "s", "a"), ("drop_table", "d", "b")]
    acts = D.parse_mysql_ddl("DROP TABLE IF EXISTS a RESTRICT")
    assert [(x.kind, x.table) for x in acts] == [("drop_table", "a")]


def test_strip_strings_is_length_preserving():
    """Escaped quotes ('' and \\') consume 2 chars each -- the blanked
    text must stay index-aligned with the original, or AFTER/comment
    spans computed on it slice the wrong original text (r12 ADVICE
    high: after='fo', stray-backtick idents, 'int' truncated to 'in'
    and silently String-mapped)."""
    a = _one(r"ALTER TABLE s.t ADD c varchar(10) DEFAULT 'a\'b' "
             r"AFTER foo")
    assert a.after == "foo"
    a = _one("ALTER TABLE s.t ADD c varchar(10) DEFAULT 'it''s' "
             "AFTER `order_id`")
    assert a.after == "order_id"
    # a '' escape before a line comment: the cut index must not
    # truncate the FOLLOWING clause's type
    acts = D.parse_mysql_ddl(
        "ALTER TABLE s.t ADD cc int COMMENT 'it''s', ADD dd int# trail")
    assert [(x.column, x.mysql_type) for x in acts] == \
        [("cc", "int"), ("dd", "int")]
    # '#' inside a backtick identifier is not a comment start
    a = _one("ALTER TABLE s.t ADD `c#1` int AFTER `a#2`")
    assert (a.column, a.after) == ("c#1", "a#2")
    # direct property: blanked output length == input length
    for s in ["DEFAULT 'a\\'b' AFTER x", "DEFAULT 'it''s'",
              "`we``ird` int", 'DEFAULT "d""q"', "plain text"]:
        assert len(D._strip_strings(s)) == len(s)


def test_create_table_options_with_parens():
    """Table options containing ')' (COMMENT 'x (y)', PARTITION BY)
    must not leak into the column list (r12 ADVICE low: the greedy
    regex captured up to the LAST paren)."""
    a = _one("CREATE TABLE s.t (id bigint NOT NULL, v text, "
             "PRIMARY KEY (id)) ENGINE=InnoDB COMMENT 'x (y)' "
             "PARTITION BY RANGE (id) "
             "(PARTITION p0 VALUES LESS THAN (10))")
    assert a.kind == "create_table"
    assert a.columns == (("id", "bigint", False), ("v", "text", True))
    assert a.pk == ("id",)


def test_create_table_like_and_as_select():
    """CREATE TABLE ... LIKE parses TYPED (the OSC shadow opener);
    AS SELECT / (cols) SELECT are visible 'ignored' actions, never a
    silent [] (r12 VERDICT missing #1)."""
    a = _one("CREATE TABLE `_t_new` LIKE `t`", default_schema="app")
    assert (a.kind, a.schema, a.table) == \
        ("create_table_like", "app", "_t_new")
    assert (a.like_schema, a.like_table) == ("app", "t")
    a = _one("CREATE TABLE shop.t2 LIKE shop.t1")
    assert (a.like_schema, a.like_table) == ("shop", "t1")
    for stmt in ["CREATE TABLE t2 AS SELECT * FROM t1",
                 "CREATE TABLE t2 SELECT b FROM t1",
                 "CREATE TABLE t2 (a int) SELECT b FROM t1"]:
        a = _one(stmt, default_schema="app")
        assert (a.kind, a.table) == ("ignored", "t2"), stmt
    # a mapped create_table_like is visible but not actionable (the
    # rule-addressed sink already exists; LIKE columns are unknowable)
    a = D.map_action(_one("CREATE TABLE shop.items LIKE shop.tmpl"),
                     RULE)
    assert a.kind == "ignored"


def test_rename_table_carries_new_schema():
    acts = D.parse_mysql_ddl(
        "RENAME TABLE a.t TO b.t2, u TO v", default_schema="dflt")
    assert [(x.schema, x.table, x.new_schema, x.new_name)
            for x in acts] == \
        [("a", "t", "b", "t2"), ("dflt", "u", "dflt", "v")]
    a = _one("ALTER TABLE a.t RENAME TO b.t2")
    assert (a.new_schema, a.new_name) == ("b", "t2")


# ------------------------------------------------ OSC shadow ledger

LEDGER_RULE = Rule(source_schema="app", source_table="items",
                   sink_schema="olap", sink_table="items_sink",
                   pk=("id",), field_mapping={"title": "es_title"})

PT_OSC_SEQUENCE = [
    "CREATE TABLE `_items_new` LIKE `items`",
    "ALTER TABLE _items_new ADD COLUMN price decimal(10,2) NOT NULL "
    "AFTER title",
    "ALTER TABLE _items_new MODIFY title varchar(200) NOT NULL",
    "RENAME TABLE items TO _items_old, _items_new TO items",
]


def _feed(ledger, stmts, rules):
    replays, warnings = [], []
    for stmt in stmts:
        for a in D.parse_mysql_ddl(stmt, default_schema="app"):
            r, w = ledger.observe(a, rules)
            replays.extend(r)
            warnings.extend(w)
    return replays, warnings


def test_shadow_ledger_replays_pt_osc_swap():
    """The pt-osc/gh-ost shadow-migration sequence -- invisible to
    per-statement rule mapping (every arm maps to None) -- replays the
    shadow's accumulated ALTERs onto the sink at the cut-over RENAME,
    re-addressed through the rule (rename + type both honored)."""
    led = D.ShadowLedger()
    replays, warnings = _feed(led, PT_OSC_SEQUENCE, [LEDGER_RULE])
    assert warnings == []
    assert len(replays) == 1
    rule, acts = replays[0]
    assert rule is LEDGER_RULE
    stmts = [s for a in acts
             for s in D.clickhouse_ddl(D.map_action(a, rule),
                                       database=rule.sink_schema,
                                       table=rule.sink_table)]
    assert stmts == [
        "ALTER TABLE `olap`.`items_sink` ADD COLUMN IF NOT EXISTS "
        "`price` Decimal(10,2) AFTER `es_title`",
        "ALTER TABLE `olap`.`items_sink` MODIFY COLUMN `es_title` "
        "String"]
    assert led.to_state() == {}       # cut-over consumed the entry


def test_shadow_ledger_state_round_trip_mid_migration():
    """A real OSC migration spans hours of poll cycles -- the ledger
    must survive the watermark's JSON round-trip mid-flight."""
    import json as _json
    led = D.ShadowLedger()
    _feed(led, PT_OSC_SEQUENCE[:2], [LEDGER_RULE])
    state = _json.loads(_json.dumps(led.to_state()))
    led2 = D.ShadowLedger(state)
    replays, warnings = _feed(led2, PT_OSC_SEQUENCE[2:], [LEDGER_RULE])
    assert warnings == []
    [(rule, acts)] = replays
    assert [a.kind for a in acts] == ["add_column", "modify_column"]
    assert all(a.table == "items" for a in acts)   # retargeted


def test_shadow_ledger_warns_on_unknown_swap():
    """A rename INTO a rule from a table with no derivable history
    (never seen, created without LIKE, or re-created mid-flight) must
    surface loudly -- nothing silent."""
    # never observed at all
    led = D.ShadowLedger()
    replays, warnings = _feed(
        led, ["RENAME TABLE backup_items TO items"], [LEDGER_RULE])
    assert replays == [] and len(warnings) == 1
    assert "items_sink" in warnings[0] and "drift" in warnings[0]
    # created LIKE a NON-ruled table
    led = D.ShadowLedger()
    replays, warnings = _feed(
        led, ["CREATE TABLE tmp LIKE other_table",
              "RENAME TABLE tmp TO items"], [LEDGER_RULE])
    assert replays == [] and len(warnings) == 1
    # DROPped and re-CREATEd from scratch mid-flight: history gone
    led = D.ShadowLedger()
    replays, warnings = _feed(
        led, ["CREATE TABLE tmp LIKE items",
              "DROP TABLE tmp",
              "CREATE TABLE tmp (id bigint NOT NULL, PRIMARY KEY(id))",
              "RENAME TABLE tmp TO items"], [LEDGER_RULE])
    assert replays == [] and len(warnings) == 1


def test_shadow_ledger_tracks_shadow_renames_and_gh_ost_two_step():
    """gh-ost's non-atomic cut-over uses two RENAME statements; a
    shadow renamed while off-rule keeps its history under the new
    name."""
    led = D.ShadowLedger()
    replays, warnings = _feed(led, [
        "CREATE TABLE _items_gho LIKE items",
        "ALTER TABLE _items_gho ADD COLUMN qty int",
        "RENAME TABLE _items_gho TO _items_ghc",   # off-rule rename
        "RENAME TABLE items TO _items_del",        # cut-over step 1
        "RENAME TABLE _items_ghc TO items",        # cut-over step 2
    ], [LEDGER_RULE])
    assert warnings == []
    [(rule, acts)] = replays
    assert [(a.kind, a.column) for a in acts] == [("add_column", "qty")]


# ------------------------------------------------- property hardening

from hypothesis import given, settings, strategies as st  # noqa: E402

_ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True)
_types = st.sampled_from([
    "int", "bigint", "bigint unsigned", "varchar(64)", "text",
    "decimal(10,2)", "enum('a,b','c''d','e\\'f')", "date",
    "datetime(6)", "set('x','y')", "double", "json",
])


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(_ident, _types, st.booleans(),
                          st.sampled_from([None, "FIRST", "AFTER"])),
                min_size=1, max_size=6),
       _ident, _ident)
def test_alter_add_round_trip_property(cols, schema, table):
    """Generated multi-clause ALTER ADDs parse back to exactly the
    generated (name, type, nullable) triples, survive apply_to_columns
    in order, and every emitted ClickHouse statement names the column;
    the parser never crashes on this grammar."""
    clauses = []
    for name, mtype, notnull, posk in cols:
        c = f"ADD COLUMN `{name}` {mtype}"
        if notnull:
            c += " NOT NULL"
        if posk == "FIRST":
            c += " FIRST"
        elif posk == "AFTER":
            c += " AFTER `id`"
        clauses.append(c)
    sql = f"ALTER TABLE `{schema}`.`{table}` " + ", ".join(clauses)
    acts = D.parse_mysql_ddl(sql)
    assert len(acts) == len(cols)
    model = [("id", "bigint", False)]
    for a, (name, mtype, notnull, posk) in zip(acts, cols):
        assert (a.kind, a.schema, a.table) == \
            ("add_column", schema, table)
        assert (a.column, a.mysql_type, a.nullable) == \
            (name, mtype, not notnull)
        assert a.first == (posk == "FIRST")
        assert a.after == ("id" if posk == "AFTER" else None)
        [stmt] = D.clickhouse_ddl(a, database="olap", table=table)
        assert f"`{name}`" in stmt
        model = D.apply_to_columns(model, a)
        assert (name, mtype, not notnull) in model
        names = [c[0] for c in model]
        if posk == "FIRST":
            assert names[0] == name
        elif posk == "AFTER":
            assert names[names.index("id") + 1] == name
        else:
            assert names[-1] == name


@settings(max_examples=150, deadline=None)
@given(st.text(min_size=0, max_size=120))
def test_parser_never_crashes_on_noise(s):
    """Arbitrary text: parse returns a list or raises ValueError --
    never any other exception, never hangs (the loud-stop contract
    run_apply_ddl wraps with coordinates)."""
    try:
        out = D.parse_mysql_ddl(s)
    except ValueError:
        return
    assert isinstance(out, list)


_osc_stmts = st.lists(st.sampled_from([
    "CREATE TABLE tmp1 LIKE items",
    "CREATE TABLE tmp2 LIKE other",
    "CREATE TABLE tmp1 (id bigint NOT NULL, PRIMARY KEY(id))",
    "ALTER TABLE tmp1 ADD COLUMN c1 int",
    "ALTER TABLE tmp1 CHANGE c1 c2 bigint NOT NULL",
    "ALTER TABLE tmp2 DROP COLUMN z",
    "RENAME TABLE tmp1 TO tmp2",
    "RENAME TABLE tmp2 TO tmp1",
    "RENAME TABLE items TO tmp_old, tmp1 TO items",
    "RENAME TABLE tmp2 TO items",
    "DROP TABLE tmp1",
    "TRUNCATE TABLE items",
]), min_size=0, max_size=12)


@settings(max_examples=150, deadline=None)
@given(_osc_stmts)
def test_shadow_ledger_state_round_trip_property(stmts):
    """Any interleaving of shadow-ish statements: observe never raises,
    and serializing the ledger state to JSON and back BETWEEN EVERY
    STATEMENT produces the same replays/warnings as the uninterrupted
    ledger -- the persistence the --apply-ddl watermark relies on
    cannot change behavior."""
    import json as _json
    rules = [LEDGER_RULE]
    direct = D.ShadowLedger()
    hopped = D.ShadowLedger()
    for stmt in stmts:
        for a in D.parse_mysql_ddl(stmt, default_schema="app"):
            r1, w1 = direct.observe(a, rules)
            r2, w2 = hopped.observe(a, rules)
            assert [(ru.key, acts) for ru, acts in r1] == \
                [(ru.key, acts) for ru, acts in r2]
            assert w1 == w2
            hopped = D.ShadowLedger(
                _json.loads(_json.dumps(hopped.to_state())))
    assert direct.to_state() == hopped.to_state()


def test_shadow_ledger_rename_within_rule_scope_is_quiet():
    """With a catch-all wildcard rule, the shadow table itself matches
    the rule, so its ALTERs applied live through the normal path --
    the cut-over rename must produce neither a replay nor a false
    history-unknown warning."""
    wild = Rule(source_schema="app", source_table=".*",
                sink_schema="olap", sink_table="all_sink", pk=("id",))
    led = D.ShadowLedger()
    replays, warnings = _feed(led, [
        "CREATE TABLE _items_new LIKE items",   # ruled -> not ledgered
        "ALTER TABLE _items_new ADD COLUMN c int",  # applied live
        "RENAME TABLE items TO _items_old, _items_new TO items",
    ], [wild])
    assert replays == [] and warnings == []


def test_comment_markers_inside_multiline_strings():
    """A string literal spanning lines keeps its quote state: '--' or
    '#' INSIDE it never truncates the statement (the per-line blanking
    this replaces lost the open quote at each line break)."""
    a = _one("ALTER TABLE s.t ADD c varchar(40) "
             "COMMENT 'line1\n-- not a comment' AFTER b")
    assert (a.kind, a.column, a.after) == ("add_column", "c", "b")
    a = _one("ALTER TABLE s.t ADD e enum('a\n#x','c') NOT NULL")
    assert a.mysql_type == "enum('a\n#x','c')"
    assert a.nullable is False
    # real comments still strip, including after a multi-line literal
    a = _one("ALTER TABLE s.t ADD c varchar(8) "
             "COMMENT 'x\ny' -- trailing\n, ADD INDEX i (c)"
             .split(",")[0])
    assert a.kind == "add_column"
    acts = D.parse_mysql_ddl(
        "ALTER TABLE s.t ADD a int, -- c1\nADD b int # c2\n, ADD d int")
    assert [x.column for x in acts
            if x.kind == "add_column"] == ["a", "b", "d"]
