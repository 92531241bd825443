"""mysqldump ingestion: the public dump grammar (CREATE blocks,
extended INSERT lines, backslash escapes, hex literals) parsed by
hand-written goldens plus writer/parser round trips on hostile
strings, then the distributed path end-to-end from a real .sql file.
The renderer is exercised AGAINST the parser, and both against
literal dump text written here by hand -- the binlog strategy."""

from __future__ import annotations

import datetime

import pytest

from mysql_syncer_clickhouse_spark.sources import mysqldump as D

CREATE = """
DROP TABLE IF EXISTS `items`;
CREATE TABLE `items` (
  `id` bigint NOT NULL,
  `qty` int unsigned DEFAULT NULL,
  `price` decimal(12,2) DEFAULT NULL,
  `title` varchar(80) DEFAULT NULL,
  `created` datetime(6) DEFAULT NULL,
  PRIMARY KEY (`id`)
) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4;
"""


def test_parse_create_table_golden():
    t = D.parse_create_table(CREATE)
    assert t.table == "items"
    assert t.columns == [
        ("id", "bigint", False),
        ("qty", "int unsigned", True),
        ("price", "decimal(12,2)", True),
        ("title", "varchar(80)", True),
        ("created", "datetime(6)", True)]
    assert t.pk == ("id",)
    assert "`id` bigint" in t.row_ddl()


def test_extract_create_tables_multiple():
    two = CREATE + CREATE.replace("`items`", "`other`")
    tabs = D.extract_create_tables(two)
    assert sorted(tabs) == ["items", "other"]


def test_tokenize_values_grammar():
    # hand-written dump text: commas and parens INSIDE strings, every
    # escape, '' doubling, NULL, hex, negative/scientific numbers
    raw = (r"(1,'a,b)c','it\'s \\ \n\t\Z\0ok',NULL,0x48690A,-3.5e2),"
           r"(2,'x''y',NULL,7,0x,1)")
    rows = D.tokenize_values(raw)
    assert rows == [
        ["1", "a,b)c", "it's \\ \n\t\x1a\x00ok", None,
         b"Hi\n", "-3.5e2"],
        ["2", "x'y", None, "7", b"", "1"]]
    with pytest.raises(ValueError, match="unterminated string"):
        D.tokenize_values("(1,'open)")
    with pytest.raises(ValueError, match="unterminated row"):
        D.tokenize_values("(1,2")
    with pytest.raises(ValueError, match="unexpected"):
        D.tokenize_values("junk(1)")


def test_parse_insert_statement_forms():
    t, rows = D.parse_insert_statement(
        "INSERT INTO `items` VALUES (1,'a'),(2,NULL);")
    assert t == "items" and rows == [["1", "a"], ["2", None]]
    # schema-qualified and column-listed (--complete-insert) forms
    t, rows = D.parse_insert_statement(
        "INSERT INTO `app`.`items` (`id`, `title`) VALUES (3,'b');")
    assert t == "items" and rows == [["3", "b"]]
    with pytest.raises(ValueError, match="not an INSERT"):
        D.parse_insert_statement("UPDATE items SET x = 1;")


def test_render_parse_roundtrip_hostile_strings():
    nasty = ["it's", "back\\slash", "new\nline", "tab\there",
             "quote''double", "nul\x00sub\x1a", "plain"]
    rows = [[i, s, None if i % 3 == 0 else float(i) / 4, b"\x01\xff"]
            for i, s in enumerate(nasty)]
    stmt = D.render_insert("t", rows)
    table, back = D.parse_insert_statement(stmt)
    assert table == "t"
    for (i, s, f, b), got in zip(rows, back):
        assert got[0] == str(i)
        assert got[1] == s                      # escapes survive exactly
        assert got[2] == (None if f is None else repr(f))
        assert got[3] == b


def test_statements_to_rows_typed(spark):
    t = D.parse_create_table(CREATE)
    stmts = spark.createDataFrame(
        [("INSERT INTO `items` VALUES "
          "(1,10,'12.50','first','2026-03-01 12:30:45.123456'),"
          "(2,NULL,NULL,'zero\\'s','0000-00-00 00:00:00');",),
         ("INSERT INTO `other` VALUES (99,0,'9.99','skip',NULL);",)],
        "stmt string")
    rows = {r["id"]: r for r in
            D.statements_to_rows(stmts, t).collect()}
    assert sorted(rows) == [1, 2]               # `other` filtered out
    r1 = rows[1]
    assert r1["qty"] == 10
    assert float(r1["price"]) == 12.50
    assert r1["created"] == datetime.datetime(2026, 3, 1, 12, 30, 45,
                                              123456)
    r2 = rows[2]
    assert r2["qty"] is None and r2["title"] == "zero's"
    assert r2["created"] is None                # zero-date guard
    # arity mismatch refuses loudly instead of mis-zipping columns
    bad = spark.createDataFrame(
        [("INSERT INTO `items` VALUES (1,2);",)], "stmt string")
    with pytest.raises(Exception, match="arity"):
        D.statements_to_rows(bad, t).collect()


def _write_dump(path, *, split_schema=False):
    data = (
        "-- MySQL dump 10.13\n"
        "INSERT INTO `items` VALUES "
        "(1,1,'1.00','one','2026-01-01 00:00:00'),"
        "(2,2,'2.50','two\\'s',NULL);\n"
        "INSERT INTO `items` VALUES (3,NULL,'3.75','three',NULL);\n"
        "INSERT INTO `decoy` VALUES (9,'x');\n")
    if split_schema:
        (path / "data.sql").write_text(data)
        return str(path / "data.sql"), CREATE
    (path / "dump.sql").write_text(CREATE + data)
    return str(path / "dump.sql"), None


def test_read_mysqldump_end_to_end(spark, tmp_path):
    for split in (False, True):
        d = tmp_path / f"d{split}"
        d.mkdir()
        p, schema = _write_dump(d, split_schema=split)
        df = D.read_mysqldump(spark, p, "items", schema_sql=schema)
        got = {r["id"]: (r["qty"], float(r["price"]), r["title"])
               for r in df.collect()}
        assert got == {1: (1, 1.00, "one"), 2: (2, 2.50, "two's"),
                       3: (None, 3.75, "three")}
    with pytest.raises(ValueError, match="not in dump schema"):
        D.read_mysqldump(spark, p, "missing", schema_sql=schema)


def test_read_mysqldump_zero_match_is_loud(spark, tmp_path):
    """r9 VERDICT What's-missing #3: a dump whose INSERTs for the
    table exist but span lines (non-mysqldump formatting) must RAISE,
    not silently return zero rows -- in both failure shapes: (a) no
    line matches the INSERT prefix at all; (b) the first line matches
    but carries no tuples (VALUES on following lines)."""
    # (a) INSERT wrapped so no line starts with the prefix
    multi = tmp_path / "multi"
    multi.mkdir()
    (multi / "dump.sql").write_text(
        CREATE + "INSERT\nINTO `items`\nVALUES (1,1,1.00,'one',NULL);\n")
    with pytest.raises(ValueError, match="ZERO lines matched"):
        D.read_mysqldump(spark, str(multi / "dump.sql"), "items")
    # strict=False keeps the old silent behavior for validated re-reads
    df = D.read_mysqldump(spark, str(multi / "dump.sql"), "items",
                          strict=False)
    assert df.count() == 0
    # (b) prefix matches, tuples on later lines -> tokenizer raises
    headless = tmp_path / "headless"
    headless.mkdir()
    (headless / "dump.sql").write_text(
        CREATE + "INSERT INTO `items` VALUES\n(1,1,1.00,'one',NULL);\n")
    from py4j.protocol import Py4JJavaError
    with pytest.raises(Exception, match="no row tuples|PythonException"):
        D.read_mysqldump(spark, str(headless / "dump.sql"),
                         "items").collect()
    # a genuinely empty table (CREATE present, zero INSERTs anywhere)
    # stays a valid empty read -- strict only fires on the mismatch
    empty = tmp_path / "empty"
    empty.mkdir()
    (empty / "dump.sql").write_text(CREATE)
    assert D.read_mysqldump(spark, str(empty / "dump.sql"),
                            "items").count() == 0
