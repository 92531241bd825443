"""MySQL DDL replication -> ClickHouse schema evolution.

The reference reacts to source DDL by refreshing its in-memory rule
(OnTableChanged -> updateRule, river/sync.go:54-60 +
river/river.go:166-180) and checkpointing past the statement (OnDDL,
river/sync.go:62-65) -- the ClickHouse table itself silently drifts:
a column added upstream never reaches the sink, a dropped column keeps
receiving NULLs forever, a rename splits the data across two columns.
This module closes that gap Spark-first:

  parse_mysql_ddl   binlog QUERY-event text -> typed DdlAction list
                    (ALTER ADD/DROP/MODIFY/CHANGE/RENAME COLUMN,
                    RENAME/TRUNCATE/DROP TABLE, CREATE TABLE;
                    index/constraint/engine noise -> 'ignored')
  map_action        re-express a source-space action in SINK space
                    through a plans.rules.Rule (column filter drops
                    it, field renames + ',list'/',date' transforms
                    re-type it) -- the updateRule analog done right
  clickhouse_ddl    action -> the ClickHouse ALTER/RENAME/TRUNCATE
                    statement list, typed through the ONE type
                    authority (functions/typemap); a MySQL CHANGE
                    becomes RENAME COLUMN + MODIFY COLUMN
  apply_to_columns  refresh the (name, mysql_type, nullable) column
                    model the sinks key their DDL and native block
                    encoders on
  apply_ddl_to_sink drive a ClickHouse sink (HTTP or native -- both
                    expose execute()) through an ordered action list,
                    mutating its column model in lock-step

Scale stance: DDL events are RARE and inherently serial (they order
against the row stream), so parsing and application are driver-side
by design; the DATA path stays distributed. The per-file binlog scan
that finds them (sources/binlog.read_binlog_ddl) is the same bounded
mapInPandas shape as the envelope decode.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, replace

from ..functions.typemap import (clickhouse_create_table_ddl,
                                 mysql_to_clickhouse_type)

__all__ = [
    "DdlAction", "parse_mysql_ddl", "map_action", "clickhouse_ddl",
    "apply_to_columns", "apply_ddl_to_sink", "ShadowLedger",
]


@dataclass(frozen=True)
class DdlAction:
    """One schema-changing step, source-space unless produced by
    map_action. `kind` is one of: add_column, drop_column,
    modify_column, change_column, rename_column, rename_table,
    truncate, drop_table, create_table, create_table_like, ignored."""
    kind: str
    schema: str | None
    table: str
    column: str | None = None
    new_name: str | None = None          # change/rename targets
    new_schema: str | None = None        # RENAME TABLE a.t TO b.t2
    mysql_type: str | None = None
    nullable: bool = True
    first: bool = False                  # ADD/MODIFY ... FIRST
    after: str | None = None             # ADD/MODIFY ... AFTER col
    columns: tuple = ()                  # create_table triples
    pk: tuple = ()                       # create_table PRIMARY KEY
    like_schema: str | None = None       # CREATE TABLE ... LIKE src
    like_table: str | None = None
    clause: str = ""                     # raw clause (diagnostics)


# ----------------------------------------------------------- lexing

_IDENT = r"(?:`[^`]+`|[A-Za-z_$][\w$]*)"
_TABLE = rf"(?:({_IDENT})\s*\.\s*)?({_IDENT})"


def _unq(s: str | None) -> str | None:
    if s is None:
        return None
    s = s.strip()
    if s.startswith("`") and s.endswith("`"):
        return s[1:-1]
    return s


def _split_top(s: str) -> list[str]:
    """Split on TOP-LEVEL commas, respecting parens AND quoted
    strings -- enum('a,b','c(d') must not split. Single quotes may
    escape via backslash or doubling (MySQL default modes)."""
    parts: list[str] = []
    cur: list[str] = []
    depth = 0
    q: str | None = None
    i = 0
    while i < len(s):
        ch = s[i]
        if q is not None:
            cur.append(ch)
            if ch == "\\" and q == "'" and i + 1 < len(s):
                cur.append(s[i + 1])
                i += 1
            elif ch == q:
                if i + 1 < len(s) and s[i + 1] == q:   # '' / `` escape
                    cur.append(s[i + 1])
                    i += 1
                else:
                    q = None
        elif ch in "'\"`":
            q = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def _strip_strings(s: str) -> str:
    """Blank out quoted string literals (and backtick-identifier
    CONTENTS) so keyword searches (NOT NULL, FIRST, AFTER, comment
    markers) can't match inside a DEFAULT/COMMENT text or a weird
    identifier. LENGTH-PRESERVING: every consumed input char emits
    exactly one output char, so span indices computed on the blanked
    text map 1:1 onto the original -- callers (_parse_coldef's AFTER
    extraction, _strip_comments' cut index) slice the ORIGINAL by
    blanked-match spans, and an escaped quote ('' or \\') must not
    shift them. Backtick delimiters themselves are kept so identifier
    boundaries stay visible to the `...` regex alternative."""
    out: list[str] = []
    q: str | None = None
    i = 0
    while i < len(s):
        ch = s[i]
        if q is not None:
            if ch == "\\" and q == "'" and i + 1 < len(s):
                out.append("  ")           # 2 consumed -> 2 blanks
                i += 2
                continue
            if ch == q:
                if i + 1 < len(s) and s[i + 1] == q:
                    out.append("  ")       # doubled-quote escape
                    i += 2
                    continue
                q = None
                out.append(ch if ch == "`" else " ")
            else:
                out.append(" ")
        elif ch in "'\"`":
            q = ch
            out.append(ch if ch == "`" else " ")
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def _strip_comments(sql: str) -> str:
    """Drop -- and # line comments and /* */ blocks; KEEP the content
    of /*!NNNNN versioned */ comments (mysqldump wraps real DDL in
    them). Comment markers are located on the GLOBALLY blanked text
    (one _strip_strings pass over the whole statement), not per line:
    a string literal spanning lines (COMMENT 'a\\n-- b') keeps its
    quote state, so markers inside it never truncate the statement --
    and since blanking turns in-string newlines into spaces, every
    '\\n' still visible in the blanked text is a REAL line break a
    comment runs to."""
    sql = re.sub(r"/\*!\d*\s?(.*?)\*/", r"\1", sql, flags=re.S)
    sql = re.sub(r"/\*.*?\*/", " ", sql, flags=re.S)
    blanked = _strip_strings(sql)
    pat = re.compile(r"--(\s|$)|#")
    out: list[str] = []
    i = 0
    while i < len(sql):
        m = pat.search(blanked, i)
        if not m:
            out.append(sql[i:])
            break
        out.append(sql[i:m.start()])
        nl = blanked.find("\n", m.start())
        if nl < 0:
            break
        i = nl                 # the line break itself survives
    return "".join(out).strip().rstrip(";").strip()


def _parse_type(s: str) -> tuple[str, str]:
    """Consume a column type from the head of `s` -> (mysql_type,
    rest). Handles parenthesized args with quoted commas
    (enum('a,b')) and the unsigned/zerofill suffixes."""
    m = re.match(r"[A-Za-z]\w*", s)
    if not m:
        raise ValueError(f"expected a column type at {s[:40]!r}")
    i = m.end()
    t = m.group(0)
    rest = s[i:]
    if re.match(r"\s*\(", rest):
        j = rest.index("(")
        depth = 0
        q: str | None = None
        k = j
        while k < len(rest):
            ch = rest[k]
            if q is not None:
                if ch == "\\" and q == "'":
                    k += 1
                elif ch == q:
                    q = None
            elif ch in "'\"":
                q = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        if depth != 0:
            raise ValueError(f"unbalanced parens in type: {s[:60]!r}")
        t += rest[j:k + 1]
        rest = rest[k + 1:]
    for suffix in ("unsigned", "zerofill"):
        m2 = re.match(rf"\s+{suffix}\b", rest, re.I)
        if m2:
            if suffix == "unsigned":
                t += " unsigned"
            rest = rest[m2.end():]
    return t.lower(), rest


def _parse_coldef(s: str) -> tuple[str, str, bool, bool, str | None]:
    """'`c` bigint unsigned NOT NULL DEFAULT 0 AFTER `x`' ->
    (name, mysql_type, nullable, first, after)."""
    m = re.match(rf"\s*({_IDENT})\s+", s)
    if not m:
        raise ValueError(f"expected a column name at {s[:40]!r}")
    name = _unq(m.group(1))
    mtype, rest = _parse_type(s[m.end():])
    blanked = _strip_strings(rest)
    nullable = not re.search(r"\bNOT\s+NULL\b", blanked, re.I)
    first = bool(re.search(r"\bFIRST\s*$", blanked, re.I))
    after = None
    ma = re.search(rf"\bAFTER\s+({_IDENT})\s*$", blanked, re.I)
    if ma:
        after = _unq(rest[ma.start(1):ma.end(1)])
    return name, mtype, nullable, first, after


# ---------------------------------------------------------- parsing

def _is_virtual_generated(coldef: str) -> bool:
    """VIRTUAL generated columns never appear in binlog row images
    (only STORED ones do), so replicating their ADD would create a
    sink column that receives NULL forever -- ignore them. MySQL's
    default when neither keyword is given is VIRTUAL."""
    blanked = _strip_strings(coldef)
    if not re.search(r"\bGENERATED\s+ALWAYS\s+AS\b|\bAS\s*\(",
                     blanked, re.I):
        return False
    return not re.search(r"\bSTORED\b", blanked, re.I)


_IGNORED_ADD = ("index", "key", "unique", "fulltext", "spatial",
                "constraint", "primary", "foreign", "partition", "check")
_IGNORED_DROP = ("index", "key", "primary", "foreign", "constraint",
                 "partition", "check")


def _alter_clause(schema: str | None, table: str, clause: str) \
        -> list[DdlAction]:
    c = clause.strip()
    low = c.lower()
    ign = DdlAction("ignored", schema, table, clause=c)

    if low.startswith("add"):
        body = c[3:].strip()
        head = body.split(None, 1)[0].lower() if body else ""
        if head in _IGNORED_ADD:
            return [ign]
        if head == "column":
            body = body[6:].strip()
        body = re.sub(r"^if\s+not\s+exists\s+", "", body, flags=re.I)
        if body.startswith("("):           # ADD COLUMN (a int, b text)
            inner = body[1:body.rindex(")")]
            out = []
            for part in _split_top(inner):
                if _is_virtual_generated(part):
                    out.append(DdlAction("ignored", schema, table,
                                         clause=part))
                    continue
                n, t, nul, fi, af = _parse_coldef(part)
                out.append(DdlAction("add_column", schema, table,
                                     column=n, mysql_type=t, nullable=nul,
                                     first=fi, after=af, clause=part))
            return out
        if _is_virtual_generated(body):
            return [ign]
        n, t, nul, fi, af = _parse_coldef(body)
        return [DdlAction("add_column", schema, table, column=n,
                          mysql_type=t, nullable=nul, first=fi,
                          after=af, clause=c)]

    if low.startswith("drop"):
        body = c[4:].strip()
        head = body.split(None, 1)[0].lower() if body else ""
        if head in _IGNORED_DROP:
            return [ign]
        if head == "column":
            body = body[6:].strip()
        body = re.sub(r"^if\s+exists\s+", "", body, flags=re.I)
        m = re.match(rf"({_IDENT})\s*$", body)
        if not m:
            return [ign]
        return [DdlAction("drop_column", schema, table,
                          column=_unq(m.group(1)), clause=c)]

    if low.startswith("modify"):
        body = c[6:].strip()
        if body.lower().startswith("column"):
            body = body[6:].strip()
        n, t, nul, fi, af = _parse_coldef(body)
        return [DdlAction("modify_column", schema, table, column=n,
                          mysql_type=t, nullable=nul, first=fi,
                          after=af, clause=c)]

    if low.startswith("change"):
        body = c[6:].strip()
        if body.lower().startswith("column"):
            body = body[6:].strip()
        m = re.match(rf"\s*({_IDENT})\s+", body)
        if not m:
            return [ign]
        old = _unq(m.group(1))
        n, t, nul, fi, af = _parse_coldef(body[m.end():])
        return [DdlAction("change_column", schema, table, column=old,
                          new_name=n, mysql_type=t, nullable=nul,
                          first=fi, after=af, clause=c)]

    m = re.match(rf"rename\s+column\s+({_IDENT})\s+to\s+({_IDENT})\s*$",
                 c, re.I)
    if m:
        return [DdlAction("rename_column", schema, table,
                          column=_unq(m.group(1)),
                          new_name=_unq(m.group(2)), clause=c)]

    m = re.match(rf"rename\s+(?:to\s+|as\s+)?{_TABLE}\s*$", c, re.I)
    if m:
        return [DdlAction("rename_table", schema, table,
                          new_name=_unq(m.group(2)),
                          new_schema=_unq(m.group(1)) or schema,
                          clause=c)]

    # ALTER COLUMN ... SET/DROP DEFAULT, ENGINE=, AUTO_INCREMENT=,
    # CONVERT TO, charset/collation, ALGORITHM/LOCK, ORDER BY,
    # COMMENT=, ROW_FORMAT=... -- none change the synced shape
    return [ign]


def parse_mysql_ddl(sql: str, default_schema: str | None = None) \
        -> list[DdlAction]:
    """One statement (a binlog QUERY event's text) -> ordered action
    list. Non-DDL (BEGIN, DML, SET, GRANT, CREATE INDEX/VIEW/DATABASE,
    ANALYZE, XA ...) -> []. Clauses that don't change the synced
    column shape -> kind='ignored' entries (kept so callers can log
    what was skipped, mirroring the reference's silent OnDDL)."""
    s = _strip_comments(sql)
    if not s:
        return []
    low = s.lower()

    m = re.match(rf"alter\s+(?:online\s+|offline\s+)?(?:ignore\s+)?"
                 rf"table\s+{_TABLE}\s+(.*)$", s, re.I | re.S)
    if m:
        schema = _unq(m.group(1)) or default_schema
        table = _unq(m.group(2))
        out: list[DdlAction] = []
        for clause in _split_top(m.group(3)):
            out.extend(_alter_clause(schema, table, clause))
        return out

    if re.match(r"rename\s+table\s", low):
        out = []
        for part in _split_top(s[len("rename table"):]):
            m = re.match(rf"{_TABLE}\s+to\s+{_TABLE}\s*$", part, re.I)
            if not m:
                raise ValueError(f"unparseable RENAME TABLE arm: "
                                 f"{part!r}")
            out.append(DdlAction(
                "rename_table", _unq(m.group(1)) or default_schema,
                _unq(m.group(2)), new_name=_unq(m.group(4)),
                new_schema=_unq(m.group(3)) or default_schema,
                clause=part))
        return out

    m = re.match(rf"truncate\s+(?:table\s+)?{_TABLE}\s*$", s, re.I)
    if m:
        return [DdlAction("truncate", _unq(m.group(1)) or default_schema,
                          _unq(m.group(2)), clause=s)]

    m = re.match(rf"drop\s+table\s+(?:if\s+exists\s+)?(.+)$", s, re.I)
    if m and not low.startswith("drop temporary"):
        body = re.sub(r"\s+(?:restrict|cascade)\s*$", "", m.group(1),
                      flags=re.I)
        out = []
        for part in _split_top(body):
            tm = re.match(rf"{_TABLE}\s*$", part)
            if not tm:
                raise ValueError(
                    f"unparseable DROP TABLE arm: {part!r}")
            out.append(DdlAction(
                "drop_table", _unq(tm.group(1)) or default_schema,
                _unq(tm.group(2)), clause=part))
        return out

    m = re.match(rf"create\s+table\s+(?:if\s+not\s+exists\s+)?"
                 rf"{_TABLE}\s*(.*)$", s, re.I | re.S)
    if m:
        schema = _unq(m.group(1)) or default_schema
        table = _unq(m.group(2))
        body = m.group(3).strip()

        # CREATE TABLE new LIKE orig -- how gh-ost/pt-osc open every
        # online-schema-change migration. Typed so ShadowLedger can
        # track the shadow and replay its ALTERs at the RENAME swap.
        lm = re.match(rf"like\s+{_TABLE}\s*$", body, re.I)
        if lm:
            return [DdlAction("create_table_like", schema, table,
                              like_schema=_unq(lm.group(1))
                              or default_schema,
                              like_table=_unq(lm.group(2)), clause=s)]

        # CREATE TABLE ... [AS] SELECT: the column set comes from the
        # SELECT, which this parser cannot type -- surface as an
        # 'ignored' action (visible in --apply-ddl logs), never a
        # silent []. Detect on blanked text so a DEFAULT 'select'
        # string can't trip it.
        blanked_body = _strip_strings(body)
        if re.match(r"(?:as\s+)?select\b|\(\s*select\b", blanked_body,
                    re.I):
            return [DdlAction("ignored", schema, table, clause=s)]

        if not body.startswith("("):
            return [DdlAction("ignored", schema, table, clause=s)]
        # find the MATCHING close paren of the column list by
        # depth/quote-aware scan -- a greedy regex to the last ')'
        # swallows table options containing parens (COMMENT 'x (y)',
        # PARTITION BY ...) into the column list
        depth = 0
        end = -1
        for i, ch in enumerate(blanked_body):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        if end < 0:
            raise ValueError(
                f"unbalanced parens in CREATE TABLE: {s[:80]!r}")
        inner = body[1:end]
        tail = blanked_body[end + 1:]
        if re.search(r"\bselect\b", tail, re.I):
            # CREATE TABLE t (cols...) SELECT ...: the SELECT may add
            # columns beyond the explicit list -- same opaque class
            return [DdlAction("ignored", schema, table, clause=s)]
        cols: list[tuple[str, str, bool]] = []
        pk: tuple[str, ...] = ()
        for part in _split_top(inner):
            pm = re.match(r"primary\s+key\s*\(([^)]*)\)", part, re.I)
            if pm:
                pk = tuple(_unq(x.strip())
                           for x in pm.group(1).split(","))
                continue
            head = part.split(None, 1)[0].lower()
            if head in ("key", "index", "unique", "fulltext", "spatial",
                        "constraint", "foreign", "check"):
                continue
            if _is_virtual_generated(part):
                continue
            n, t, nul, _, _ = _parse_coldef(part)
            cols.append((n, t, nul))
        if not cols:
            return [DdlAction("ignored", schema, table, clause=s)]
        return [DdlAction("create_table", schema, table,
                          columns=tuple(cols), pk=pk, clause=s)]

    return []


# ------------------------------------------------- rule re-expression

_TRANSFORM_TYPE = {"list": "list", "date": "datetime"}


def _rule_matches(rule, schema: str | None, table: str) -> bool:
    """Exact rule key first, then wildcard source_table fullmatch --
    RuleSet.match's order (plans/rules.py)."""
    if f"{schema}:{table}".lower() == rule.key:
        return True
    return (rule.source_schema.lower() == (schema or "").lower()
            and re.fullmatch(rule.source_table, table,
                             re.IGNORECASE) is not None)


def map_action(action: DdlAction, rule) -> DdlAction | None:
    """Re-express a source-space action in SINK space through a
    plans.rules.Rule: actions for other tables -> None; columns the
    rule's filter excludes -> None; field renames apply; a
    ',list'/',date' transform suffix re-types the sink column (the
    rule projects a transformed value, so the sink stores the
    TRANSFORMED type). This is the reference's updateRule re-read
    (river/river.go:166-180) made explicit and typed."""
    if rule is None:
        return action
    if not _rule_matches(rule, action.schema, action.table):
        return None

    def synced(col: str) -> bool:
        return rule.column_filter is None or col in rule.column_filter

    def sink_name_type(col: str, mtype: str | None) \
            -> tuple[str, str | None]:
        name, transform = rule._field_parts(col)
        if transform is not None:
            mtype = _TRANSFORM_TYPE.get(transform, mtype)
        return name, mtype

    a = replace(action, schema=rule.sink_schema, table=rule.sink_table)
    if action.kind in ("add_column", "modify_column", "drop_column"):
        if not synced(action.column):
            return None
        name, mtype = sink_name_type(action.column, action.mysql_type)
        after = None
        if action.after is not None and synced(action.after):
            after, _ = sink_name_type(action.after, None)
        return replace(a, column=name, mysql_type=mtype, after=after)
    if action.kind in ("change_column", "rename_column"):
        if not synced(action.column):
            return None
        old, _ = sink_name_type(action.column, None)
        new, mtype = sink_name_type(action.new_name, action.mysql_type)
        after = None
        if action.after is not None and synced(action.after):
            after, _ = sink_name_type(action.after, None)
        return replace(a, column=old, new_name=new, mysql_type=mtype,
                       after=after)
    if action.kind == "rename_table":
        # the sink table is rule-addressed: the source renaming out
        # from under the rule does not move the sink table. The
        # rename-INTO-rule half of an OSC swap is ShadowLedger's job
        # (it needs cross-statement state this per-action map lacks).
        return None
    if action.kind == "create_table_like":
        # rule-addressed sink: another wildcard match created LIKE a
        # sibling adds no sink work (the one sink table exists), and
        # the LIKE source's columns are unknowable here -- visible,
        # not actionable
        return replace(a, kind="ignored")
    if action.kind == "create_table":
        cols = []
        for n, t, nul in action.columns:
            if not synced(n):
                continue
            name, mtype = sink_name_type(n, t)
            cols.append((name, mtype, nul))
        pk = tuple(sink_name_type(c, None)[0] for c in action.pk
                   if synced(c))
        return replace(a, columns=tuple(cols), pk=pk)
    return a   # truncate / drop_table / ignored carry over


# -------------------------------------------------- ClickHouse side

def clickhouse_ddl(action: DdlAction, *, database: str, table: str,
                   pk: tuple[str, ...] = ()) -> list[str]:
    """Sink-space action -> ordered ClickHouse statements. MySQL's
    atomic CHANGE (rename + retype) becomes RENAME COLUMN then MODIFY
    COLUMN -- ClickHouse has no single-statement form. Types go
    through the one authority (functions/typemap); PK columns stay
    non-Nullable (ClickHouse rejects Nullable ORDER BY keys)."""
    q = f"`{database}`.`{table}`"

    def ch_type(a: DdlAction, col: str) -> str:
        return mysql_to_clickhouse_type(
            a.mysql_type or "text", a.nullable and col not in pk)

    def pos(a: DdlAction) -> str:
        if a.first:
            return " FIRST"
        if a.after:
            return f" AFTER `{a.after}`"
        return ""

    k = action.kind
    if k == "add_column":
        return [f"ALTER TABLE {q} ADD COLUMN IF NOT EXISTS "
                f"`{action.column}` {ch_type(action, action.column)}"
                f"{pos(action)}"]
    if k == "drop_column":
        return [f"ALTER TABLE {q} DROP COLUMN IF EXISTS "
                f"`{action.column}`"]
    if k == "modify_column":
        return [f"ALTER TABLE {q} MODIFY COLUMN `{action.column}` "
                f"{ch_type(action, action.column)}{pos(action)}"]
    if k == "change_column":
        out = []
        if action.new_name != action.column:
            out.append(f"ALTER TABLE {q} RENAME COLUMN "
                       f"`{action.column}` TO `{action.new_name}`")
        out.append(f"ALTER TABLE {q} MODIFY COLUMN "
                   f"`{action.new_name}` "
                   f"{ch_type(action, action.new_name)}{pos(action)}")
        return out
    if k == "rename_column":
        return [f"ALTER TABLE {q} RENAME COLUMN `{action.column}` "
                f"TO `{action.new_name}`"]
    if k == "rename_table":
        return [f"RENAME TABLE {q} TO `{database}`.`{action.new_name}`"]
    if k == "truncate":
        return [f"TRUNCATE TABLE {q}"]
    if k == "drop_table":
        return [f"DROP TABLE IF EXISTS {q}"]
    if k == "create_table":
        return [clickhouse_create_table_ddl(
            database, table, list(action.columns),
            tuple(action.pk) or pk)]
    return []


def apply_to_columns(cols: list[tuple[str, str, bool]],
                     action: DdlAction) -> list[tuple[str, str, bool]]:
    """Refresh the (name, mysql_type, nullable) column model the
    sinks' auto-DDL and native block encoders key on."""
    out = [tuple(c) for c in cols]
    k = action.kind
    if k == "add_column":
        out = [c for c in out if c[0] != action.column]
        entry = (action.column, action.mysql_type or "text",
                 action.nullable)
        if action.first:
            return [entry] + out
        if action.after is not None:
            for i, c in enumerate(out):
                if c[0] == action.after:
                    return out[:i + 1] + [entry] + out[i + 1:]
        return out + [entry]
    if k == "drop_column":
        return [c for c in out if c[0] != action.column]
    if k == "modify_column":
        return [(action.column, action.mysql_type or c[1],
                 action.nullable) if c[0] == action.column else c
                for c in out]
    if k == "change_column":
        return [(action.new_name, action.mysql_type or c[1],
                 action.nullable) if c[0] == action.column else c
                for c in out]
    if k == "rename_column":
        return [(action.new_name, c[1], c[2])
                if c[0] == action.column else c for c in out]
    if k == "create_table":
        return [tuple(c) for c in action.columns]
    if k == "truncate":
        return out
    return out


def apply_ddl_to_sink(sink, actions, rule=None) -> list[str]:
    """Drive a ClickHouse sink (HTTP or native -- both expose
    execute() and carry columns/_known_cols) through an ORDERED action
    list: translate each action to sink space (through `rule` if
    given), execute the ClickHouse statements, and mutate the sink's
    column model in lock-step so subsequent batches encode with the
    evolved schema. Returns the executed statements."""
    executed: list[str] = []
    for action in actions:
        mapped = map_action(action, rule) if rule is not None else action
        if mapped is None or mapped.kind == "ignored":
            continue
        for stmt in clickhouse_ddl(mapped, database=sink.database,
                                   table=sink.table, pk=tuple(sink.pk)):
            sink.execute(stmt)
            executed.append(stmt)
        sink.columns = apply_to_columns(list(sink.columns), mapped)
        if sink._known_cols is not None:
            sink._known_cols = {c[0] for c in sink.columns}
    return executed


# --------------------------------------- online-schema-change swaps

class ShadowLedger:
    """Online-schema-change (gh-ost / pt-osc) shadow-table tracker.

    Both tools run EVERY production ALTER as a shadow-table migration:

        CREATE TABLE `_t_new` LIKE `t`        -- pt-osc (gh-ost: _t_gho)
        ALTER TABLE `_t_new` ADD COLUMN ...   -- the actual migration
        ... row copy ...
        RENAME TABLE `t` TO `_t_old`, `_t_new` TO `t`   -- atomic swap

    To a per-statement DDL replicator the migration is INVISIBLE: the
    shadow table matches no rule (its CREATE and ALTERs drop), and the
    swap's arms both map to nothing (`t` renames out of the rule;
    `_t_new` matches no rule) -- the sink silently drifts, the exact
    failure mode DDL replication exists to close (the reference is
    equally blind: OnDDL only checkpoints, river/sync.go:54-65).

    The ledger records CREATE ... LIKE statements whose LIKE target
    matches a rule (bounding state to in-flight migrations),
    accumulates the shadow's subsequent column actions, and when a
    RENAME swaps the shadow INTO a rule's source name, replays those
    actions onto the sink re-addressed to the rule's table -- the
    shadow's delta vs the original is BY CONSTRUCTION exactly its
    accumulated ALTERs. A swap whose incoming table was never seen,
    or was not created LIKE a table of the same rule, cannot be
    replayed and surfaces a loud warning instead: nothing silent.

    State round-trips through to_state()/ShadowLedger(state) so the
    --apply-ddl watermark carries it across invocations and --follow
    poll cycles (a real OSC migration spans hours)."""

    _COLUMN_KINDS = ("add_column", "drop_column", "modify_column",
                     "change_column", "rename_column")

    def __init__(self, state: dict | None = None) -> None:
        self._shadow: dict[str, dict] = {}
        for key, ent in (state or {}).items():
            self._shadow[key] = {
                "like": tuple(ent["like"]) if ent.get("like") else None,
                "actions": [DdlAction(**{
                    **a, "columns": tuple(map(tuple, a.get("columns", ()))),
                    "pk": tuple(a.get("pk", ()))}) for a in ent["actions"]],
            }

    def to_state(self) -> dict:
        from dataclasses import asdict
        return {k: {"like": list(e["like"]) if e["like"] else None,
                    "actions": [asdict(a) for a in e["actions"]]}
                for k, e in self._shadow.items()}

    @staticmethod
    def _key(schema: str | None, table: str) -> str:
        return f"{(schema or '').lower()}:{table.lower()}"

    def observe(self, action: DdlAction, rules) \
            -> tuple[list, list[str]]:
        """Feed one SOURCE-space action (in statement order). Returns
        (replays, warnings): replays = [(rule, [retargeted actions])]
        for the caller to apply_ddl_to_sink; warnings = strings the
        caller must surface loudly."""
        replays: list = []
        warnings: list[str] = []
        key = self._key(action.schema, action.table)
        k = action.kind

        if k == "create_table_like":
            if any(_rule_matches(r, action.schema, action.table)
                   for r in rules):
                return replays, warnings    # map_action's territory
            if any(_rule_matches(r, action.like_schema,
                                 action.like_table) for r in rules):
                self._shadow[key] = {
                    "like": (action.like_schema, action.like_table),
                    "actions": []}
            return replays, warnings

        if key in self._shadow:
            if k in self._COLUMN_KINDS:
                self._shadow[key]["actions"].append(action)
            elif k in ("drop_table", "create_table"):
                # re-created from scratch: history no longer derivable
                del self._shadow[key]

        if k != "rename_table":
            return replays, warnings

        ent = self._shadow.pop(key, None)
        new_schema = action.new_schema or action.schema
        new_name = action.new_name
        target_rule = next(
            (r for r in rules if _rule_matches(r, new_schema, new_name)),
            None)
        if target_rule is None:
            if ent is not None:     # shadow renamed, still off-rule
                self._shadow[self._key(new_schema, new_name)] = ent
            return replays, warnings

        # a table is being renamed INTO a rule's source name: the
        # cut-over half of an OSC swap (or a manual table swap)
        if ent is not None and ent["like"] is not None and \
                _rule_matches(target_rule, *ent["like"]):
            acts = [replace(a, schema=new_schema, table=new_name)
                    for a in ent["actions"]]
            if acts:
                replays.append((target_rule, acts))
            return replays, warnings
        if any(_rule_matches(r, action.schema, action.table)
               for r in rules):
            # rename WITHIN rule scope (e.g. a catch-all wildcard
            # matched the shadow too): its DDL already applied live
            # through the normal per-statement path -- no history gap
            return replays, warnings
        warnings.append(
            f"RENAME TABLE moved `{action.schema}`.`{action.table}` "
            f"into rule {target_rule.key!r} as "
            f"`{new_schema}`.`{new_name}`, but its schema history is "
            f"unknown ({'created without LIKE a ruled table' if ent else 'its CREATE was never observed'}): "
            f"the sink table `{target_rule.sink_schema}`."
            f"`{target_rule.sink_table}` may now drift -- diff the "
            f"schemas and ALTER the sink manually (or re-bootstrap "
            f"the rule)")
        return replays, warnings
