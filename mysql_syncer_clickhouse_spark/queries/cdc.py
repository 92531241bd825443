"""Oracle-checked queries for the CDC/replication layer (SURVEY.md
§2.1-2.4): upsert-by-dedup, tombstones, partial-update merge, snapshot
+ changelog application, routing/projection/rename, fan-in, and the
stat counters. Each runs the REAL operator code (operators/upsert.py,
plans/rules.py) over the deterministic events-derived changelog, with
an ANSI-SQL twin for DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.upsert import (apply_snapshot_and_changelog, fan_in,
                                fill_partial_updates, latest_state)
from ..plans.rules import Rule
from ..sources.changelog import CHANGELOG_SQL, derive_changelog_from_events
from ..sources.tables import load_table

_CL = f"WITH changelog AS ({CHANGELOG_SQL})"


# --- P6: upsert-by-dedup (ReplacingMergeTree analog) --------------------

def _binlog_roundtrip_final_state(cl: DataFrame) -> DataFrame:
    """Drive a deterministic changelog slice through REAL binlog v4
    BYTES and back: encode each 512-seq range of events into one
    binlog file (sources/binlog_writer -- framing, CRC32, TABLE_MAP
    TLVs, row images, DATETIME2(6)/DOUBLE/VARCHAR codecs), decode with
    the from-scratch decoder (sources/binlog.py), project through
    binlog_to_changelog, and final-state it. The oracle computes the
    same slice's final state straight from SQL, so any encode/decode
    asymmetry in the format layer breaks the driver's value hash --
    this is the CORRECTNESS row for SURVEY §2.1 S2c (the reference
    consumes the same events via canal, river/sync.go:72-102).

    Scale shape: one binlog file per contiguous seq range = one task on
    each side (the file axis is the parallelism, exactly
    read_binlog_files' contract); binlog_seq(file, pos, row) is
    monotone in the original seq by construction (ranges ascend, and
    events are appended in seq order within a file), so latest_state
    picks the same winners the oracle does."""
    import pandas as pd

    from ..sources.binlog import binlog_to_changelog, decode_binary_column
    from ..sources.binlog_writer import BinlogColumn, BinlogFileWriter

    cols = [BinlogColumn.bigint("oseq"),
            BinlogColumn.datetime2("ots", 6),
            BinlogColumn.bigint("opk"),
            BinlogColumn.double("value"),
            BinlogColumn.varchar("props", 8192)]

    def enc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        no = int(pdf["file_no"].iloc[0])
        w = BinlogFileWriter("app", "events_cdc", cols, table_id=11)
        for r in pdf.itertuples(index=False):
            ts = (r.ts.to_pydatetime()
                  if hasattr(r.ts, "to_pydatetime") else r.ts)
            img = [int(r.seq), ts, int(r.pk),
                   None if pd.isna(r.value) else float(r.value),
                   None if r.props is None else str(r.props)]
            if r.op == "insert":
                w.insert([img])
            elif r.op == "update":
                w.update([(img, img)])
            else:
                w.delete([img])
        return pd.DataFrame({"file": [f"mysql-bin.{no:06d}"],
                             "content": [w.to_bytes()]})

    # 512-seq ranges (round 15, guide §2.5/§4): the file axis IS the
    # parallelism axis on both sides of the round-trip (the docstring's
    # contract), and the old 4096-range split of the seq<8192 probe
    # produced exactly TWO files -- the whole per-event Python encode
    # and decode ran on two cores. Sixteen 512-event files spread the
    # identical per-event work across the session's cores; final-state
    # winners are unaffected (ranges still ascend, events stay
    # seq-ordered within a file, binlog_seq stays monotone).
    # explicit file_no-keyed repartition: the encode exchange is
    # byte-tiny, so AQE would coalesce it to one partition and
    # serialize the Python encode anyway (the same byte-blind-AQE trap
    # operators/funnel._pin_user_parallelism documents); groupBy
    # reuses the pinned partitioning, no second exchange
    n_par = cl.sparkSession.sparkContext.defaultParallelism
    files = (cl.withColumn("file_no",
                           F.floor(F.col("seq") / F.lit(512))
                            .cast("long"))
               .repartition(n_par, "file_no")
               .groupBy("file_no")
               .applyInPandas(enc, "file string, content binary"))
    env = decode_binary_column(files)
    bcl = binlog_to_changelog(
        env, "oseq long, ots timestamp, opk long, value double, "
             "props string", db="app", table="events_cdc")
    final = latest_state(bcl, ["opk"])
    return final.select(F.col("oseq").alias("seq"),
                        F.col("ots").alias("ts"),
                        F.col("opk").alias("pk"), "value", "props")


def cdc_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two labelled parts over one derived changelog: 'events' is the
    plain upsert-by-dedup final state (the throughput path bench.py's
    rows/sec tracks); 'binlog' drives the FIRST 8192 events through
    real binlog v4 bytes and must land on the oracle's identical final
    state. The probe is seq-bounded, not proportional: it checks
    FORMAT fidelity, so its cost must stay constant as the fixture
    grows (decode throughput scales on the file axis by design --
    read_binlog_files' contract -- and is not what this part
    measures)."""
    cl = derive_changelog_from_events(spark, sf_dir)
    ev = (latest_state(cl, ["pk"])
          .select(F.lit("events").alias("part"),
                  "seq", "ts", "pk", "value", "props"))
    bl = (_binlog_roundtrip_final_state(cl.filter(F.col("seq") < 8192))
          .select(F.lit("binlog").alias("part"),
                  "seq", "ts", "pk", "value", "props"))
    return ev.unionByName(bl)


_FINAL_STATE_SQL = _CL + """
, final AS (
  SELECT seq, ts, pk, value, props FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY pk ORDER BY seq DESC) AS rn
    FROM changelog
  ) WHERE rn = 1 AND op <> 'delete'
), bfinal AS (
  SELECT seq, ts, pk, value, props FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY pk ORDER BY seq DESC) AS rn
    FROM changelog WHERE seq < 8192
  ) WHERE rn = 1 AND op <> 'delete'
)
SELECT 'events' AS part, seq, ts, pk, value, props FROM final
UNION ALL
SELECT 'binlog' AS part, seq, ts, pk, value, props FROM bfinal
"""


# --- R6: changed-column diff / partial update merge ---------------------

def cdc_partial_update_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three labelled parts over one derived changelog:
    - 'partial': update events carry only `value` (props NULL),
      inserts the full row -- the reference ships only changed columns
      on update (river/sync.go:367-370) -- merged by
      fill_partial_updates.
    - 'collapsing' (round 8): the CollapsingMergeTree FINAL analog --
      the changelog mapped to a sign stream (delete = -1, else +1); a
      key survives while its sign sum is positive, values from the
      latest +1 row (operators/upsert.py::collapsing_final_state).
    - 'summing' (round 8): the SummingMergeTree FINAL analog over
      integer deltas (signed row count + signed value cents --
      integer so the oracle's sums are engine-exact), all-zero rows
      dropped (summing_final_state). seq carries the qty sum and
      value the cents sum in this part's rows."""
    from ..operators.upsert import (collapsing_final_state,
                                    summing_final_state)

    cl0 = derive_changelog_from_events(spark, sf_dir)
    cl = cl0.withColumn(
        "props", F.when(F.col("op") == "update", F.lit(None)).otherwise(F.col("props")))
    p1 = fill_partial_updates(cl, ["pk"], ["value", "props"]).select(
        F.lit("partial").alias("part"), "seq", "ts", "pk", "value",
        "props")

    signed = cl0.select(
        "seq", "ts", "pk", "value", "props",
        F.when(F.col("op") == "delete", F.lit(-1)).otherwise(F.lit(1))
         .alias("sign"))
    p2 = collapsing_final_state(signed, ["pk"], sign_col="sign",
                                version_col="seq").select(
        F.lit("collapsing").alias("part"), "seq", "ts", "pk", "value",
        "props")

    cents = F.floor(F.col("value") * 100)
    deltas = cl0.select(
        "pk",
        F.when(F.col("op") == "delete", F.lit(-1)).otherwise(F.lit(1))
         .alias("qty"),
        F.when(F.col("op") == "delete", -cents).otherwise(cents)
         .alias("cents"),
        F.col("op").alias("tag"))
    p3 = summing_final_state(deltas, ["pk"], ["qty", "cents"]).select(
        F.lit("summing").alias("part"),
        F.col("qty").cast("long").alias("seq"),
        F.lit(None).cast("timestamp").alias("ts"),
        "pk",
        F.col("cents").cast("double").alias("value"),
        F.col("tag").alias("props"))
    return p1.unionByName(p2).unionByName(p3)


_PARTIAL_SQL = _CL + """
, masked AS (
  SELECT seq, ts, op, pk, value,
         CASE WHEN op = 'update' THEN NULL ELSE props END AS props
  FROM changelog
), inc AS (
  SELECT *, SUM(CASE WHEN op = 'delete' THEN 1 ELSE 0 END)
              OVER (PARTITION BY pk ORDER BY seq
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __inc
  FROM masked
), filled AS (
  SELECT seq, ts, op, pk,
         last_value(value IGNORE NULLS)
           OVER (PARTITION BY pk, __inc ORDER BY seq
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
         last_value(props IGNORE NULLS)
           OVER (PARTITION BY pk, __inc ORDER BY seq
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS props
  FROM inc
)
, signed AS (
  SELECT seq, ts, pk, value, props,
         CASE WHEN op = 'delete' THEN -1 ELSE 1 END AS sign
  FROM changelog
), surv AS (
  SELECT pk FROM signed GROUP BY pk HAVING SUM(sign) > 0
), clast AS (
  SELECT seq, ts, pk, value, props FROM (
    SELECT s.*, ROW_NUMBER() OVER (
      PARTITION BY pk
      ORDER BY CASE WHEN sign > 0 THEN seq END DESC NULLS LAST) AS rn
    FROM signed s) WHERE rn = 1
), sdelta AS (
  SELECT pk,
         CASE WHEN op = 'delete' THEN -1 ELSE 1 END AS qty,
         CASE WHEN op = 'delete'
              THEN -CAST(FLOOR(value * 100) AS BIGINT)
              ELSE CAST(FLOOR(value * 100) AS BIGINT) END AS cents,
         op AS tag
  FROM changelog
), ssum AS (
  SELECT pk, CAST(SUM(qty) AS BIGINT) AS qty,
         CAST(SUM(cents) AS BIGINT) AS cents, MIN(tag) AS tag
  FROM sdelta GROUP BY pk
  HAVING COALESCE(SUM(qty), 0) <> 0 OR COALESCE(SUM(cents), 0) <> 0
)
SELECT 'partial' AS part, seq, ts, pk, value, props FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY pk ORDER BY seq DESC) AS rn
  FROM filled
) WHERE rn = 1 AND op <> 'delete'
UNION ALL
SELECT 'collapsing' AS part, c.seq, c.ts, c.pk, c.value, c.props
FROM clast c JOIN surv USING (pk)
UNION ALL
SELECT 'summing' AS part, qty AS seq, CAST(NULL AS TIMESTAMP) AS ts,
       pk, CAST(cents AS DOUBLE) AS value, tag AS props
FROM ssum
"""


# --- S1+S2: snapshot + incremental changelog ----------------------------

# the escape-grammar gauntlet the mysqldump round trip must carry
# byte-exactly: single quote, backslash, newline, tab. Both engines
# build the same plaintext; only the Spark side routes it through
# dump-text escapes.
_DUMP_SUFFIX = "'\\\n\ttail"


def _mysqldump_roundtrip_snapshot(cust: DataFrame) -> DataFrame:
    """Drive a bounded snapshot slice through REAL mysqldump text and
    back: render each 512-key range as one extended INSERT statement
    (sources/mysqldump.render_insert -- the public dump format,
    backslash escapes and all), parse it with the from-scratch reader
    (statements_to_rows: line-filter + Arrow-batched tokenizer +
    Catalyst casts), and emit the typed snapshot rows. The oracle
    computes the same rows straight from `customer`, so any
    escape/tokenize/cast asymmetry in the dump layer breaks the value
    hash -- the CORRECTNESS row for the reference's mysqldump
    snapshot transport (river/river.go:111-146). Fixed key range
    (c_custkey <= 4096), so the probe's cost is constant in sf; the
    statement axis is the parallelism, exactly the module's contract."""
    import pandas as pd

    from ..sources.mysqldump import (DumpTable, render_insert,
                                     statements_to_rows)

    sl = (cust.filter(F.col("c_custkey") <= 4096)
          .select(F.col("c_custkey").alias("pk"),
                  F.col("c_acctbal").alias("value"),
                  F.concat(F.col("c_name"),
                           F.lit(_DUMP_SUFFIX)).alias("props")))

    def enc(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("pk")
        rows = [[int(r.pk),
                 None if pd.isna(r.value) else float(r.value),
                 None if r.props is None else str(r.props)]
                for r in pdf.itertuples(index=False)]
        return pd.DataFrame({"stmt": [render_insert("customer_snap",
                                                    rows)]})

    stmts = (sl.withColumn("chunk",
                           F.floor(F.col("pk") / F.lit(512)).cast("long"))
             .groupBy("chunk").applyInPandas(enc, "stmt string"))
    t = DumpTable("customer_snap",
                  [("pk", "bigint", False), ("value", "double", True),
                   ("props", "varchar(256)", True)], ("pk",))
    return (statements_to_rows(stmts, t)
            .select(F.lit(-1).cast("long").alias("seq"),
                    F.lit(None).cast("timestamp").alias("ts"),
                    "pk", "value", "props"))


def cdc_snapshot_plus_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two labelled parts: 'merged' is the snapshot+changelog upsert
    (S1+S2 -- the initial full load entering the dedup at seq=-1);
    'dump' routes a fixed 4096-key snapshot slice through real
    mysqldump INSERT text and back (escape grammar, tokenizer, typed
    casts) and must land on the oracle's direct rows."""
    # snapshot analog: one base row per customer key present in events
    cust = load_table(spark, sf_dir, "customer")
    snap = cust.select(
        F.col("c_custkey").alias("pk"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.col("c_acctbal").alias("value"),
        F.lit("{}").alias("props"),
    )
    cl = derive_changelog_from_events(spark, sf_dir)
    merged = (apply_snapshot_and_changelog(snap, cl, ["pk"])
              .select(F.lit("merged").alias("part"),
                      "seq", "ts", "pk", "value", "props"))
    dump = (_mysqldump_roundtrip_snapshot(cust)
            .select(F.lit("dump").alias("part"),
                    "seq", "ts", "pk", "value", "props"))
    return merged.unionByName(dump)


_SNAP_SQL = _CL + """
, snap AS (
  SELECT -1 AS seq, CAST(NULL AS TIMESTAMP) AS ts, 'insert' AS op,
         c_custkey AS pk, c_acctbal AS value, '{}' AS props
  FROM customer
), merged AS (
  SELECT seq, ts, op, pk, value, props FROM snap
  UNION ALL
  SELECT seq, ts, op, pk, value, props FROM changelog
)
SELECT 'merged' AS part, seq, ts, pk, value, props FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY pk ORDER BY seq DESC) AS rn
  FROM merged
) WHERE rn = 1 AND op <> 'delete'
UNION ALL
SELECT 'dump' AS part, CAST(-1 AS BIGINT) AS seq,
       CAST(NULL AS TIMESTAMP) AS ts, c_custkey AS pk,
       c_acctbal AS value,
       c_name || chr(39) || chr(92) || chr(10) || chr(9) || 'tail'
         AS props
FROM customer WHERE c_custkey <= 4096
"""


# --- R3/R4/R5: routing + column filter + rename (real Rule code) --------

_RULE = Rule(
    source_schema="app", source_table="events_cdc",
    sink_schema="olap", sink_table="events_synced",
    pk=("pk",),
    column_filter=("pk", "seq", "value", "ts"),
    field_mapping={"value": "es_value"},
)


def cdc_route_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    cl = derive_changelog_from_events(spark, sf_dir)
    state = latest_state(cl, ["pk"])
    return _RULE.apply_projection(state)


_ROUTE_SQL = _CL + """
SELECT seq, ts, pk, value AS es_value FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY pk ORDER BY seq DESC) AS rn
  FROM changelog
) WHERE rn = 1 AND op <> 'delete'
"""


# --- R7: composite-PK document key --------------------------------------

_RULE_COMPOSITE = Rule(
    source_schema="app", source_table="events_cdc",
    sink_schema="olap", sink_table="events_synced",
    pk=("pk", "seq"),
)


def cdc_composite_pk_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite doc id 'pk:seq' (reference intends 'a:b' ids,
    river/river_test.go:109,295, but its getDocID only uses the first
    PK column -- river/sync.go:393-412; we implement the intent)."""
    cl = derive_changelog_from_events(spark, sf_dir)
    return cl.select(_RULE_COMPOSITE.pk_key().alias("doc_id"),
                     F.col("op"), F.col("value"))


_COMPOSITE_SQL = _CL + """
SELECT pk || ':' || seq AS doc_id, op, value FROM changelog
"""


# --- S4: wildcard fan-in with schema drift ------------------------------

def cdc_wildcard_fan_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    cl = derive_changelog_from_events(spark, sf_dir)
    shard0 = cl.filter(F.col("pk") % 3 == 0)
    shard1 = cl.filter(F.col("pk") % 3 == 1)
    # shard2 drifted: lost `props` (mid-stream DROP COLUMN analog,
    # river/river_test.go:385-399) -> NULL after fan-in
    shard2 = cl.filter(F.col("pk") % 3 == 2).drop("props")
    return fan_in([shard0, shard1, shard2])


_FAN_IN_SQL = _CL + """
SELECT seq, ts, op, pk, value, props FROM changelog WHERE pk % 3 = 0
UNION ALL
SELECT seq, ts, op, pk, value, props FROM changelog WHERE pk % 3 = 1
UNION ALL
SELECT seq, ts, op, pk, value, NULL AS props FROM changelog WHERE pk % 3 = 2
"""


# --- A1: stat counters ---------------------------------------------------

def cdc_op_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-op sync counters (the reference's insert/update/delete
    stat surface) plus behavioral-analytics rows checked through the
    REAL operator cores (operators/funnel.py): 'seq_click_purchase' =
    users with a click followed (in (ts, event_id) order, any gap) by
    a purchase -- the '(?1).*(?2)' sequenceMatch pattern, whose
    existence form the oracle mirrors as an ordered EXISTS pair."""
    from ..operators.funnel import retention, sequence_funnel_next_node
    cl = derive_changelog_from_events(spark, sf_dir)
    ops = cl.groupBy("op").agg(F.count(F.lit(1)).alias("n"))
    ev = load_table(spark, sf_dir, "events")
    conds = [F.col("event_type") == "click",
             F.col("event_type") == "purchase"]
    # 'seq_click_purchase' + 'funnel_l2_1800s' + the 'nextnode_*' rows
    # all come from ONE fused events scan + ONE per-user shuffle + ONE
    # applyInPandas pass (round 15, guide §4:
    # funnel.sequence_funnel_next_node runs the same _match_sequence /
    # _funnel_level / shift-and-AND cores as the standalone operators;
    # composition row-identity is test-asserted). r5's entry ran two
    # separate scans + shuffles for the first two rows alone, and until
    # this round sequenceNextNode paid a THIRD scan + shuffle + Python
    # pass over the same events. 'funnel_l2_1800s' = users whose 2-step
    # funnel completes within 1800 s of the chain start; for 2 steps
    # "level >= 2" == EXISTS an ordered pair within the window, which
    # the oracle states.
    #
    # The fused relation feeds ONE rollup aggregation (not one
    # consumer per output row -- a second consumer would re-run the
    # whole Python pass, the branch-recompute trap): the grand-total
    # row carries the matched/level sums, the per-next_value rows the
    # nextnode counts. matched/level are False/0 for users with no
    # conds-matching event (sf_any false), exactly the rows
    # sequence_and_funnel never saw, so the sums are unchanged.
    # Rollup on an EMPTY relation yields no grand-total row (unlike
    # the agg-without-groupBy it replaces), so the two counter rows
    # are seeded with literal zeros and summed per op -- row presence
    # is input-independent, as before.
    fused = sequence_funnel_next_node(
        ev, "user_id", "ts", "(?1).*(?2)", conds, 1800, "event_type",
        [F.col("event_type") == "click",
         F.col("event_type") == "view"])
    g = (fused.rollup("next_value")
         .agg(F.sum(F.when(F.col("matched"), 1).otherwise(0))
               .alias("nm"),
              F.sum(F.when(F.col("level") >= 2, 1).otherwise(0))
               .alias("nl"),
              F.count(F.lit(1)).alias("nv"),
              F.grouping("next_value").alias("gid")))
    # ONE consumer of g (a second consumer would duplicate the whole
    # fused subtree, Python pass included): the grand-total row
    # explodes into the two counter rows, each per-value row into its
    # nextnode row, the null-value group into nothing. The seed union
    # + per-op sum keeps the two counter rows present even on an empty
    # events relation (rollup emits no grand total there, where the
    # agg-without-groupBy this replaces emitted one).
    _row = "struct<op:string,n:bigint>"
    fused_rows = (g.select(F.explode(
        F.when(F.col("gid") == 1, F.array(
            F.struct(F.lit("seq_click_purchase").alias("op"),
                     F.col("nm").cast("long").alias("n")),
            F.struct(F.lit("funnel_l2_1800s").alias("op"),
                     F.col("nl").cast("long").alias("n"))))
         .when(F.col("next_value").isNotNull(), F.array(
             F.struct(F.concat(F.lit("nextnode_"),
                               F.col("next_value")).alias("op"),
                      F.col("nv").cast("long").alias("n"))))
         .otherwise(F.lit(None).cast(f"array<{_row}>"))).alias("s"))
        .select("s.op", "s.n"))
    seed = spark.createDataFrame(
        [("seq_click_purchase", 0), ("funnel_l2_1800s", 0)],
        "op string, n bigint")
    two = (seed.unionByName(fused_rows)
           .groupBy("op").agg(F.sum("n").alias("n")))
    # 'retention_r2': the retention() aggregate's r2 column (did
    # cond1 AND cond2 ever hold) counted over users -- order-free, so
    # the oracle is a per-user bool_and of two bool_ors
    rt = (retention(ev, "user_id", conds)
          .filter(F.col("r2"))
          .agg(F.count(F.lit(1)).alias("n"))
          .select(F.lit("retention_r2").alias("op"), "n"))
    # 'topk_<event_type>': the SpaceSaving topK aggregate through its
    # real mapInPandas summaries + bounded merge. The fixture has 5
    # event types < capacity k*3, so nothing is ever evicted and the
    # order-dependent sketch degenerates to EXACT counts -- which is
    # precisely what makes it oracle-checkable (the general case is
    # bound-tested in pytest)
    from ..operators.sketch import topk_space_saving
    tk = (topk_space_saving(ev, "event_type", k=3)
          .select(F.concat(F.lit("topk_"), F.col("item")).alias("op"),
                  F.col("est").alias("n")))
    # 'nextnode_<type>': sequenceNextNode(forward, first_match) through
    # the real adjacency scan (fused above) -- users counted by WHAT
    # THEY DID right after their first stream-adjacent click->view
    # pair; the oracle restates it with row_number windows (rn, rn+1
    # adjacency, value at first_rn + 2). The rows ride `two` via
    # fused_rows: each non-null per-value rollup row IS that per-user
    # count (one fused row per user; users whose chain ends the stream
    # carry a null next_value and land in the dropped null-value
    # group, exactly the rows the standalone path's isNotNull filter
    # dropped).
    # 'tfilter_<schema.table>': the S3 table include-filter (the canal
    # regex analog, plans/rules.RuleSet.table_regexes) applied the
    # distributed way -- `rlike` over a stream of derived table names,
    # anchored to mirror RuleSet.match's re.fullmatch. Driver-checked
    # against DuckDB's regexp_full_match on the identical names; the
    # filter DECISION (n=1 include / 0 drop) is the checked value.
    from ..plans.rules import Rule, RuleSet
    rs = RuleSet([Rule(source_schema="app",
                       source_table=r"events_\d+",
                       sink_schema="olap", sink_table="events")])
    pat = "^(?:" + "|".join(rs.table_regexes()) + ")$"
    names = (ev.select(F.concat(
                 F.when(F.col("user_id") % 3 == 0, F.lit("app"))
                  .otherwise(F.lit("other")),
                 F.lit("."),
                 F.when(F.col("user_id") % 2 == 0, F.lit("events_"))
                  .otherwise(F.lit("audit_")),
                 (F.col("user_id") % 7).cast("string")).alias("tbl"))
             .distinct())
    tf = names.select(
        F.concat(F.lit("tfilter_"), F.col("tbl")).alias("op"),
        F.col("tbl").rlike(pat).cast("long").alias("n"))
    return (ops.unionByName(two).unionByName(rt).unionByName(tk)
               .unionByName(tf))


_COUNTERS_SQL = _CL + """
SELECT op, COUNT(*) AS n FROM changelog GROUP BY op
UNION ALL
SELECT 'seq_click_purchase' AS op, COUNT(*) AS n FROM (
  SELECT e1.user_id
  FROM events e1 JOIN events e2
    ON e1.user_id = e2.user_id
   AND (e1.ts < e2.ts OR (e1.ts = e2.ts AND e1.event_id < e2.event_id))
  WHERE e1.event_type = 'click' AND e2.event_type = 'purchase'
  GROUP BY e1.user_id)
UNION ALL
SELECT 'funnel_l2_1800s' AS op, COUNT(*) AS n FROM (
  SELECT e1.user_id
  FROM events e1 JOIN events e2
    ON e1.user_id = e2.user_id
   AND (e1.ts < e2.ts OR (e1.ts = e2.ts AND e1.event_id < e2.event_id))
   AND epoch(e2.ts) - epoch(e1.ts) <= 1800
  WHERE e1.event_type = 'click' AND e2.event_type = 'purchase'
  GROUP BY e1.user_id)
UNION ALL
SELECT 'retention_r2' AS op, COUNT(*) AS n FROM (
  SELECT user_id
  FROM events
  GROUP BY user_id
  HAVING bool_or(event_type = 'click') AND bool_or(event_type = 'purchase'))
UNION ALL
SELECT op, n FROM (
  SELECT 'topk_' || event_type AS op, COUNT(*) AS n
  FROM events GROUP BY event_type
  ORDER BY n DESC, op ASC LIMIT 3)
UNION ALL
SELECT 'nextnode_' || o3.event_type AS op, COUNT(*) AS n FROM (
  SELECT o1.user_id, MIN(o1.rn) AS first_rn
  FROM (SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events) o1
  JOIN (SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events) o2
    ON o1.user_id = o2.user_id AND o2.rn = o1.rn + 1
  WHERE o1.event_type = 'click' AND o2.event_type = 'view'
  GROUP BY o1.user_id) m
JOIN (SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events) o3
  ON o3.user_id = m.user_id AND o3.rn = m.first_rn + 2
GROUP BY o3.event_type
UNION ALL
SELECT 'tfilter_' || tbl AS op,
       CAST(regexp_full_match(tbl, 'app\\.events_\\d+') AS BIGINT) AS n
FROM (
  SELECT DISTINCT
         (CASE WHEN user_id % 3 = 0 THEN 'app' ELSE 'other' END)
         || '.'
         || (CASE WHEN user_id % 2 = 0 THEN 'events_' ELSE 'audit_' END)
         || CAST(user_id % 7 AS VARCHAR) AS tbl
  FROM events)
"""


# --- S2b: Debezium envelope parse (checked in batch) --------------------

def cdc_debezium_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium-envelope parsing as a checked query: synthesize the
    public envelope JSON from the events table (op from event_type,
    binlog position from event_id, the row-in-statement disambiguator
    from event_id % 3), then run the SAME parse_debezium the streaming
    source uses (sources/debezium.py). The oracle computes the expected
    output arithmetic directly -- passing proves the parser inverts the
    envelope encoding, including the (file, pos, row) -> seq fold and
    the c/r/u/d op mapping."""
    from ..sources.debezium import parse_debezium
    ev = load_table(spark, sf_dir, "events")
    op = (F.when(F.col("event_type") == "click", "c")
           .when(F.col("event_type") == "view", "r")
           .when(F.col("event_type") == "purchase", "u")
           .otherwise("d"))
    # updates ('u') carry the paired OLD row image, as the binlog does
    # (reference river/sync.go:84-102 consumes (old, new) update
    # pairs); before.val = value - 2.5 is the synthetic prior value
    before = F.when(
        op == "u",
        F.struct(F.col("user_id").alias("id"),
                 (F.col("value") - 2.5).alias("val")))
    env = F.to_json(F.struct(
        before.alias("before"),
        F.struct(F.col("user_id").alias("id"),
                 F.col("value").alias("val")).alias("after"),
        F.struct(F.lit("app").alias("db"), F.lit("events").alias("table"),
                 F.lit("mysql-bin.000007").alias("file"),
                 F.col("event_id").alias("pos"),
                 (F.col("event_id") % 3).cast("int").alias("row"),
                 F.unix_millis("ts").alias("ts_ms")).alias("source"),
        op.alias("op"),
        F.unix_millis("ts").alias("ts_ms")))
    out = parse_debezium(ev.select(env.alias("value")),
                         "id long, val double", with_before=True)
    # R2 update pairing, checked: before_val is the paired old image
    # for updates and NULL otherwise (the oracle restates the
    # synthesis arithmetic independently)
    return out.select("seq", "ts", "op", "id", "val", "before_val")


# seq = file_idx(7) << 40 | pos(event_id) << 8 | row(event_id % 3)
_DBZ_PARSE_SQL = """
SELECT 7 * 1099511627776 + event_id * 256 + event_id % 3 AS seq,
       make_timestamp(epoch_ms(ts) * 1000) AS ts,
       CASE event_type WHEN 'click' THEN 'insert'
                       WHEN 'view' THEN 'insert'
                       WHEN 'purchase' THEN 'update'
                       ELSE 'delete' END AS op,
       user_id AS id, value AS val,
       CASE WHEN event_type = 'purchase' THEN value - 2.5 END AS before_val
FROM events
"""


QUERIES = {
    "cdc_final_state": cdc_final_state,
    "cdc_partial_update_merge": cdc_partial_update_merge,
    "cdc_snapshot_plus_changelog": cdc_snapshot_plus_changelog,
    "cdc_route_project_rename": cdc_route_project_rename,
    "cdc_composite_pk_key": cdc_composite_pk_key,
    "cdc_wildcard_fan_in": cdc_wildcard_fan_in,
    "cdc_op_counters": cdc_op_counters,
    "cdc_debezium_parse": cdc_debezium_parse,
}

ORACLE = {
    "cdc_debezium_parse": _DBZ_PARSE_SQL,
    "cdc_final_state": _FINAL_STATE_SQL,
    "cdc_partial_update_merge": _PARTIAL_SQL,
    "cdc_snapshot_plus_changelog": _SNAP_SQL,
    "cdc_route_project_rename": _ROUTE_SQL,
    "cdc_composite_pk_key": _COMPOSITE_SQL,
    "cdc_wildcard_fan_in": _FAN_IN_SQL,
    "cdc_op_counters": _COUNTERS_SQL,
}
