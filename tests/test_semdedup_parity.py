"""Forced bit-equality harness for the semdedup Arrow pair stage (r16).

The Arrow pass (ann._semdedup_dups_arrow) must be BIT-equal to the
DataFrame fold (ann._semdedup_dups_frame) -- r15 VERDICT scoped the
three divergence axes to prove: Spark's NaN-largest ordering, NULL
csim propagation for zero vectors, and Round's
BigDecimal-over-Double.toString HALF_UP vs numpy's binary half-even.
"""
from __future__ import annotations

import math
import struct

import pytest
from pyspark.sql import functions as F

from mysql_syncer_clickhouse_spark.operators import ann


def _bits(x):
    """Bit-exact comparison key for a possibly-None float."""
    if x is None:
        return None
    return struct.unpack("<q", struct.pack("<d", float(x)))[0]


def _rows_key(rows):
    return sorted(
        (r["id"], r["cid"], _bits(r["csim"]), r["dup_of"], r["kept"])
        for r in rows)


def _semdedup_both(vecs, monkeypatch, **kw):
    """Run semdedup twice on identical input: once with the Arrow pair
    stage (the default for integral ids), once forced through the
    DataFrame fold."""
    arrow = ann.semdedup(vecs, **kw).collect()
    with monkeypatch.context() as m:
        m.setattr(ann, "_semdedup_dups_arrow",
                  lambda scored, eps, keep, id_type:
                  ann._semdedup_dups_frame(scored, eps, keep))
        frame = ann.semdedup(vecs, **kw).collect()
    return arrow, frame


def test_round_threshold_matches_spark_round(spark):
    """c >= _round_ge_threshold(eps) must agree with Spark's
    ROUND(c, 6) >= eps for every double, including the HALF_UP
    boundary ladder around eps - 5e-7."""
    eps = 0.98
    t = ann._round_ge_threshold(spark, eps)
    probes = []
    for center in (0.9799995, 0.98, 0.9799990, 0.9800005, t):
        c = center
        for _ in range(40):
            c = math.nextafter(c, 0.0)
        for _ in range(80):
            probes.append(c)
            c = math.nextafter(c, 1.0)
    df = spark.createDataFrame([(c,) for c in probes], "c double")
    got = df.select("c", (F.round("c", 6) >= F.lit(eps)).alias("ge")) \
            .collect()
    for r in got:
        assert r["ge"] == (r["c"] >= t), \
            f"threshold disagrees with Spark round at {r['c']!r}"


def test_arrow_pair_stage_bit_equal_on_fixture(spark, sf_dir,
                                               monkeypatch):
    """Full semdedup output (id, cid, csim, dup_of, kept) bit-equal
    between the Arrow and frame pair stages on the real vector corpus,
    for both keep policies."""
    from mysql_syncer_clickhouse_spark.queries.llm import _vec_corpus
    vecs = _vec_corpus(spark, sf_dir)
    for keep in ("far", "near"):
        arrow, frame = _semdedup_both(
            vecs, monkeypatch, eps=0.98, keep=keep, cluster_col="label",
            id_col="id", vec_col="v")
        assert _rows_key(arrow) == _rows_key(frame)
        assert any(not r["kept"] for r in arrow)   # non-trivial


def test_arrow_pair_stage_adversarial_edges(spark, monkeypatch):
    """Ties (identical vectors -> equal csim -> id tie-break), scaled
    copies (cosine exactly 1), near-threshold cosines, singleton
    clusters, NaN vectors (Spark NaN-largest ordering), and -- under a
    non-ANSI session -- zero vectors (NULL csim, always kept, never a
    dup_of)."""
    nan = float("nan")
    rows = [
        # cluster a: v1 == 2*v0 (cosine 1.0), v2 a tie of v0 (equal
        # csim, id tie-break), v3 near-orthogonal
        (0, "a", [1.0, 0.0, 1.0, 0.5]),
        (1, "a", [2.0, 0.0, 2.0, 1.0]),
        (2, "a", [1.0, 0.0, 1.0, 0.5]),
        (3, "a", [-1.0, 1.0, 0.0, 0.0]),
        # cluster b: near-threshold pair (cosine close to 0.98)
        (10, "b", [1.0, 0.0, 0.0, 0.0]),
        (11, "b", [1.0, 0.205, 0.0, 0.0]),
        (12, "b", [1.0, 0.19, 0.0, 0.0]),
        # cluster c: singleton
        (20, "c", [0.5, 0.5, 0.5, 0.5]),
        # cluster d: NaN vector among finite ones
        (30, "d", [1.0, 1.0, 0.0, 0.0]),
        (31, "d", [nan, 1.0, 0.0, 0.0]),
        (32, "d", [1.0, 1.0, 0.0, 1e-9]),
    ]
    vecs = spark.createDataFrame(
        rows, "vid long, grp string, emb array<double>")
    for keep in ("far", "near"):
        arrow, frame = _semdedup_both(
            vecs, monkeypatch, eps=0.98, keep=keep, cluster_col="grp",
            id_col="vid", vec_col="emb")
        assert _rows_key(arrow) == _rows_key(frame)
    # zero vectors produce NULL csim only under a non-ANSI session
    # (ANSI double division by zero throws in BOTH implementations
    # at the csim projection, before the pair stage)
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        rows_z = rows + [(40, "a", [0.0, 0.0, 0.0, 0.0]),
                         (41, "e", [0.0, 0.0, 0.0, 0.0]),
                         (42, "e", [0.0, 0.0, 0.0, 0.0])]
        vecs_z = spark.createDataFrame(
            rows_z, "vid long, grp string, emb array<double>")
        arrow, frame = _semdedup_both(
            vecs_z, monkeypatch, eps=0.98, keep="far",
            cluster_col="grp", id_col="vid", vec_col="emb")
        assert _rows_key(arrow) == _rows_key(frame)
        zero_rows = [r for r in arrow if r["id"] in (40, 41, 42)]
        assert all(r["kept"] and r["csim"] is None for r in zero_rows)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


def test_arrow_pair_stage_used_in_plan(spark, sf_dir):
    """The registered entry's sem part must carry exactly one
    FlatMapGroupsInPandas (the Arrow pass) and no per-pair fold:
    the pair stage's aggregate-lambda chain is gone from the plan."""
    from mysql_syncer_clickhouse_spark.queries.llm import (
        dedup_embedding_cosine)
    df = dedup_embedding_cosine(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
