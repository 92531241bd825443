"""Z-order layout (operators/layout.py): Morton interleaving is
correct bit arithmetic, and the written layout localizes predicates on
EITHER clustering dimension into few files -- the multi-dim clustering
a single-column sort cannot give."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_syncer_clickhouse_spark.operators.layout import (
    z_order_write, z_value)
from mysql_syncer_clickhouse_spark.sources.tables import load_table


def test_z_value_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5)], "a long, b long")
    got = {(r["a"], r["b"]): r["z"] for r in
           df.select("a", "b",
                     z_value([F.col("a"), F.col("b")], bits=4)
                     .alias("z")).collect()}
    # bit i of a -> position 2i; bit i of b -> position 2i+1
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    # a=3 (0b11) -> bits 0,2; b=5 (0b101) -> bits 1,5 -> wait: b bits
    # 0 and 2 land at positions 1 and 5 -> 1+4 + 2+32 = 0b100111 = 39
    assert got[(3, 5)] == (1 | 4) | (2 | 32)


def _files_for(df):
    return set(r["f"] for r in
               df.select(F.input_file_name().alias("f")).collect())


def test_z_order_localizes_both_dimensions(spark, tmp_path):
    orders = load_table(spark, "/root/testdata/sf0.01", "orders")
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    n_files = 16
    z_order_write(orders, zpath, ["o_custkey", "o_totalprice"],
                  n_files=n_files)
    # single-column-sorted baseline: clustered on custkey only
    (orders.repartitionByRange(n_files, "o_custkey")
           .sortWithinPartitions("o_custkey")
           .write.mode("overwrite").parquet(spath))

    zdf = spark.read.parquet(zpath)
    sdf = spark.read.parquet(spath)
    assert zdf.count() == orders.count()

    lo_c, hi_c = 100, 200                     # narrow custkey slice
    lo_p, hi_p = 1000.0, 11000.0              # narrow price slice
    zc = _files_for(zdf.filter(F.col("o_custkey").between(lo_c, hi_c)))
    zp = _files_for(zdf.filter(
        F.col("o_totalprice").between(lo_p, hi_p)))
    sp = _files_for(sdf.filter(
        F.col("o_totalprice").between(lo_p, hi_p)))

    # z-order localizes BOTH dimensions into a proper subset of files;
    # the single-column sort spreads the second dimension everywhere
    assert len(zc) < n_files
    assert len(zp) < n_files
    assert len(sp) == n_files
    # and the z-layout loses no rows for the same predicate
    assert (zdf.filter(F.col("o_totalprice").between(lo_p, hi_p)).count()
            == sdf.filter(F.col("o_totalprice").between(lo_p, hi_p))
            .count())
