"""Vector primitives for similarity search over embedding columns.

Dot products and norms use JVM-side `zip_with`/`aggregate` lambdas (no
Python UDFs in the hot path). Accumulation is sequential left-to-right
in double -- deterministic for a given array regardless of engine
parallelism (the lambda runs per row, not across partitions), and each
float*float product is exactly representable in double (24+24 mantissa
bits < 53), so Spark and an oracle engine that sums in array order
produce bit-identical doubles. Scores are ROUNDED before ranking and
ties broken by id, so top-k results stay deterministic even across
engines with different summation tails.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _seq_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(_c(a).cast("array<double>"),
                       _c(b).cast("array<double>"),
                       lambda x, y: x * y)
    return _seq_sum(prods)


def norm_sq(a: Column | str) -> Column:
    sq = F.transform(_c(a).cast("array<double>"), lambda x: x * x)
    return _seq_sum(sq)


def cosine(a: Column | str, b: Column | str, scale: int = 6) -> Column:
    """Cosine similarity rounded to `scale` -- always order downstream
    top-k by the ROUNDED score plus a unique id so ranking is
    deterministic everywhere."""
    return F.round(dot(a, b) / (F.sqrt(norm_sq(a)) * F.sqrt(norm_sq(b))),
                   scale)


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize; zero vectors pass through unchanged (no NaNs).
    Normalized corpora turn cosine top-k into dot-product top-k --
    one multiply-add per dimension instead of three reductions."""
    v = _c(a).cast("array<double>")
    n = F.sqrt(norm_sq(v))
    return F.when(n == 0.0, v).otherwise(
        F.transform(v, lambda x: x / n))


def quantize_int8(a: Column | str) -> Column:
    """Symmetric int8 scalar quantization: struct(scale double,
    q array<tinyint>) with q = round(x / scale * 127), scale =
    max(|x|). 4x smaller than float32 (8x vs the double arrays Spark
    shuffles) -- at 100 TB the embedding store and every ANN shuffle
    shrink by that factor, at ~1e-2 cosine error (test-bounded).
    Zero vectors quantize to scale 0 / all-zero q."""
    v = _c(a).cast("array<double>")
    scale = F.aggregate(v, F.lit(0.0),
                        lambda acc, x: F.greatest(acc, F.abs(x)))
    q = F.when(scale == 0.0,
               F.transform(v, lambda x: F.lit(0).cast("tinyint"))) \
         .otherwise(F.transform(
             v, lambda x: F.round(x / scale * 127).cast("tinyint")))
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize(qs: Column | str) -> Column:
    """Inverse of quantize_int8: array<double> reconstruction."""
    s = _c(qs)
    return F.transform(s.getField("q"),
                       lambda x: x.cast("double") * s.getField("scale")
                       / 127.0)
