"""Distributed quality classifier for training-data curation: a
hashed bag-of-words logistic regression, the GPT-3/fastText-style
"does this look like reference text?" filter (Brown et al. 2020 §A;
fastText: Joulin et al. 2016), trained entirely as DataFrame
aggregations.

This complements the CCNet perplexity filter (operators/curation.py's
LM tables): perplexity asks "is this fluent under a trusted LM?";
the classifier asks "does this resemble the positive corpus?" with a
DISCRIMINATIVE model that can key on any hashed token evidence.

Scale shape (the reason this is written as aggregations, not sklearn):
- featurize: explode tokens -> salted-hash bucket -> ONE (id, feat)
  keyed count. Feature space is a fixed n_features buckets, so every
  model-sized relation is bounded regardless of corpus size.
- each full-batch GD iteration = one doc-keyed agg (margins), one
  doc-keyed join (residual back onto features), one feat-keyed agg
  (gradient, <= n_features output rows), one driver update of a
  n_features-float vector. Same driver-coordinates/data-distributed
  loop as k-means (operators/ann.py) and BPE training
  (operators/bpe.py).
- scoring = map-side featurize + broadcast weight join + doc-keyed sum.

Determinism (repo convention, cf. the LM tables' integer micro-nats):
per-doc feature weights are integer micro-TFs (round(1e6 * cnt /
n_tokens)) and each doc's gradient contribution is rounded to an
integer before the cross-doc sum -- sums of longs are order-free, so
training is bit-identical under ANY partitioning (test-asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import portable_hash32, words

N_FEATURES = 4096
MICRO = 1_000_000


def featurize(docs: DataFrame, id_col: str, text_col: str,
              n_features: int = N_FEATURES) -> DataFrame:
    """(id, feat, tf_micro): hashed-bucket token counts normalized by
    document length, as integer micro-TFs. One explode + one keyed
    aggregation; the 'qc:' salt decorrelates these buckets from every
    other hash-derived operator."""
    toks = (docs.select(F.col(id_col).alias("id"),
                        F.size(words(text_col)).alias("n_tok"),
                        F.explode(words(text_col)).alias("tok"))
                .select("id", "n_tok",
                        (portable_hash32(F.concat(F.lit("qc:"), F.col("tok")))
                         % n_features).cast("int").alias("feat")))
    return (toks.groupBy("id", "feat")
                .agg(F.count(F.lit(1)).alias("cnt"),
                     F.first("n_tok").alias("n_tok"))
                .select("id", "feat",
                        F.round(F.lit(MICRO) * F.col("cnt") / F.col("n_tok"))
                         .cast("long").alias("tf_micro")))


def _margins(feats: DataFrame, weights: DataFrame) -> DataFrame:
    """(id, margin): w·x + b via a broadcast join against the bounded
    weight table. weights rows: (feat, w); feat = -1 carries the bias
    (matched to every doc through the implicit tf of 1)."""
    w = weights.filter(F.col("feat") >= 0)
    bias = weights.filter(F.col("feat") == -1).select(
        F.col("w").alias("bias"))
    dot = (feats.join(F.broadcast(w), "feat")
                .groupBy("id")
                .agg((F.sum(F.col("tf_micro") * F.col("w")) / MICRO)
                     .alias("dot")))
    return dot.crossJoin(F.broadcast(bias)).select(
        "id", (F.col("dot") + F.col("bias")).alias("margin"))


def train_quality_classifier(docs: DataFrame, id_col: str, text_col: str,
                             label_col: str,
                             n_features: int = N_FEATURES,
                             iters: int = 12, lr: float = 10.0,
                             l2: float = 1e-4) -> DataFrame:
    """Full-batch logistic regression; returns the bounded weight table
    (feat, w) with the bias at feat = -1, ready for score_quality.

    `label_col` is 0/1 (1 = looks like the trusted/positive corpus).
    The loop is driver-side control flow only; per iteration the data
    side is two keyed aggregations and one doc-keyed join, and the
    driver folds a <= n_features-row integer gradient into the weight
    vector. localCheckpoint is unnecessary -- each iteration's plan
    depends only on the cached featurization, not the previous plan."""
    spark = docs.sparkSession
    feats = featurize(docs, id_col, text_col, n_features)
    labels = docs.select(F.col(id_col).alias("id"),
                         F.col(label_col).cast("int").alias("y"))
    n_docs = labels.count()

    wvec = [0.0] * n_features
    bias = 0.0
    for _ in range(iters):
        wdf = spark.createDataFrame(
            [(f, wvec[f]) for f in range(n_features)] + [(-1, bias)],
            "feat int, w double")
        m = _margins(feats, wdf)
        resid = (labels.join(m, "id", "left")
                 .select("id",
                         (F.lit(1.0) / (F.lit(1.0)
                          + F.exp(-F.coalesce("margin", F.lit(0.0))))
                          - F.col("y")).alias("r")))
        # per-doc contribution rounded to integers BEFORE the cross-doc
        # sum -> gradient identical under any partitioning
        grad_rows = (feats.join(resid, "id")
                     .select("feat",
                             F.round(F.col("r") * F.col("tf_micro"))
                              .cast("long").alias("g"))
                     .groupBy("feat").agg(F.sum("g").alias("g"))
                     .collect())
        gbias = resid.select(
            F.sum(F.round(F.col("r") * MICRO).cast("long")).alias("g")
        ).collect()[0]["g"] or 0
        for row in grad_rows:
            f = row["feat"]
            wvec[f] -= lr * (row["g"] / MICRO / n_docs + l2 * wvec[f])
        bias -= lr * (gbias / MICRO / n_docs)
    return spark.createDataFrame(
        [(f, wvec[f]) for f in range(n_features)] + [(-1, bias)],
        "feat int, w double")


def score_quality(docs: DataFrame, weights: DataFrame,
                  id_col: str, text_col: str,
                  n_features: int = N_FEATURES) -> DataFrame:
    """(id, score): sigmoid(w·x + b) in [0,1], higher = more like the
    positive corpus. Map-side featurize + broadcast weight join +
    doc-keyed sum -- one shuffle per scored corpus."""
    feats = featurize(docs, id_col, text_col, n_features)
    m = _margins(feats, weights)
    return (docs.select(F.col(id_col).alias("id"))
                .join(m, "id", "left")
                .select("id",
                        (F.lit(1.0) / (F.lit(1.0)
                         + F.exp(-F.coalesce("margin", F.lit(0.0)))))
                        .alias("score")))


def classifier_filter(docs: DataFrame, weights: DataFrame,
                      id_col: str, text_col: str,
                      threshold: float = 0.5,
                      n_features: int = N_FEATURES) -> DataFrame:
    """Keep documents scoring >= threshold -- the curation-pipeline
    form (GPT-3 applied a Pareto-smoothed variant of exactly this
    keep/drop decision)."""
    keep = (score_quality(docs, weights, id_col, text_col, n_features)
            .filter(F.col("score") >= threshold)
            .select(F.col("id").alias(id_col)))
    return docs.join(keep, id_col, "left_semi")
