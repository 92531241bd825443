"""Corpus-curation operators for the training-data pipeline layer:
benchmark decontamination, fixed-budget sequence packing, and
deterministic stratified hash sampling.

These extend the engine past the reference's sync surface the same way
the dedup/ANN layers do (the reference delegates all query-time work to
ClickHouse, README.md:44-56): operations every large-scale LLM
training-data pipeline runs over the synced corpus. All three are pure
Column-expression / built-in-operator plans -- zero Python UDFs -- and
every hash is md5-derived (functions/text.portable_hash32) so each has
an exact DuckDB oracle twin.

Scale notes (100 TB stance):
- decontamination joins on a DISTINCT n-gram hash key; the benchmark
  side is an eval suite (bounded by contract -- MBs, not corpus-scale),
  so AQE broadcasts it and the corpus side never shuffles. The per-doc
  overlap count is one keyed aggregation.
- packing is one window per stratum (a single hash-partitioned sort);
  strata (source/shard) bound partition width, so no global sort and no
  driver-side state.
- sampling is map-only: a deterministic hash filter, no shuffle at all,
  and reproducible across runs/partitionings by construction (the
  replacement for `ORDER BY rand() LIMIT n`, which is neither).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from .dedup import _spread


def _gram_hashes(df: DataFrame, id_col: str, text_col: str,
                 n: int) -> DataFrame:
    """(id, gh): distinct 32-bit hashes of the doc's word n-grams.
    Doc rows are spread across cores BEFORE the explode (parallelism is
    otherwise bound by input splits -- operators/dedup._spread
    rationale), and grams are built AND hashed post-explode as flat
    Column expressions (r15: exploded_word_ngrams -- the gram-ARRAY
    form ran the transform() concat lambda interpreted per element,
    the same trap the post-explode md5 here already avoided for the
    hash half)."""
    return (TX.exploded_word_ngrams(
                _spread(df.select(F.col(id_col).alias("id"), text_col),
                        "id"), text_col, n)
            .select("id", TX.portable_hash32(F.col("g")).alias("gh"))
            .distinct())


def benchmark_decontaminate(docs: DataFrame, bench: DataFrame, *,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            n: int = 3,
                            doc_grams: DataFrame | None = None,
                            bench_grams: DataFrame | None = None) -> DataFrame:
    """Count, per training document, the DISTINCT word n-grams it shares
    with a benchmark/eval corpus: (id, n_overlap), n_overlap = 0 for
    clean docs. Downstream filters `n_overlap >= k` (k=1 is the strict
    n-gram-collision rule used in practice for 8..13-grams).

    Both sides reduce to distinct 32-bit gram hashes BEFORE the join, so
    the join key payload is 8 bytes/gram and the benchmark side is tiny;
    the corpus side carries (id, hash) pairs into one keyed count.

    `doc_grams` (distinct (id, gh) for `docs`) / `bench_grams`
    (distinct (gh)) accept a PRE-TOKENIZED relation so a multi-part
    pipeline tokenizes the corpus once and shares it (the one-pass-
    tokenize contract, SCALE.md) -- at 100 TB each redundant
    tokenization is a full corpus pass. Values must be
    portable_hash32 of the word n-grams (what _gram_hashes emits).
    """
    if bench_grams is None:
        bench_grams = (_gram_hashes(bench, id_col, text_col, n)
                       .select("gh").distinct())
    if doc_grams is None:
        doc_grams = _gram_hashes(docs, id_col, text_col, n)
    overlap = (doc_grams.join(bench_grams, "gh")
               .groupBy("id")
               .agg(F.count(F.lit(1)).alias("n_overlap")))
    return (docs.select(F.col(id_col).alias("id"))
            .join(overlap, "id", "left")
            .select("id",
                    F.coalesce("n_overlap", F.lit(0)).alias("n_overlap")))


def _hh(df: DataFrame) -> DataFrame:
    """shuffle_hash join hint, disabled by SPARK_GRAFT_NO_JOIN_HINTS=1
    so scale_probe can A/B the hinted plan against Spark's default
    sort-merge choice on the same code path (r10's minhash verify-join
    fix was measured exactly this way: 107 s -> 40 s at x100)."""
    import os
    if os.environ.get("SPARK_GRAFT_NO_JOIN_HINTS") == "1":
        return df
    return df.hint("shuffle_hash")


def cross_doc_ngram_dup(docs: DataFrame, *,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        n: int = 3,
                        min_docs: int = 2,
                        grams: DataFrame | None = None) -> DataFrame:
    """Per-document count of DISTINCT word n-grams that also appear in
    at least (min_docs - 1) OTHER documents -- the n-gram-hash
    approximation of exact-substring training-data dedup (the
    suffix-array method of Lee et al., "Deduplicating Training Data
    Makes Language Models Better", re-expressed as keyed aggregations;
    practical pipelines filter or down-weight docs with a high
    duplicated-span fraction). Returns (id, n_dup_grams); 0 = no span
    shared with any other document.

    Plan shape: distinct (id, gram-hash) pairs -> one gram-keyed count
    (n_docs per gram) -> join back -> one doc-keyed count. Never
    all-pairs: cost is |distinct grams|, and both aggregations combine
    map-side. At 100 TB the gram-frequency relation is the only
    corpus-scale intermediate; it shards cleanly on the hash key.
    `grams` accepts a pre-tokenized distinct (id, gh) relation (the
    one-pass-tokenize contract -- see benchmark_decontaminate)."""
    g = grams if grams is not None \
        else _gram_hashes(docs, id_col, text_col, n)
    # Round 11, found by the §6c stage cuts then A/B-measured: the
    # original freq-aggregate + collision-join shape EXECUTED the
    # corpus-grain g subtree twice (Spark does not reuse the distinct
    # exchange across the aggregate and join branches; +15-20 s of
    # the x100 chain, insensitive to join hints and to a
    # subtraction rewrite that still read g twice). A count window
    # over gh attaches each gram's doc-frequency in ONE scan of g:
    # one gh exchange, then the doc-grain count combines map-side.
    # x100 A/B: window 19.7 s vs two-scan 29.7 s warm (pinning g via
    # localCheckpoint ties the window, 18.8 s, but costs executor
    # storage for a corpus-grain relation -- the window shape needs
    # none and handles any min_docs).
    w = Window.partitionBy("gh")
    dup = (g.withColumn("n_docs", F.count(F.lit(1)).over(w))
            .filter(F.col("n_docs") >= min_docs)
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_dup_grams")))
    return (docs.select(F.col(id_col).alias("id"))
            .join(dup, "id", "left")
            .select("id", F.coalesce("n_dup_grams", F.lit(0))
                            .alias("n_dup_grams")))


def pack_sequences(docs: DataFrame, *,
                   id_col: str = "doc_id",
                   strata_col: str = "source",
                   tokens: Column | None = None,
                   budget: int = 200) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out in
    deterministic (stratum, id) order and each is assigned the training
    sequence its FIRST token lands in (seq_id = exclusive-cumulative
    token count // budget). This is the streaming packing used to build
    fixed-length LM batches; docs spanning a boundary continue into the
    next sequence, which the seq of the following doc reflects.

    Returns (stratum, id, n_tokens, seq_id). One window per stratum --
    a single hash-partitioned sort, no global ordering.
    """
    if tokens is None:
        tokens = TX.token_count_ws("text")
    # null text -> 0 tokens: the doc occupies no budget but keeps its
    # slot in the stream (a null would poison the running sum)
    tokens = F.coalesce(tokens.cast("long"), F.lit(0))
    w = Window.partitionBy(strata_col).orderBy(id_col)
    start = F.sum(tokens).over(w) - tokens  # exclusive running total
    return docs.select(F.col(strata_col).alias("stratum"),
                       F.col(id_col).alias("id"),
                       tokens.alias("n_tokens"),
                       F.floor(start / budget).alias("seq_id"))


def chunk_documents(docs: DataFrame, *,
                    id_col: str = "doc_id",
                    text_col: str = "text",
                    size: int = 64,
                    overlap: int = 16) -> DataFrame:
    """Split documents into overlapping token-window chunks (the
    context-window prep step for RAG indexing / long-doc training):
    chunk i covers words [i*step, i*step + size) with step =
    size - overlap, so consecutive chunks share `overlap` words and
    every word lands in at least one chunk.

    Pure array expressions with the fan-out INSIDE the row (sequence ->
    transform -> explode), so the operator is map-only: no shuffle, and
    chunk rows inherit the input partitioning. Null-text docs are
    dropped explicitly (they would otherwise emit one degenerate chunk
    via greatest(NULL, 1)).

    Returns (id, chunk_idx, n_tokens, chunk_text).
    """
    if overlap >= size:
        raise ValueError(f"overlap {overlap} must be < size {size}")
    docs = docs.filter(F.col(text_col).isNotNull())
    step = size - overlap
    ws = TX.words(text_col)
    n = F.size(ws)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)).cast("double") / step), F.lit(1)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.least(F.lit(size), n - i * step).alias("n_tokens"),
            F.concat_ws(" ", F.slice(ws, i * step + 1, size))
             .alias("chunk_text")))
    c = F.col("c")
    return (docs.select(F.col(id_col).alias("id"),
                        F.explode(chunks).alias("c"))
            .select("id", c.getField("chunk_idx").alias("chunk_idx"),
                    c.getField("n_tokens").alias("n_tokens"),
                    c.getField("chunk_text").alias("chunk_text")))


def pack_manifest(packed: DataFrame) -> DataFrame:
    """Collapse pack_sequences output into the per-sequence manifest a
    training data loader consumes: (stratum, seq_id, docs = id-ordered
    [(id, n_tokens)...], n_docs, total_tokens). One keyed aggregation;
    the collect_list is bounded by budget/min_doc_tokens docs per
    sequence, not corpus-scale. A doc spanning a boundary is listed in
    the sequence its first token lands in (pack_sequences contract), so
    consecutive manifests overlap by at most one doc."""
    return (packed.groupBy("stratum", "seq_id")
            .agg(F.sort_array(F.collect_list(
                     F.struct("id", "n_tokens"))).alias("docs"),
                 F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("total_tokens")))


def mix_corpus(docs: DataFrame, shares: dict[str, float], *,
               id_col: str = "doc_id",
               strata_col: str = "source",
               tokens: Column | None = None,
               budget_tokens: int | None = None) -> DataFrame:
    """Token-weighted corpus mixing: downsample each stratum so the kept
    token mass approaches `shares` (stratum -> target fraction of the
    total token budget). The keep rate for stratum s is
    min(1, shares[s] * budget / available_tokens_s) -- strata cannot be
    upsampled, mirroring the standard mixture-weights step.

    budget_tokens defaults to the corpus total, i.e. shares express the
    desired post-mix composition of (at most) the whole corpus.

    Plan shape: one aggregation for per-stratum token totals (a
    |strata|-row relation, broadcast into the corpus scan) + the same
    map-only deterministic hash filter as hash_sample, at ppm
    resolution. Docs, not tokens, are the sampling unit, so realized
    mass tracks the target within one doc's tokens per stratum.

    Returns kept docs as (stratum, id, n_tokens, keep_ppm).
    """
    if tokens is None:
        tokens = TX.token_count_ws("text")
    tokens = tokens.cast("long")
    base = docs.select(F.col(strata_col).alias("stratum"),
                       F.col(id_col).alias("id"),
                       tokens.alias("n_tokens"))
    totals = base.groupBy("stratum").agg(F.sum("n_tokens").alias("avail"))
    if budget_tokens is None:
        # corpus total as a lazy 1-row relation (cross join), not a
        # driver-side collect -- keeps the whole operator one plan.
        # Derived from the |strata|-row totals (sum of per-stratum
        # sums == corpus sum exactly), NOT from another full corpus
        # aggregation -- that second pass re-tokenized the whole
        # corpus for one number
        budget = F.col("__budget").cast("double")
        totals = totals.crossJoin(
            totals.agg(F.coalesce(F.sum("avail"), F.lit(0))
                       .alias("__budget")))
    else:
        budget = F.lit(float(budget_tokens))
    share_df = totals.sparkSession.createDataFrame(
        list(shares.items()), "stratum string, share double")
    rates = (totals.join(share_df, "stratum")
             .select("stratum",
                     F.least(
                         F.lit(1_000_000),
                         F.floor(budget
                                 * F.col("share") * 1_000_000
                                 / F.col("avail")).cast("long"))
                     .alias("keep_ppm")))
    key = F.concat_ws(":", F.col("stratum"), F.col("id").cast("string"))
    bucket = TX.portable_hash32(key) % 1_000_000
    return (base.join(F.broadcast(rates), "stratum")
            .filter(bucket < F.col("keep_ppm"))
            .select("stratum", "id", "n_tokens", "keep_ppm"))


def hash_split(docs: DataFrame, fracs: dict[str, float], *,
               id_col: str = "doc_id",
               strata_col: str = "source") -> DataFrame:
    """Deterministic train/val/test split: each doc's md5 bucket
    (0..999999) falls into one contiguous range per split, sized by
    `fracs` (must sum to ~1). Splits are disjoint and exhaustive BY
    CONSTRUCTION (range partition of the bucket space), stable under
    re-runs/repartitioning/appends, and stratified the same way
    hash_sample is (the stratum feeds the hash key, decorrelating
    buckets across strata). Map-only: adds a `split` column.
    """
    total = sum(fracs.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fracs must sum to 1, got {total}")
    key = F.concat_ws(":", F.col(strata_col),
                      F.col(id_col).cast("string"))
    bucket = TX.portable_hash32(key) % 1_000_000
    expr = None
    hi = 0
    items = list(fracs.items())
    for name, frac in items[:-1]:
        hi += int(round(frac * 1_000_000))
        cond = bucket < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return docs.withColumn("split", expr)


def quality_percentile_filter(docs: DataFrame, *,
                              keep_frac: float = 0.5,
                              id_col: str = "doc_id",
                              strata_col: str = "source",
                              text_col: str = "text") -> DataFrame:
    """Keep each stratum's top `keep_frac` fraction by quality score --
    the adaptive alternative to a fixed threshold (a fixed cut keeps
    nothing from weak sources and everything from strong ones; a
    per-stratum percentile keeps the best of EACH). Thresholds come
    from one percentile_approx aggregation over strata (a |strata|-row
    relation, broadcast back); the filter itself is then map-side.

    Returns (stratum, id, quality, thr) for kept docs.
    """
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac {keep_frac} must be in (0, 1]")
    scored = docs.select(F.col(strata_col).alias("stratum"),
                         F.col(id_col).alias("id"),
                         TX.quality_score(text_col).alias("quality"))
    thr = scored.groupBy("stratum").agg(
        F.percentile_approx("quality", 1.0 - keep_frac).alias("thr"))
    return (scored.join(F.broadcast(thr), "stratum")
            .filter(F.col("quality") >= F.col("thr")))


def shuffle_corpus(docs: DataFrame, *,
                   id_col: str = "doc_id",
                   seed: int = 0) -> DataFrame:
    """Deterministic epoch shuffle: global training order =
    md5(seed:id), realized as repartitionByRange + in-partition sort on
    the key (a real distributed sort, not a single-partition window or
    an orderBy the next operator would destroy). Reading partitions in
    index order yields the full shuffled sequence; a new seed is a new
    epoch permutation, and the same seed reproduces the same order on
    any cluster/partitioning -- rand()-based shuffles are neither
    resumable nor repartition-stable. Returns the input columns +
    shuffle_key."""
    key = TX.portable_hash32(
        F.concat_ws(":", F.lit(str(seed)),
                    F.col(id_col).cast("string")))
    n = docs.sparkSession.sparkContext.defaultParallelism
    return (docs.withColumn("shuffle_key", key)
            .repartitionByRange(n, "shuffle_key", id_col)
            .sortWithinPartitions("shuffle_key", id_col))


def write_training_shards(docs: DataFrame, path: str, *,
                          id_col: str = "doc_id",
                          seed: int = 0,
                          shards_per_part: int | None = None) -> None:
    """Materialize the corpus in deterministic training order:
    shuffle_corpus layout written to parquet, so a reader consuming
    files in name order (and rows in file order) replays exactly the
    epoch-`seed` permutation. Range partitioning makes shard sizes
    even regardless of source skew; re-running with the same seed is
    byte-stable, so a resumed training job sees the same stream."""
    shuffled = shuffle_corpus(docs, id_col=id_col, seed=seed)
    if shards_per_part is not None:
        shuffled = shuffled.repartitionByRange(
            shards_per_part, "shuffle_key", id_col) \
            .sortWithinPartitions("shuffle_key", id_col)
    shuffled.write.mode("overwrite").parquet(path)


def hash_sample(docs: DataFrame, *,
                id_col: str = "doc_id",
                strata_col: str = "source",
                pct: int = 20) -> DataFrame:
    """Deterministic stratified sampling: keep a doc iff
    portable_hash32(stratum ':' id) % 100 < pct. Map-only (no shuffle,
    no RNG state), stable under re-runs, repartitioning, and incremental
    appends -- the property `TABLESAMPLE`/`rand()` cannot give a
    resumable 100 TB pipeline. Hashing the stratum into the key
    decorrelates buckets across strata so each stratum independently
    keeps ~pct%.

    Returns (stratum, id, bucket) for kept docs.
    """
    key = F.concat_ws(":", F.col(strata_col),
                      F.col(id_col).cast("string"))
    bucket = TX.portable_hash32(key) % 100
    return (docs.select(F.col(strata_col).alias("stratum"),
                        F.col(id_col).alias("id"),
                        bucket.alias("bucket"))
            .filter(F.col("bucket") < pct))


def _bag_gram_buckets(df: DataFrame, id_col: str, text_col: str,
                      n: int, buckets: int) -> DataFrame:
    """(id, bucket): hashed word n-grams WITH multiplicity (bag
    semantics -- DSIR models n-gram frequency, unlike the distinct-set
    grams decontamination uses), feature-hashed into `buckets`."""
    return (TX.exploded_word_ngrams(
                _spread(df.select(F.col(id_col).alias("id"), text_col),
                        "id"), text_col, n)
            .select("id",
                    (TX.portable_hash32(F.col("g")) % buckets)
                    .alias("bucket")))


def dsir_logratio_table(raw: DataFrame, target: DataFrame, *,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 3, buckets: int = 4096,
                        raw_buckets: DataFrame | None = None,
                        target_buckets: DataFrame | None = None) -> DataFrame:
    """DSIR importance-weight model (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): add-one-smoothed
    hashed bag-of-ngram distributions for the target and raw corpora,
    reduced to one bounded table (bucket, lr_micro) where

        lr_micro = round(1e6 * ln( p_target[b] / p_raw[b] ))
                 = round(1e6 * ln( (ct+1)(Traw+B) / ((cr+1)(Ttgt+B)) ))

    Integer MICRO-log-ratios are the repo's determinism convention:
    per-doc scores become exact integer sums -- partition-order-free in
    Spark and bit-identical in an oracle engine (a double log-prob sum
    would drift in the last ulp with shuffle order). One ln per bucket
    keeps libm exposure to a single rounded call.

    Scale: both count relations are (bucket)-keyed aggregations with
    map-side combine; the output is <= `buckets` rows by construction
    -- a broadcast table no matter the corpus size (the totals window
    below runs over that bounded table, not the corpus).

    `raw_buckets` / `target_buckets` accept pre-tokenized (id, bucket)
    BAG relations (what _bag_gram_buckets emits -- multiplicity kept)
    so a multi-part pipeline tokenizes once (SCALE.md's one-pass-
    tokenize contract). When the raw bag is built HERE, it is pinned
    and stashed on the returned table so a later dsir_scores(raw, lr)
    over the SAME raw DataFrame object reuses it instead of
    re-tokenizing the corpus (VERDICT r11 ask #3: the scoring
    tokenize was 13 of 30.6 s at the x100 probe; the model marginal
    is ~2 s)."""
    stash = None
    if raw_buckets is None:
        raw_buckets = (_bag_gram_buckets(raw, id_col, text_col, n,
                                         buckets)
                       .localCheckpoint(eager=False))
        stash = (raw, raw_buckets)
    if target_buckets is None:
        target_buckets = _bag_gram_buckets(target, id_col, text_col, n,
                                           buckets)
    cr = raw_buckets.groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    ct = (target_buckets.groupBy("bucket")
          .agg(F.count(F.lit(1)).alias("ct")))
    w = Window.partitionBy()
    both = (cr.join(ct, "bucket", "full")
              .select("bucket",
                      F.coalesce("cr", F.lit(0)).alias("cr"),
                      F.coalesce("ct", F.lit(0)).alias("ct"))
              .withColumn("t_raw", F.sum("cr").over(w))
              .withColumn("t_tgt", F.sum("ct").over(w)))
    num = (F.col("ct") + 1.0) * (F.col("t_raw") + F.lit(float(buckets)))
    den = (F.col("cr") + 1.0) * (F.col("t_tgt") + F.lit(float(buckets)))
    out = both.select(
        "bucket", F.round(F.log(num / den) * 1e6).cast("long")
                   .alias("lr_micro"))
    if stash is not None:
        # (raw DataFrame object, its pinned bag) -- dsir_scores reuses
        # the bag when asked to score the corpus the model was built
        # on (identity check, so scoring a DIFFERENT relation never
        # silently inherits the wrong tokenization)
        out._msc_raw_bag = stash
    return out


def dsir_scores(docs: DataFrame, lr: DataFrame, *,
                id_col: str = "doc_id", text_col: str = "text",
                n: int = 3, buckets: int = 4096,
                doc_buckets: DataFrame | None = None) -> DataFrame:
    """(id, dsir_micro): per-document DSIR log importance weight in
    micro-nats -- the exact integer sum of lr_micro over the doc's bag
    of hashed n-grams. Higher = more target-like. The lr table is
    bounded (<= buckets rows) so the join broadcasts; scoring is one
    doc-keyed aggregation. Every doc emits >= 1 gram (word_ngrams
    falls back to the whole text), so the output covers `docs`
    exactly. `doc_buckets` accepts the pre-tokenized (id, bucket) bag
    relation (one-pass-tokenize contract); when scoring the SAME
    DataFrame object the lr model was built on, the model's stashed
    pinned bag is reused automatically -- no second corpus tokenize
    (VERDICT r11 ask #3)."""
    if doc_buckets is None:
        stash = getattr(lr, "_msc_raw_bag", None)
        if stash is not None and stash[0] is docs:
            doc_buckets = stash[1]
    g = doc_buckets if doc_buckets is not None \
        else _bag_gram_buckets(docs, id_col, text_col, n, buckets)
    return (g.join(F.broadcast(lr), "bucket", "left")
             .groupBy("id")
             .agg(F.sum(F.coalesce("lr_micro", F.lit(0)))
                   .alias("dsir_micro")))


def dsir_resample(docs: DataFrame, target: DataFrame, *, k: int,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3, buckets: int = 4096,
                  seed: str = "dsir") -> DataFrame:
    """Importance RESAMPLING, the second half of DSIR: draw k docs
    without replacement with probability proportional to their
    importance weight, via the Gumbel top-k trick -- key = log-weight
    + Gumbel(0,1) noise, take the k largest. The noise is derived from
    a hash of (seed, id), not an RNG: resumable and reproducible
    across runs/partitionings like hash_sample, and adding fresh seeds
    draws fresh samples. Returns (id, dsir_micro, key) for the k
    selected docs.

    The global top-k is a sort-limit (Spark runs it as per-partition
    top-k + a k-row merge, no full sort materialization).

    ONE-PASS TOKENIZE (VERDICT r11 ask #3): `docs` is tokenized
    exactly once -- the bag is pinned and the raw-model side derives
    from it by an anti-join on target ids (raw IS docs-minus-target,
    so its bag is a row-subset of the doc bag). Without this the
    chain tokenized the corpus twice (model + scoring), and the
    scoring tokenize alone was 13 of 30.6 s at the x100 probe. The
    pin is the registry's own pattern (compact post-explode columns;
    a 100 TB run would parquet-checkpoint the same relation)."""
    doc_bag = (_bag_gram_buckets(docs, id_col, text_col, n, buckets)
               .localCheckpoint(eager=False))
    tgt_ids = target.select(F.col(id_col).alias("id"))
    lr = dsir_logratio_table(
        None, target, id_col=id_col, text_col=text_col, n=n,
        buckets=buckets,
        raw_buckets=doc_bag.join(tgt_ids, "id", "left_anti"))
    scores = dsir_scores(docs, lr, id_col=id_col, text_col=text_col,
                         n=n, buckets=buckets, doc_buckets=doc_bag)
    u = (TX.portable_hash32(
            F.concat_ws(":", F.lit(seed), F.col("id").cast("string")))
         % 1_000_000 + 0.5) / 1e6
    gumbel = -F.log(-F.log(u))
    return (scores
            .withColumn("key", F.col("dsir_micro") / 1e6 + gumbel)
            .orderBy(F.col("key").desc(), F.col("id"))
            .limit(k))


def gopher_repetition_signals(docs: DataFrame, *,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              ns: tuple[int, ...] = (2, 3, 4)) -> DataFrame:
    """The Gopher repetition filters (Rae et al. 2021, App. A) beyond
    the map-only dup_ngram_ratio already in text_analysis:

    - dup_line_frac:      (lines - distinct lines) / lines
    - dup_line_char_frac: characters attributable to line repetition
                          (occurrences beyond each line's first) /
                          total characters
    - top{n}gram_char_frac: characters covered by occurrences of the
                          single most frequent word n-gram / total
                          characters, for each n in `ns`

    Practical pipelines drop docs above thresholds (e.g. 0.3 / 0.2 /
    0.18-0.16). Computed as explode + (id, line|gram)-keyed counts --
    the scale-right shape: a mode-per-document via array lambdas would
    run O(grams^2) interpreted comparisons per row (SCALE.md §1), while
    keyed counts combine map-side and shuffle 8-byte hashes. Ties on
    the top gram break lexicographically; every fraction is 0 for
    empty/whitespace docs."""
    base = docs.select(F.col(id_col).alias("id"), F.col(text_col))
    tot = base.select(
        "id", F.greatest(F.length(text_col), F.lit(1)).alias("n_chars"))

    line_counts = (_spread(base, "id")
                   .select("id", F.explode(F.split(text_col, "\n"))
                            .alias("line"))
                   .filter(F.trim("line") != "")
                   .groupBy("id", "line")
                   .agg(F.count(F.lit(1)).alias("c")))
    lines = (line_counts.groupBy("id").agg(
        F.sum("c").alias("n_lines"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum((F.col("c") - 1) * F.length("line")).alias("dup_chars")))
    line_sig = (lines.join(tot, "id")
        .select("id",
                ((F.col("n_lines") - F.col("n_distinct"))
                 / F.col("n_lines")).alias("dup_line_frac"),
                (F.col("dup_chars") / F.col("n_chars"))
                 .alias("dup_line_char_frac")))

    gram_rows = None
    for n in ns:
        g = TX.exploded_word_ngrams(
            _spread(base, "id"), text_col, n,
            keep=("id", F.lit(n).alias("n")))
        gram_rows = g if gram_rows is None else gram_rows.unionByName(g)
    gcount = (gram_rows.groupBy("id", "n", "g")
                       .agg(F.count(F.lit(1)).alias("c")))
    w = Window.partitionBy("id", "n").orderBy(F.col("c").desc(), "g")
    top = (gcount.withColumn("rk", F.row_number().over(w))
                 .filter(F.col("rk") == 1)
                 .join(tot, "id")
                 .select("id", "n",
                         (F.col("c") * F.length("g") / F.col("n_chars"))
                          .alias("frac")))
    top_sig = top.groupBy("id").agg(*[
        F.max(F.when(F.col("n") == n, F.col("frac"))).alias(
            f"top{n}gram_char_frac") for n in ns])

    return (docs.select(F.col(id_col).alias("id"))
            .join(line_sig, "id", "left").join(top_sig, "id", "left")
            .select("id",
                    F.coalesce("dup_line_frac", F.lit(0.0))
                     .alias("dup_line_frac"),
                    F.coalesce("dup_line_char_frac", F.lit(0.0))
                     .alias("dup_line_char_frac"),
                    *[F.coalesce(f"top{n}gram_char_frac", F.lit(0.0))
                       .alias(f"top{n}gram_char_frac") for n in ns]))


def lm_bigram_tables(target: DataFrame, *,
                     id_col: str = "doc_id", text_col: str = "text",
                     buckets: int = 65536,
                     alpha: float = 0.1) -> tuple[DataFrame, DataFrame]:
    """Hashed word-bigram language model from a target corpus -- the
    CCNet recipe (Wenzek et al. 2020: score web text by the perplexity
    of an LM trained on trusted text) with the 5-gram KenLM swapped
    for an add-alpha bigram over feature-hashed words.

    Returns (bigrams, unigrams):
      bigrams:  (v, w, lp_micro)  lp_micro = round(1e6*ln p(w|v)) for
                OBSERVED bigrams, p(w|v) = (c(v,w)+a)/(c(v)+aB)
      unigrams: (v, fb_micro)     the same formula at c(v,w)=0 -- the
                fallback for unseen continuations of a seen context.

    Log-probs are rounded to integer micro-nats AT TABLE BUILD (one ln
    per observed bigram / context), so document scores are exact
    integer sums -- the DSIR determinism convention. The unigram table
    is bounded by `buckets`; the bigram table is bounded by observed
    pairs -- corpus-scale, so scoring JOINS on the hashed keys (keyed
    shuffle, map-side combinable counts) rather than assuming a
    broadcast."""
    def word_buckets(df):
        return (_spread(df.select(F.col(id_col).alias("id"), text_col),
                        "id")
                .select("id", F.posexplode(TX.words(text_col))
                         .alias("pos", "w"))
                .select("id", "pos",
                        (TX.portable_hash32("w") % buckets).alias("b")))

    toks = word_buckets(target)
    nxt = toks.select("id", (F.col("pos") + 1).alias("pos"),
                      F.col("b").alias("v"))
    big = (toks.join(nxt, ["id", "pos"])
               .groupBy("v", F.col("b").alias("w"))
               .agg(F.count(F.lit(1)).alias("cvw")))
    uni = big.groupBy("v").agg(F.sum("cvw").alias("cv"))
    ab = alpha * buckets
    bigrams = (big.join(uni, "v")
                  .select("v", "w",
                          F.round(F.log((F.col("cvw") + alpha)
                                        / (F.col("cv") + ab)) * 1e6)
                           .cast("long").alias("lp_micro")))
    unigrams = uni.select(
        "v", F.round(F.log(F.lit(alpha) / (F.col("cv") + ab)) * 1e6)
              .cast("long").alias("fb_micro"))
    return bigrams, unigrams


def lm_perplexity(docs: DataFrame, bigrams: DataFrame,
                  unigrams: DataFrame, *,
                  id_col: str = "doc_id", text_col: str = "text",
                  buckets: int = 65536,
                  alpha: float = 0.1) -> DataFrame:
    """(id, n_bigrams, lp_sum_micro, ppl): score each document under
    an lm_bigram_tables model. Unseen (context, word) falls back to
    the context's fb_micro; an UNSEEN CONTEXT scores the uniform prior
    ln(1/B) -- both precomputed integers, so lp_sum_micro is an exact
    order-free sum. ppl = exp(-mean log-prob) is derived from the
    integer sum in double (bit-identical everywhere). Lower ppl =
    more target-like; CCNet keeps the low-perplexity head/middle.
    Single-word docs have no bigram: n_bigrams=0 and NULL ppl."""
    prior_micro = __import__("math").floor(
        -__import__("math").log(buckets) * 1e6 + 0.5)
    toks = (_spread(docs.select(F.col(id_col).alias("id"), text_col),
                    "id")
            .select("id", F.posexplode(TX.words(text_col))
                     .alias("pos", "w"))
            .select("id", "pos",
                    (TX.portable_hash32("w") % buckets).alias("b")))
    pairs = toks.join(
        toks.select("id", (F.col("pos") + 1).alias("pos"),
                    F.col("b").alias("v")), ["id", "pos"])
    scored = (pairs
              .join(bigrams, [pairs.v == bigrams.v, pairs.b == bigrams.w],
                    "left")
              .drop(bigrams.v)
              .join(unigrams, pairs.v == unigrams.v, "left")
              .select("id", F.coalesce("lp_micro", "fb_micro",
                                       F.lit(int(prior_micro)))
                             .alias("lp")))
    agg = scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("lp").alias("lp_sum_micro"))
    return (docs.select(F.col(id_col).alias("id"))
            .join(agg, "id", "left")
            .select("id",
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    F.coalesce("lp_sum_micro", F.lit(0))
                     .alias("lp_sum_micro"),
                    F.when(F.col("n_bigrams") > 0,
                           F.exp(-F.col("lp_sum_micro") / 1e6
                                 / F.col("n_bigrams")))
                     .alias("ppl")))


# span-packed (doc, block) key: blocks-per-doc bounded by 2^20 (a
# 16M-word document at span 16 -- far past any real doc), so the key
# packs exactly and MIN() picks the earliest occurrence in (doc, block)
# order on any engine with plain integer arithmetic
_SPAN_PK_LIM = 1 << 20


def remove_duplicate_spans(docs: DataFrame, *,
                           id_col: str = "doc_id",
                           text_col: str = "text",
                           span_words: int = 16) -> DataFrame:
    """C4-style duplicate-span removal (Raffel et al. 2020 §2.2 dedup
    rule, word-window adaptation): split each document into consecutive
    `span_words`-word blocks, drop every block whose text occurs
    anywhere else in the corpus EXCEPT its single canonical occurrence
    (the minimum (doc, block) position), and reassemble the survivors.
    Unlike cross_doc_ngram_dup (which only SCORES duplication), this
    rewrites the text -- the boilerplate-stripping step itself.

    Returns (id, text, n_removed_spans, n_spans).

    Scale shape: one explode to block grain, ONE block-hash-keyed
    aggregation for (count, canonical), one keyed join back, one
    doc-keyed reassembly aggregation -- every shuffle is keyed on the
    block hash or the doc id, never all-pairs. Blocks travel as 8-byte
    md5-derived hashes (portable: the oracle reproduces the exact
    keep/drop decisions, collisions and all). Reassembly sorts the
    collected (block_idx, text) structs INSIDE the aggregate, so the
    output is partitioning-independent."""
    ws = TX.words(text_col)
    n_blocks = F.greatest(F.ceil(F.size(ws) / F.lit(span_words)),
                          F.lit(1)).cast("int")
    block_arr = F.transform(
        F.sequence(F.lit(0), n_blocks - 1),
        lambda b: F.concat_ws(" ", F.slice(ws, b * span_words + 1,
                                           span_words)))
    blocks = (_spread(docs, id_col)
              .select(F.col(id_col).alias("id"),
                      F.posexplode(block_arr).alias("b", "block"))
              .select("id", "b", "block",
                      TX.portable_hash32("block").alias("h"),
                      (F.col("id") * _SPAN_PK_LIM + F.col("b"))
                      .alias("pk")))
    # round 11 (the xdup §6c find applied here): aggregating blocks by
    # h and joining back EXECUTES the explode subtree twice -- Spark
    # does not reuse the exchange across the aggregate and join
    # branches -- and this relation carries the full block TEXT. The
    # count/min windows over h attach (cnt, winner) in ONE scan with
    # the same single h exchange the join needed anyway.
    wh = Window.partitionBy("h")
    marked = (blocks
              .withColumn("cnt", F.count(F.lit(1)).over(wh))
              .withColumn("winner", F.min("pk").over(wh))
              .withColumn("keep", (F.col("cnt") == 1)
                          | (F.col("pk") == F.col("winner"))))
    return (marked.groupBy("id")
            .agg(F.concat_ws(" ", F.transform(
                     F.sort_array(F.collect_list(
                         F.when(F.col("keep"),
                                F.struct(F.col("b").alias("b"),
                                         F.col("block").alias("block"))))),
                     lambda s: s["block"])).alias(text_col),
                 F.sum(F.when(~F.col("keep"), 1).otherwise(0))
                  .cast("long").alias("n_removed_spans"),
                 F.count(F.lit(1)).cast("long").alias("n_spans"))
            .withColumnRenamed("id", id_col))


def exact_substring_dup_extents(docs: DataFrame, *,
                                id_col: str = "doc_id",
                                text_col: str = "text",
                                min_tokens: int = 16) -> DataFrame:
    """Exact substring-duplication extents (the exact form of Lee et
    al. 2021's dedup rule, token grain): a duplicated substring of
    >= min_tokens tokens exists iff some min_tokens-gram (stride 1)
    occurs >= 2 times corpus-wide -- so every duplicated gram start
    marks [pos, pos+min_tokens) and per-doc overlapping marks merge
    into maximal extents. Returns (id, start_tok, end_tok) with
    end exclusive. Within-doc repeats count (self-plagiarism dedups
    too), unlike the n-gram-hash APPROXIMATION in cross_doc_ngram_dup
    which only scores cross-doc overlap.

    Shape: stride-1 gram explode -> ONE gram-hash-keyed count -> join
    back -> per-doc interval merge done ENTIRELY with window functions
    (running max of preceding extent ends -> new-interval flag ->
    cumulative interval id -> one keyed agg). No Python, no all-pairs;
    the dominant shuffle carries 8-byte gram hashes."""
    L = min_tokens
    ws = TX.words(text_col)
    n_grams = F.greatest(F.size(ws) - (L - 1), F.lit(1))
    grams = (_spread(docs, id_col)
             .select(F.col(id_col).alias("id"),
                     F.posexplode(F.transform(
                         F.sequence(F.lit(0), n_grams - 1),
                         lambda p: F.concat_ws(
                             " ", F.slice(ws, p + 1, L))))
                      .alias("pos", "gram"))
             .select("id", "pos", TX.portable_hash32("gram").alias("h")))
    # round 11 (§6c find): count window over h instead of
    # aggregate-then-self-join -- one scan of the stride-1 explode
    # (the heaviest relation here), same single h exchange
    marks = (grams.withColumn(
                 "cnt", F.count(F.lit(1)).over(Window.partitionBy("h")))
             .filter(F.col("cnt") >= 2)
             .select("id", "pos", (F.col("pos") + L).alias("end")))
    w = Window.partitionBy("id").orderBy("pos")
    run_end = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    new_iv = F.when(run_end.isNull() | (F.col("pos") > run_end), 1) \
              .otherwise(0)
    iv = (marks.withColumn("iv", F.sum(new_iv).over(
              w.rowsBetween(Window.unboundedPreceding, 0))))
    return (iv.groupBy("id", "iv")
            .agg(F.min("pos").alias("start_tok"),
                 F.max("end").alias("end_tok"))
            .select(F.col("id").alias(id_col), "start_tok", "end_tok"))


def strip_duplicated_substrings(docs: DataFrame, *,
                                id_col: str = "doc_id",
                                text_col: str = "text",
                                min_tokens: int = 16) -> DataFrame:
    """Remove EVERY occurrence of corpus-duplicated >= min_tokens-token
    substrings (the conservative all-copies variant; the keep-one-
    canonical policy lives in remove_duplicate_spans at block grain).
    Returns (id, text, n_removed_tokens, n_tokens).

    Covered token positions come from exploding each extent (output
    volume = duplicated tokens, not grams), tokens anti-join-drop on
    (id, pos), and the survivors reassemble in order inside a doc-keyed
    aggregate, exactly like remove_duplicate_spans."""
    extents = exact_substring_dup_extents(
        docs, id_col=id_col, text_col=text_col, min_tokens=min_tokens)
    covered = extents.select(
        F.col(id_col).alias("id"),
        F.explode(F.sequence(F.col("start_tok"),
                             F.col("end_tok") - 1)).alias("pos"))
    toks = (docs.select(F.col(id_col).alias("id"),
                        F.posexplode(TX.words(text_col))
                         .alias("pos", "tok")))
    kept = toks.join(covered, ["id", "pos"], "left_anti")
    n_tok = docs.select(F.col(id_col).alias("id"),
                        F.size(TX.words(text_col)).alias("n_tokens"))
    return (kept.groupBy("id")
            .agg(F.concat_ws(" ", F.transform(
                     F.sort_array(F.collect_list(
                         F.struct(F.col("pos"), F.col("tok")))),
                     lambda s: s["tok"])).alias(text_col),
                 F.count(F.lit(1)).alias("n_kept"))
            .join(n_tok, "id", "right")
            .select(F.col("id").alias(id_col),
                    F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
                    (F.col("n_tokens")
                     - F.coalesce("n_kept", F.lit(0)))
                    .cast("long").alias("n_removed_tokens"),
                    F.col("n_tokens").cast("long")))


def fuzzy_decontaminate(docs: DataFrame, bench: DataFrame, *,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        threshold: float = 0.5,
                        bucket_cap: int | None = 64) -> DataFrame:
    """MinHash-LSH decontamination: flag training docs that are NEAR
    duplicates of benchmark items -- paraphrased/reformatted eval
    leakage that exact n-gram overlap (benchmark_decontaminate)
    under-counts. (id, bench_id, jaccard, containment), one row per
    contaminated (train, bench) pair passing the exact-Jaccard verify.

    Same scale shape as dedup.minhash_dedup, but the band join is
    train x bench instead of a self-join: candidates are bounded by
    cross-side band collisions (the benchmark side is an eval suite --
    bounded by contract), never |docs| x |bench|. And the same scale
    armor: byte-identical texts on EACH side collapse to one
    representative before banding (a million-copy boilerplate family
    is one band row), the corpus-side buckets are bounded by
    `bucket_cap` (observe-metric accounted -- no silent recall loss),
    and member-level pairs are reconstructed exactly afterwards
    (identical text => identical shingle set => identical verify
    values). Containment is the decisive signal here: a short
    benchmark item quoted inside a long training doc scores low
    Jaccard but containment ~1."""
    from . import dedup

    t_reps, t_members = dedup.collapse_exact_texts(docs, id_col, text_col)
    b_reps, b_members = dedup.collapse_exact_texts(bench, id_col, text_col)
    # fused per-side profile: shingle set + minhash mins in ONE
    # doc-keyed aggregation per side, bands via flat arithmetic --
    # the same fused plan as minhash_dedup (was the unfused distinct
    # -> signature -> band chain: 3 extra shuffles per side)
    t_prof = dedup.fused_doc_profile(t_reps)
    b_prof = dedup.fused_doc_profile(b_reps)
    t_bands = dedup.fused_band_rows(t_prof)
    b_bands = dedup.fused_band_rows(b_prof)
    if bucket_cap is not None:
        # the corpus side is the unbounded one; the bench side is an
        # eval suite, bounded by contract
        t_bands = dedup.cap_band_buckets(t_bands, bucket_cap)
    cands = (t_bands.join(
                 b_bands.select(F.col("id").alias("bench_id"),
                                "band", "band_sig"),
                 ["band", "band_sig"])
             .select(F.col("id").alias("id_a"),
                     F.col("bench_id").alias("id_b"))
             .distinct())
    # spread the byte-tiny pairs before the array_intersect verify --
    # AQE would otherwise coalesce them to one task (dedup.
    # jaccard_verify_sets documents the measured trap)
    cands = dedup._spread(cands, "id_a")
    # Four pins, ONE concurrent phase (r16, guide §2.6 -- they share
    # no dependency):
    # - t_members / b_members: the (id, rep_id) maps before fan-out
    #   reuse -- every later reference would otherwise re-run the
    #   corpus-wide collapse aggregation (same measured trap as
    #   minhash_dedup; two longs per doc, the cheapest
    #   materialization);
    # - cands (round 10, same stage-cut finding as minhash_dedup): the
    #   verify join reads hs sets for CANDIDATE docs only -- pin the
    #   bounded pair list so the id list and the join input don't
    #   re-run the band chain;
    # - the bench-side (id, hs) set table: an eval suite, bounded by
    #   contract, so pin-safe -- without it the verify join
    #   re-collapses and re-profiles the bench corpus per execution.
    t_members, b_members, cands, b_sets_pinned = dedup._pin_concurrent(
        t_members, b_members, cands,
        b_prof.select(F.col("id").alias("id_b"),
                      F.col("hs").alias("hs_b")))
    # shuffle_hash on the bounded id list: a sort-merge semi would
    # sort t_reps WITH its full text column -- the one genuinely fat
    # sort in this chain at corpus scale; hashing the tiny id side
    # streams the text rows through unsorted
    # eager-pin the candidate-restricted set table (round 15): without
    # the pin the verify join's lazy lineage re-ran the CORPUS-WIDE
    # text collapse on every execution -- minhash_dedup has pinned its
    # cand_sets since the r10 stage cut, fuzzy just never got the same
    # fix. The pinned relation is |candidate reps| rows of (id, hs),
    # bounded by cross-side band collisions, the identical contract as
    # minhash_dedup's pin.
    t_cand_sets = dedup.fused_doc_profile(
        t_reps.join(_hh(cands.select(F.col("id_a").alias("id"))
                        .distinct()),
                    "id", "semi")).select("id", "hs") \
        .localCheckpoint(eager=True)
    # per-side set tables (NOT a union: train and bench id spaces may
    # overlap numerically -- they are different tables). The bench
    # side (pinned in the concurrent phase above) needs no candidate
    # restriction: it is an eval suite, bounded by contract.
    # shuffle_hash on BOTH hs-carrying sides (VERDICT r10 ask #4, the
    # symmetry of dedup.jaccard_verify_sets' r10 fix): sort-merge
    # would sort the pair-side intermediate already carrying the
    # ~300-int hs_a arrays -- hashing the doc-grain set sides streams
    # the fat side through instead (minhash x100 verify 107s -> 40s
    # was this same cut; A/B for this join in SCALE.md)
    t_sets = _hh(t_cand_sets.select(F.col("id").alias("id_a"),
                                    F.col("hs").alias("hs_a")))
    b_sets = _hh(b_sets_pinned)
    n_inter = F.size(F.array_intersect("hs_a", "hs_b"))
    jac = (n_inter.cast("double")
           / (F.size("hs_a") + F.size("hs_b") - n_inter))
    cont = (n_inter.cast("double")
            / F.least(F.size("hs_a"), F.size("hs_b")))
    rep_pairs = (cands.join(t_sets, "id_a").join(b_sets, "id_b")
                 .withColumn("jaccard", F.round(jac, 6))
                 .withColumn("containment", F.round(cont, 6))
                 .filter((F.col("jaccard") >= threshold)
                         | (F.col("containment") >= threshold))
                 .select("id_a", "id_b", "jaccard", "containment"))
    # expand both sides back to member grain: each rep-level hit fans
    # out to every (train member, bench member) pair with the rep's
    # exact verify values; no least/greatest reorder here -- the two
    # sides are different id spaces, the pair is (train, bench) typed
    # member maps are doc-grain two-long rows; hash-joining them
    # avoids sorting doc-grain relations against the tiny verified
    # pair list (rep_pairs post-filter)
    return (rep_pairs
            .join(_hh(t_members.select(F.col("rep_id").alias("id_a"),
                                       F.col("id").alias("__m_id"))),
                  "id_a")
            .join(_hh(b_members.select(F.col("rep_id").alias("id_b"),
                                       F.col("id").alias("__m_bench"))),
                  "id_b")
            .select(F.col("__m_id").alias("id"),
                    F.col("__m_bench").alias("bench_id"),
                    "jaccard", "containment"))


def temperature_weights(docs: DataFrame, *, alpha: float = 0.7,
                        stratum_col: str = "source",
                        text_col: str = "text") -> dict[str, float]:
    """Temperature-scaled mixture shares from observed stratum sizes:
    w_s ∝ (tokens_s)^alpha, normalized to sum 1 -- the multilingual /
    multi-source sampling recipe (alpha=1 keeps natural proportions,
    alpha=0 is uniform, 0<alpha<1 up-weights low-resource strata).
    One bounded aggregation (|strata| rows, the mix_corpus rate-table
    contract) collected to feed mix_corpus's share dict."""
    from ..functions.text import token_count_ws
    rows = (docs.groupBy(stratum_col)
                .agg(F.sum(token_count_ws(text_col)).alias("n"))
                .collect())
    scaled = {r[stratum_col]: float(r["n"]) ** alpha for r in rows}
    total = sum(scaled.values()) or 1.0
    return {k: v / total for k, v in sorted(scaled.items())}
