"""Text-analysis primitives for the LLM-data-pipeline layer (SURVEY §7
M6). All JVM-side Column expressions (no Python UDFs), built on
cross-engine-portable building blocks:

- portable_hash32: first 8 hex chars of md5 as uint32 -- identical in
  Spark (`conv(substr(md5(x),1,8),16,10)`) and DuckDB
  (`('0x'||substr(md5(x),1,8))::BIGINT`), so every hash-derived
  operator (minhash, simhash, fingerprints) is oracle-checkable.
- shingling via sequence+substring / slice -- expressible in both
  engines with identical semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish tokenizer: letter runs, digit runs, or single non-alnum marks
BPE_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"

DEFAULT_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def portable_hash32(col: Column | str) -> Column:
    """md5-derived 32-bit unsigned hash as long. Deterministic and
    identical across engines (md5 is standardized), unlike xxhash64/
    murmur which differ per implementation."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 8), 16, 10).cast("long")


def words(col: Column | str) -> Column:
    """Whitespace tokenization (fixtures are single-space separated)."""
    return F.split(F.trim(_c(col)), " ")


def token_count_ws(col: Column | str) -> Column:
    return F.size(words(col))


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish token count via regex classes -- the cheap proxy used to
    budget LLM training tokens without a real tokenizer."""
    return F.regexp_count(_c(col), F.lit(BPE_REGEX))


def stopword_ratio(col: Column | str,
                   stopwords: Sequence[str] = DEFAULT_STOPWORDS) -> Column:
    ws = words(col)
    hits = F.size(F.filter(ws, lambda w: w.isin(*stopwords)))
    return hits.cast("double") / F.size(ws)


def avg_word_len(col: Column | str) -> Column:
    ws = words(col)
    total = F.aggregate(ws, F.lit(0),
                        lambda acc, w: acc + F.length(w))
    return total.cast("double") / F.size(ws)


def char_shingles(col: Column | str, k: int = 8) -> Column:
    """Character k-shingles: array of substr(text, p, k) for p in
    1..len-k+1 (whole text when shorter). The standard near-dup
    shingling unit (minhash/simhash input)."""
    c = _c(col)
    n = F.greatest(F.length(c) - (k - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), n),
                       lambda p: F.substring(c, p, F.lit(k)))


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Word n-grams joined with spaces (whole text when shorter)."""
    ws = words(col)
    cnt = F.greatest(F.size(ws) - (n - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), cnt),
                       lambda i: F.concat_ws(" ", F.slice(ws, i, n)))


def exploded_word_ngrams(df, text_col: Column | str, n: int = 3,
                         alias: str = "g",
                         keep: Sequence[Column | str] = ("id",)):
    """One row per word n-gram: the flat-codegen equivalent of
    F.explode(word_ngrams(col, n)) (r15, guide §1.2 per-task work).
    Building the gram ARRAY first runs the transform() concat lambda
    interpreted per element -- the same trap hashed_shingle_set
    documents for char shingles -- so gram POSITIONS are exploded
    first and the slice+concat_ws runs post-explode inside whole-stage
    codegen (measured: the dedup_simhash_ngram gram relation 4.5 s ->
    1.1 s isolated at sf0.1, identical distinct-gram set). Row
    multiset and per-doc order are identical to the array form:
    sequence(1, cnt) enumerates the same positions transform() maps
    over, and both emit >= 1 row per doc (cnt is floored at 1).

    `keep` columns and `alias` may not collide with each other or the
    reserved internals (__ws/__cnt/__i): a keep column named __ws or
    __cnt would silently drop, and a keep column matching `alias`
    would duplicate in the output (r15 ADVICE guard -- this is a
    shared primitive, fail loudly instead)."""
    _RESERVED = {"__ws", "__cnt", "__i"}
    keep_names = [c for c in keep if isinstance(c, str)]
    clashes = ({n for n in (*keep_names, alias) if n in _RESERVED}
               | ({alias} if alias in keep_names else set()))
    if clashes or len(set(keep_names)) != len(keep_names):
        raise ValueError(
            f"exploded_word_ngrams: keep/alias collide with reserved "
            f"names or each other: {sorted(clashes) or keep_names}")
    ws = words(text_col)
    cnt = F.greatest(F.size(ws) - (n - 1), F.lit(1))
    first = df.select(*keep, ws.alias("__ws"), cnt.alias("__cnt"))
    names = [c for c in first.columns if c not in ("__ws", "__cnt")]
    return (first
            .select(*names, "__ws",
                    F.explode(F.sequence(F.lit(1), F.col("__cnt")))
                     .alias("__i"))
            .select(*names,
                    F.concat_ws(" ", F.slice(F.col("__ws"),
                                             F.col("__i"), n))
                     .alias(alias)))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized text."""
    return F.md5(F.regexp_replace(F.trim(_c(col)), r"\s+", " "))


def quality_score(col: Column | str, scale: int = 6) -> Column:
    """Composite document quality in [0,1]: 0.4 * length signal
    (tokens/100 capped) + 0.3 * (1 - stopword ratio) + 0.3 * avg word
    length signal (awl/10 capped). The shared definition behind
    text_analysis, pipeline_clean_corpus, and the streaming corpus
    ingest's quality gate."""
    stop = stopword_ratio(col)
    awl = avg_word_len(col)
    n = token_count_ws(col)
    return F.round(
        F.lit(0.4) * F.least(n.cast("double") / 100.0, F.lit(1.0))
        + F.lit(0.3) * (1.0 - stop)
        + F.lit(0.3) * F.least(awl / 10.0, F.lit(1.0)), scale)


def dup_ngram_ratio(col: Column | str, n: int = 3) -> Column:
    """Within-document repetition signal (Gopher-style quality rule):
    1 - distinct_ngrams/total_ngrams. Boilerplate and looped text score
    high; clean prose scores near 0. Pure array expressions, map-only.
    The total gram count is derived from the token count (greatest(
    tokens-n+1, 1)) so the gram array is built ONCE, for the distinct
    side only -- measured 2x on the text_analysis scan."""
    grams = word_ngrams(col, n)
    total = F.greatest(F.size(words(col)) - (n - 1), F.lit(1))
    return (1.0 - F.size(F.array_distinct(grams)).cast("double")
            / total.cast("double"))


def canonical_text(col: Column | str) -> Column:
    """Dedup canonicalization: lowercase, punctuation -> space,
    whitespace collapsed, trimmed. The standard pre-fingerprint
    normalization (C4/CCNet-style pipelines hash THIS, not the raw
    text, so case/punctuation variants of one document collide).
    Flat codegen expressions only."""
    c = F.lower(_c(col))
    c = F.regexp_replace(c, "[^a-z0-9]+", " ")
    return F.trim(c)


def canonical_fingerprint(col: Column | str) -> Column:
    """md5 of the canonical form -- the exact-dedup key for noisy
    web text."""
    return F.md5(canonical_text(col))


def normalize_url(col: Column | str) -> Column:
    """URL canonicalization for crawl dedup: lowercase scheme+host,
    strip the fragment, drop default ports, drop tracking parameters
    (utm_*, fbclid, gclid, msclkid), sort surviving query params so
    order variants collide, and strip a trailing slash from the path.
    All flat expressions + one small array filter/sort (cheap
    arithmetic on short arrays -- the lambda-cost rule in SCALE.md
    applies to heavy functions, not comparisons)."""
    u = F.regexp_replace(_c(col), "#.*$", "")          # fragment
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = F.when((scheme == "http") & hostport.endswith(":80"),
                  F.substring(hostport, 1, F.length(hostport) - 3)) \
            .when((scheme == "https") & hostport.endswith(":443"),
                  F.substring(hostport, 1, F.length(hostport) - 4)) \
            .otherwise(hostport)
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.regexp_replace(path, "/$", "")
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike("^(utm_[^=]*|fbclid|gclid|msclkid)(=|$)"))
    qnorm = F.array_join(F.sort_array(params), "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(F.lit("")))


# compact stopword tables for the multi-language heuristic: high-
# frequency function words, disjoint enough that the argmax separates
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "fr": ("le", "la", "les", "et", "est", "dans", "pas", "une"),
    "es": ("el", "los", "las", "es", "en", "que", "una", "por"),
}


# --------------------------------------------------------------- PII
# Training-data pipelines scrub obvious PII before anything else sees
# the text. Patterns are deliberately restricted to syntax both Java
# regex (Spark) and RE2 (DuckDB) treat identically -- no backrefs, no
# lookaround, leftmost-first greedy quantifiers -- so the redaction is
# oracle-checkable byte-for-byte.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# international-prefixed numbers only ('+' then 8+ digits with
# separators): bare digit runs would false-positive on quantities.
# Round 12 tightened this from the earlier optional-'+' pattern for
# exactly that reason ('we sold 123456789 units' must survive), and
# dropped '.' from the separator class so a phone match can never eat
# into a dotted quad.
PII_PHONE = r"\+\d[\d() -]{6,}\d"


def pii_count(col: Column | str) -> Column:
    """Count of PII items redact_pii would replace -- counted as
    placeholders in the REDACTED text so the number always agrees
    with the redaction (counting patterns on the raw text would
    double-count overlaps: an email's digit-bearing local part also
    matches the phone pattern)."""
    return F.regexp_count(redact_pii(col),
                          F.lit("<EMAIL>|<PHONE>|<IP>")).cast("long")


def redact_pii(col: Column | str) -> Column:
    """Replace email / IPv4 / phone matches with typed placeholder
    tokens, in that order: email FIRST (its local part can contain
    digit runs the later passes would mangle), then IPv4, then phone
    LAST -- the greedy phone tail would otherwise bridge across a
    space into a following dotted quad ('+44 20 ... 0958 10.0.0.7'
    would eat the '10'); with the quad already collapsed to '<IP>'
    the phone match stops at its own last digit. Phone digits never
    contain dots, so the earlier IPv4 pass cannot take part of a
    phone number."""
    c = _c(col)
    c = F.regexp_replace(c, PII_EMAIL, "<EMAIL>")
    c = F.regexp_replace(c, PII_IPV4, "<IP>")
    return F.regexp_replace(c, PII_PHONE, "<PHONE>")


def language_scores(col: Column | str,
                    tables: dict[str, tuple[str, ...]] | None = None) \
        -> dict[str, Column]:
    """Per-language stopword-hit ratio columns (0..1), one cheap array
    filter per language over ONE shared tokenization."""
    tables = tables or LANG_STOPWORDS
    ws = words(F.lower(_c(col)))
    n = F.greatest(F.size(ws), F.lit(1))
    return {lang: (F.size(F.filter(ws, lambda w: w.isin(*sw)))
                   .cast("double") / n)
            for lang, sw in tables.items()}


def language_id(col: Column | str, min_signal: float = 0.05,
                tables: dict[str, tuple[str, ...]] | None = None) \
        -> Column:
    """Multi-language ID: argmax of the per-language stopword ratios,
    'unk' when even the best ratio is under `min_signal` (word salad /
    out-of-table languages). Ties break alphabetically (deterministic).
    The classic n-gram-free heuristic -- one flat expression, no UDF;
    the checked registry entry keeps the simpler en/unk form
    (text_analysis), this is the operational multi-language surface."""
    scores = language_scores(col, tables)
    best = F.greatest(*scores.values())
    pred = F.lit("unk")
    for lang in sorted(scores, reverse=True):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    return F.when(best >= F.lit(min_signal), pred).otherwise(F.lit("unk"))
