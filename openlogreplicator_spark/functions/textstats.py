"""Text analysis operators: token counting, quality stats, language-ID,
document fingerprints. All integer/string-exact (ANSI-SQL-reproducible),
all whole-stage-codegen JVM expressions — a 100 TB corpus pass is one
map-only scan per operator (no shuffle except final aggregates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from openlogreplicator_spark.functions.dedup import normalize_text

# language marker words -> language code; ties broken by language code order.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "nicht", "das"),
    "en": ("the", "and", "of", "is", "that"),
    "es": ("el", "la", "que", "los", "una"),
    "fr": ("le", "la", "les", "et", "une"),
}

STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")

# BPE-ish token classes: words, digit runs, single punctuation marks
TOKEN_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def _count_occurrences(text: Column, word: str) -> Column:
    """Count of whole-word occurrences via padded-replace length arithmetic
    (exact integers; identical semantics in any SQL dialect)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def token_count(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, n_ws_tokens, n_bpe_tokens): whitespace tokens + BPE-ish regex
    token count (word / number / punctuation classes)."""
    t = normalize_text(F.col(text_col))
    return docs.select(
        F.col(id_col),
        F.size(F.split(t, " ")).cast("long").alias("n_ws_tokens"),
        F.regexp_count(t, F.lit(TOKEN_PATTERN)).cast("long").alias("n_bpe_tokens"),
    )


def quality_stats(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Integer quality features: (id, n_chars, n_tokens, n_punct, n_stopwords,
    max_word_len). Ratios are downstream arithmetic — kept integer here so
    the oracle comparison is exact."""
    t = normalize_text(F.col(text_col))
    n_chars = F.length(t).cast("long").alias("n_chars")
    n_tokens = F.size(F.split(t, " ")).cast("long").alias("n_tokens")
    n_punct = F.length(F.regexp_replace(t, "[^.,;:!?]", "")).cast("long").alias("n_punct")
    n_stop = None
    for w in STOPWORDS:
        c = _count_occurrences(t, w)
        n_stop = c if n_stop is None else n_stop + c
    max_word = F.array_max(
        F.transform(F.split(t, " "), lambda x: F.length(x))
    ).cast("long").alias("max_word_len")
    return docs.select(
        F.col(id_col), n_chars, n_tokens, n_punct,
        n_stop.cast("long").alias("n_stopwords"), max_word,
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """Marker-word language ID: language with the highest marker count wins,
    ties by language-code order; zero markers -> 'und' (undetermined).
    Output: (id, pred_lang, score)."""
    t = normalize_text(F.col(text_col))
    scores = []
    for lang in sorted(LANG_MARKERS):
        s = None
        for w in LANG_MARKERS[lang]:
            c = _count_occurrences(t, w)
            s = c if s is None else s + c
        scores.append(F.struct(s.cast("long").alias("score"),
                               F.lit(lang).alias("lang")))
    # max of struct(score, lang): score desc... max picks highest score, and
    # for equal scores the LARGEST lang string; invert by ordering on
    # (score, reversed lang) -> instead pick first max via array sort
    arr = F.array(*scores)
    best_score = F.array_max(F.transform(arr, lambda s: s.getField("score")))
    best_lang = F.array_min(
        F.transform(
            F.filter(arr, lambda s: s.getField("score") == best_score),
            lambda s: s.getField("lang"),
        )
    )
    return docs.select(
        F.col(id_col),
        F.when(best_score > 0, best_lang).otherwise(F.lit("und")).alias("pred_lang"),
        best_score.alias("score"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Canonical document fingerprint: md5 of the normalized text.
    (id, fp). Exact-dup groups == fingerprint groups."""
    return docs.select(
        F.col(id_col),
        F.md5(normalize_text(F.col(text_col)).cast("binary")).alias("fp"),
    )


def winnow_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 5, window: int = 4,
) -> DataFrame:
    """Winnowing (local-minimum) fingerprints over char k-gram hashes —
    the rolling-hash fingerprint family (Schleimer et al.); near-dup docs
    share fingerprints. Output: (id, pos, fp_hash). JVM expressions only."""
    from openlogreplicator_spark.functions.hashing import P, portable_hash

    t = normalize_text(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(0))),
        lambda i: t.substr(i, F.lit(k)),
    )
    hashed = docs.select(
        F.col(id_col),
        F.posexplode(grams).alias("pos", "gram"),
    ).select(
        F.col(id_col), F.col("pos"),
        (portable_hash(F.col("gram")) % P).alias("h"),
    )
    # local minimum over a sliding window of `window` positions
    from pyspark.sql import Window as W

    win = W.partitionBy(id_col).orderBy("pos").rowsBetween(0, window - 1)
    local_min = F.min("h").over(win)
    return (
        hashed.withColumn("wmin", local_min)
        .where(F.col("h") == F.col("wmin"))
        # deterministic representative per fingerprint: first position
        # (posexplode is 0-based -> report 1-based char offsets)
        .groupBy(F.col(id_col), F.col("h").alias("fp_hash"))
        .agg((F.min("pos") + 1).cast("long").alias("pos"))
        .select(F.col(id_col), F.col("pos"), F.col("fp_hash"))
    )
